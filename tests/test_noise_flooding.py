"""CKKS noise flooding (pke/noise_flooding.py): phase-1 estimation and
phase-2 flooded decryption, mirroring ckks-noise-flooding.cpp's protocol."""

import math

import numpy as np
import pytest

from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
from tfhe_tpu.pke.ckks_auto import CKKSAutoContext
from tfhe_tpu.pke.ckks_rns import CKKSRnsContext
from tfhe_tpu.pke.dcrt import DCRTParams, _moduli_chain_pattern
from tfhe_tpu.pke.noise_flooding import (decrypt_flooded, estimate_noise,
                                         flooding_sigma)

N = 64


def _ctx(seed):
    p = CKKSParams(N=N, dcrt=DCRTParams(N=N, moduli=_moduli_chain_pattern(
        N, (52, 40, 40))), scale=float(1 << 40))
    base = CKKSContext(p, seed=seed)
    actx = CKKSAutoContext(CKKSRnsContext(base, dnum=2),
                           technique="fixedauto")
    sk, pk = actx.key_gen()
    return actx, sk, pk, actx.relin_key_gen(sk)


def _circuit(actx, pk, rlk, v1, v2):
    c1, c2 = actx.encrypt(pk, v1), actx.encrypt(pk, v2)
    return actx.eval_add(actx.eval_mult(c1, c2, rlk), c1)


@pytest.fixture(scope="module")
def phases():
    rng = np.random.default_rng(0)
    v1 = rng.uniform(0.1, 0.9, N // 2)
    v2 = rng.uniform(0.1, 0.9, N // 2)
    a1, sk1, pk1, rlk1 = _ctx(101)
    est = estimate_noise(a1.ctx, sk1, _circuit(a1, pk1, rlk1, v1, v2))
    a2, sk2, pk2, rlk2 = _ctx(202)
    ct = _circuit(a2, pk2, rlk2, v1, v2)
    return est, a2, sk2, ct, v1 * v2 + v1


def test_estimate_is_reasonable(phases):
    est = phases[0]
    assert 0.0 < est < 30.0          # scheme noise, far below the 2^40 scale


DEG1_SCALE = float(1 << 40)       # decrypt_flooded normalizes to degree 1


def test_flooded_decrypt_correct(phases):
    est, actx, sk, ct, want = phases
    got = decrypt_flooded(actx.ctx, sk, ct, est,
                          rng=np.random.default_rng(1)).real
    sigma = flooding_sigma(est)
    # per-slot flooding error ~ sigma*sqrt(N/2)/deg1-scale; allow 6 sigma
    bound = 6 * sigma * math.sqrt(N / 2) / DEG1_SCALE
    assert np.abs(got - want).max() < max(bound, 1e-6)


def test_flooding_noise_is_present_and_sized(phases):
    """Two decryptions of the same ciphertext differ by ~sqrt(2)*sigma —
    the flooding is real, fresh per decryption, and correctly scaled."""
    est, actx, sk, ct, _ = phases
    g1 = decrypt_flooded(actx.ctx, sk, ct, est,
                         rng=np.random.default_rng(2)).real
    g2 = decrypt_flooded(actx.ctx, sk, ct, est,
                         rng=np.random.default_rng(3)).real
    diff_std = np.std(g1 - g2)
    expect = (math.sqrt(2) * flooding_sigma(est) * math.sqrt(N / 2)
              / DEG1_SCALE)
    assert 0.3 * expect < diff_std < 3.0 * expect


def test_sigma_formula():
    # statSec/2 + log2(sqrt(12*q)) + est, reference defaults
    est = 10.0
    assert math.isclose(math.log2(flooding_sigma(est)),
                        15.0 + math.log2(math.sqrt(12.0)) + est)
    assert math.isclose(
        math.log2(flooding_sigma(est, num_adversarial_queries=4)),
        15.0 + math.log2(math.sqrt(48.0)) + est)


def test_precision_guard(phases):
    est, actx, sk, ct, _ = phases
    with pytest.raises(ValueError):
        decrypt_flooded(actx.ctx, sk, ct, noise_estimate=35.0)  # > scale-3
