"""CKKS bootstrapping (pke/ckks_boot.py) — the counterpart of the reference's
ckksrns-fhe.cpp EvalBootstrap: refresh a depth-exhausted ciphertext and keep
computing.

Error model: the refreshed values carry the scaled-sine approximation error
plus key-switch noise amplified by the double-angle steps; with Delta = 2^40,
deg-18 base Chebyshev and g=3 doublings the observed error is ~3e-4 absolute
for messages |m| <= 0.05. The test bound (5e-3) leaves an order of magnitude
of headroom.
"""

import numpy as np
import pytest

from tfhe_tpu.pke import ckks_boot as cb
from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
from tfhe_tpu.pke.dcrt import DCRTParams

N = 32


@pytest.fixture(scope="module")
def small_ctx():
    """3-limb context for automorphism / linear-transform checks."""
    p = CKKSParams(N=N, dcrt=DCRTParams.create(N, 3, 40), scale=float(1 << 40))
    ctx = CKKSContext(p, seed=11)
    sk, pk = ctx.key_gen()
    return ctx, sk, pk


def test_automorphism_and_conjugation(small_ctx):
    ctx, sk, pk = small_ctx
    p = ctx.params
    rng = np.random.default_rng(0)
    z = rng.normal(size=p.slots) + 1j * rng.normal(size=p.slots)
    ct = ctx.encrypt(pk, z)

    a = cb.galois_element(1, p.N)
    gk = cb.galois_key_gen(ctx, sk, a)
    got = ctx.decrypt(sk, cb.eval_automorphism(ctx, ct, a, gk))
    u, plain = cb._auto_slot_action(p.N, a)
    want = np.where(plain, z[u], np.conj(z[u]))
    assert np.abs(got - want).max() < 1e-3

    kc = cb.conj_element(p.N)
    gkc = cb.galois_key_gen(ctx, sk, kc)
    got_c = ctx.decrypt(sk, cb.eval_automorphism(ctx, ct, kc, gkc))
    assert np.abs(got_c - np.conj(z)).max() < 1e-3


def test_linear_transform_matches_matrix(small_ctx):
    ctx, sk, pk = small_ctx
    p = ctx.params
    s = p.slots
    rng = np.random.default_rng(1)
    z = rng.normal(size=s) + 1j * rng.normal(size=s)
    A = rng.normal(size=(s, s)) + 1j * rng.normal(size=(s, s))
    B = rng.normal(size=(s, s)) + 1j * rng.normal(size=(s, s))
    keys = cb.eval_bootstrap_keygen(ctx, sk)
    got = ctx.decrypt(sk, cb.eval_linear_transform(
        ctx, ctx.encrypt(pk, z), A, B, keys))
    want = A @ z + B @ np.conj(z)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-3


def test_eval_bootstrap_refreshes_and_computes():
    """Exhaust a ciphertext to one limb, bootstrap, check the values, then
    spend a refreshed level on a real multiplication."""
    L = 30
    p = CKKSParams(N=N, dcrt=DCRTParams.create(N, L, 40), scale=float(1 << 40))
    ctx = CKKSContext(p, seed=2)
    sk, pk = ctx.key_gen()
    rlk = ctx.relin_key_gen(sk)
    rng = np.random.default_rng(3)
    z = rng.normal(size=p.slots) * 0.02
    ct = ctx.encrypt(pk, z)

    last = DCRTParams(N=N, moduli=p.dcrt.moduli[:1])
    ct_low = cb._drop_to(ct, last)
    assert ct_low.level_params.L == 1            # depth-exhausted

    pre = cb.eval_bootstrap_setup(ctx, K=8.0, cheb_deg=18, double_angles=3)
    keys = cb.eval_bootstrap_keygen(ctx, sk)
    out = cb.eval_bootstrap(ctx, ct_low, pre, keys, rlk)

    assert out.level_params.L >= 3, "bootstrap must return usable levels"
    got = ctx.decrypt(sk, out)
    assert np.abs(got - z).max() < 5e-3

    # keep computing: square the refreshed ciphertext
    sq = ctx.eval_mult(out, out, rlk=rlk)
    got_sq = ctx.decrypt(sk, sq)
    assert np.abs(got_sq - z.astype(complex) ** 2).max() < 5e-4
