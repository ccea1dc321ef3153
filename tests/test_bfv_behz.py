"""BEHZ BFV multiplication (pke/bfv_behz.py): primitive exactness vs
python-int CRT arithmetic and end-to-end decrypt checks vs the HPS and
exact big-int pipelines (bfvrns-leveledshe.cpp EvalMult BEHZ branch,
dcrtpoly.cpp FastBaseConvqToBskMontgomery / FastRNSFloorq /
FastBaseConvSK)."""

import numpy as np
import pytest

from tfhe_tpu.pke.bfv import BFVContext, BFVParams
from tfhe_tpu.pke.bfv_behz import (BFVBehzContext, choose_bsk_moduli,
                                   fast_base_conv_q_to_bsk,
                                   fast_base_conv_sk, fast_rns_floor_q)
from tfhe_tpu.pke.bfv_rns import BFVRnsContext
from tfhe_tpu.pke.dcrt import _moduli_chain

N, T = 64, 257


def _bases(L=3):
    q = _moduli_chain(N, L, 30)
    bsk = choose_bsk_moduli(N, q, T)
    Q = 1
    for m in q:
        Q *= m
    M = 1
    for m in bsk:
        M *= m
    return q, bsk, Q, M


def _rows(vals, mods):
    return np.stack([np.array([int(v) % m for v in vals], dtype=np.uint64)
                     for m in mods])


def _crt(rows, mods):
    M = 1
    for m in mods:
        M *= m
    out = []
    for k in range(rows.shape[1]):
        x = 0
        for i, m in enumerate(mods):
            Mh = M // m
            x += int(rows[i, k]) * Mh * pow(Mh % m, -1, m)
        out.append(x % M)
    return out


def test_bsk_sizing():
    q, bsk, Q, M = _bases()
    assert Q * M > 2 * N * Q * Q * T
    assert len(set(bsk) & set(q)) == 0


def test_lift_q_to_bsk_small_representative():
    """The small-Montgomery lift lands on a representative in (-Q, Q) —
    x or x-Q exactly (SmMRq's documented slack; the BEHZ noise analysis
    absorbs the possible -Q)."""
    q, bsk, Q, M = _bases()
    rng = np.random.default_rng(0)
    vals = [int(v) % Q for v in rng.integers(0, 2**63, 64) * (Q // 2**62)]
    vals[0], vals[1] = 0, Q - 1                        # edges
    got = fast_base_conv_q_to_bsk(_rows(vals, q), q, bsk, T)
    recon = _crt(got, bsk)
    for v, r in zip(vals, recon):
        r_c = r - M if r > M // 2 else r               # centered over Bsk
        assert r_c in (v, v - Q)


def test_rns_floor_within_slack():
    """floor(t*x/Q) with additive error in [0, L) — the documented BEHZ
    approximation slack."""
    q, bsk, Q, M = _bases()
    L = len(q)
    rng = np.random.default_rng(1)
    # x up to the tensor-product magnitude N*Q^2 (< Q*M/(2t) by sizing)
    vals = [int(v) * (N * Q * Q // 2**63) for v in
            rng.integers(0, 2**63, 64)]
    got = fast_rns_floor_q(_rows(vals, q), _rows(vals, bsk), q, bsk, T)
    recon = _crt(got, bsk)
    for v, r in zip(vals, recon):
        assert (T * v // Q - r) % M < L               # err u in [0, L)


def test_base_conv_sk_exact():
    """Shenoy-Kumaresan Bsk -> Q is exact for centered values in
    (-B*msk/2, B*msk/2)."""
    q, bsk, Q, M = _bases()
    rng = np.random.default_rng(2)
    vals = [int(v) * (M // 2**64) for v in
            rng.integers(-2**62, 2**62, 64)]           # |x| < M/4
    got = fast_base_conv_sk(_rows(vals, bsk), q, bsk, T)
    for i, m in enumerate(q):
        np.testing.assert_array_equal(
            got[i], np.array([v % m for v in vals], dtype=np.uint64))


@pytest.fixture(scope="module")
def ctx():
    cc = BFVContext(BFVParams.create(N=N, t=T, mult_depth=2, limb_bits=30),
                    seed=23)
    sk, pk = cc.key_gen()
    behz = BFVBehzContext(cc, dnum=2, ks_limb_bits=30)
    return cc, behz, sk, pk


def test_behz_mult(ctx):
    cc, behz, sk, pk = ctx
    rlk = behz.relin_key_gen(sk)
    rng = np.random.default_rng(3)
    v1, v2 = (rng.integers(0, T, N) for _ in range(2))
    out = behz.eval_mult(behz.encrypt_packed(pk, v1),
                         behz.encrypt_packed(pk, v2), rlk)
    np.testing.assert_array_equal(behz.decrypt_packed(sk, out), v1 * v2 % T)


def test_behz_mult_chain_depth2(ctx):
    cc, behz, sk, pk = ctx
    rlk = behz.relin_key_gen(sk)
    rng = np.random.default_rng(4)
    v1, v2, v3 = (rng.integers(0, T, N) for _ in range(3))
    prod = behz.eval_mult(behz.encrypt_packed(pk, v1),
                          behz.encrypt_packed(pk, v2), rlk)
    prod = behz.eval_mult(prod, behz.encrypt_packed(pk, v3), rlk)
    np.testing.assert_array_equal(behz.decrypt_packed(sk, prod),
                                  (v1 * v2 % T) * v3 % T)


def test_behz_agrees_with_hps_and_bigint(ctx):
    """Same ciphertexts through all three multiplication engines decrypt to
    the same product (the techniques differ only in rounding noise)."""
    cc, behz, sk, pk = ctx
    hps = BFVRnsContext(cc, dnum=2, ks_limb_bits=30)
    rng = np.random.default_rng(5)
    v1, v2 = (rng.integers(0, T, N) for _ in range(2))
    c1 = behz.encrypt_packed(pk, v1)
    c2 = behz.encrypt_packed(pk, v2)
    want = v1 * v2 % T
    np.testing.assert_array_equal(
        behz.decrypt_packed(sk, behz.eval_mult(c1, c2)), want)
    np.testing.assert_array_equal(
        hps.decrypt_packed(sk, hps.eval_mult(c1, c2)), want)
    np.testing.assert_array_equal(
        cc.decrypt_packed(sk, cc.eval_mult(c1, c2)), want)


def test_behz_inherits_rotation(ctx):
    cc, behz, sk, pk = ctx
    gk = behz.galois_key_gen(sk, steps=1)
    rng = np.random.default_rng(6)
    v = rng.integers(0, T, N)
    out = behz.decrypt_packed(sk, behz.eval_rotate(
        behz.encrypt_packed(pk, v), 1, gk))
    half = N // 2
    want = np.concatenate([np.roll(v[:half], -1), np.roll(v[half:], -1)])
    np.testing.assert_array_equal(out, want)


def test_factory_multiplication_technique():
    """gen_crypto_context(multiplication_technique=...) — the reference's
    SetMultiplicationTechnique switch."""
    from tfhe_tpu.pke.bfv_rns import BFVRnsContext as _Hps
    from tfhe_tpu.pke.context import gen_crypto_context
    cc = gen_crypto_context("BFV", N=N, mult_depth=1, plaintext_modulus=T,
                            limb_bits=28, seed=5,
                            multiplication_technique="behz")
    assert isinstance(cc, BFVBehzContext)
    sk, pk = cc.key_gen()
    rlk = cc.relin_key_gen(sk)
    v = np.arange(N) % T
    out = cc.eval_mult(cc.encrypt_packed(pk, v), cc.encrypt_packed(pk, v),
                       rlk)
    np.testing.assert_array_equal(cc.decrypt_packed(sk, out), v * v % T)
    hps = gen_crypto_context("BFV", N=N, mult_depth=1, plaintext_modulus=T,
                             limb_bits=28, seed=5,
                             multiplication_technique="hps")
    assert isinstance(hps, _Hps) and not isinstance(hps, BFVBehzContext)
    with pytest.raises(ValueError, match="limb_bits"):
        gen_crypto_context("BFV", N=N, plaintext_modulus=T,
                           multiplication_technique="behz")
    with pytest.raises(ValueError, match="BFV option"):
        gen_crypto_context("CKKS", N=64, multiplication_technique="behz")
