"""Pure-RNS HPS BFV (pke/bfv_rns.py) vs the exact big-int BFV path
(bfvrns-leveledshe.cpp HPS multiplication / ExpandCRTBasis / ScaleAndRound)."""

import numpy as np
import pytest

from tfhe_tpu.pke.bfv import BFVContext, BFVParams
from tfhe_tpu.pke.bfv_rns import (BFVRnsContext, expand_crt_basis,
                                  scale_and_round)
from tfhe_tpu.pke.dcrt import _moduli_chain

N, T = 64, 257          # 257 = 1 mod 2N: packed (SIMD) slots available


def test_expand_crt_basis_exact_centered():
    """Extension carries the CENTERED value exactly (unlike the +-D slack
    of the approximate FBC)."""
    src = _moduli_chain(64, 3, 30, skip=0)
    dst = _moduli_chain(64, 3, 30, skip=3)
    D = 1
    for q in src:
        D *= q
    rng = np.random.default_rng(0)
    # stay away from the float64 tie band at |x| = D/2
    vals = rng.integers(-2**62, 2**62, 64).astype(object)
    vals = [int(v) * (D // 2**64) for v in vals]
    rows = np.stack([np.array([v % q for v in vals], dtype=np.uint64)
                     for q in src])
    ext = expand_crt_basis(rows, src, dst)
    for j, m in enumerate(dst):
        want = np.array([v % m for v in vals], dtype=np.uint64)
        np.testing.assert_array_equal(ext[j], want)


def test_scale_and_round_matches_bigint():
    src = _moduli_chain(64, 2, 30, skip=0)
    aux = _moduli_chain(64, 3, 30, skip=2)
    Q = 1
    for q in src:
        Q *= q
    t = 257
    rng = np.random.default_rng(1)
    vals = [int(v) for v in rng.integers(-2**60, 2**60, 64)]
    vals = [v * (Q // 2**61) for v in vals]          # |x| < Q/2 << QR/2
    rows = np.stack([np.array([v % m for v in vals], dtype=np.uint64)
                     for m in src + aux])
    got = scale_and_round(rows, src, aux, t)
    for j, r in enumerate(aux):
        want = np.array([((2 * t * v + Q) // (2 * Q)) % r for v in vals],
                        dtype=np.uint64)
        np.testing.assert_array_equal(got[j], want)


@pytest.fixture(scope="module")
def ctx():
    cc = BFVContext(BFVParams.create(N=N, t=T, mult_depth=2, limb_bits=30),
                    seed=19)
    sk, pk = cc.key_gen()
    rns = BFVRnsContext(cc, dnum=2, ks_limb_bits=30)
    return cc, rns, sk, pk


def test_rns_encrypt_decrypt(ctx):
    cc, rns, sk, pk = ctx
    rng = np.random.default_rng(2)
    v = rng.integers(0, T, N)
    ct = rns.encrypt_packed(pk, v)
    np.testing.assert_array_equal(rns.decrypt_packed(sk, ct), v)
    # cross-compatible with the exact big-int decrypt
    np.testing.assert_array_equal(cc.decrypt_packed(sk, ct), v)


def test_rns_mult(ctx):
    cc, rns, sk, pk = ctx
    rlk = rns.relin_key_gen(sk)
    rng = np.random.default_rng(3)
    v1, v2 = (rng.integers(0, T, N) for _ in range(2))
    c1 = rns.encrypt_packed(pk, v1)
    c2 = rns.encrypt_packed(pk, v2)
    out = rns.eval_mult(c1, c2, rlk)
    np.testing.assert_array_equal(rns.decrypt_packed(sk, out), v1 * v2 % T)


def test_rns_mult_chain_depth2(ctx):
    cc, rns, sk, pk = ctx
    rlk = rns.relin_key_gen(sk)
    rng = np.random.default_rng(4)
    v1, v2, v3 = (rng.integers(0, T, N) for _ in range(3))
    prod = rns.eval_mult(rns.encrypt_packed(pk, v1),
                         rns.encrypt_packed(pk, v2), rlk)
    prod = rns.eval_mult(prod, rns.encrypt_packed(pk, v3), rlk)
    np.testing.assert_array_equal(rns.decrypt_packed(sk, prod),
                                  (v1 * v2 % T) * v3 % T)


def test_rns_mult_matches_bigint_mult(ctx):
    cc, rns, sk, pk = ctx
    rng = np.random.default_rng(5)
    v1, v2 = (rng.integers(0, T, N) for _ in range(2))
    c1 = rns.encrypt_packed(pk, v1)
    c2 = rns.encrypt_packed(pk, v2)
    got_rns = rns.decrypt_packed(sk, rns.eval_mult(c1, c2))
    got_big = cc.decrypt_packed(sk, cc.eval_mult(c1, c2))
    np.testing.assert_array_equal(got_rns, v1 * v2 % T)
    np.testing.assert_array_equal(got_big, v1 * v2 % T)


def test_rns_rotation(ctx):
    cc, rns, sk, pk = ctx
    gk = rns.galois_key_gen(sk, steps=2)
    rng = np.random.default_rng(6)
    v = rng.integers(0, T, N)
    ct = rns.encrypt_packed(pk, v)
    out = rns.decrypt_packed(sk, rns.eval_rotate(ct, 2, gk))
    half = N // 2
    want = np.concatenate([np.roll(v[:half], -2), np.roll(v[half:], -2)])
    np.testing.assert_array_equal(out, want)


def test_eval_mult_plain(ctx):
    cc, rns, sk, pk = ctx
    rng = np.random.default_rng(8)
    v = rng.integers(0, T, N)
    w = rng.integers(0, T, N)
    out = rns.eval_mult_plain(rns.encrypt_packed(pk, v), w)
    np.testing.assert_array_equal(rns.decrypt_packed(sk, out), v * w % T)
