"""Pure-RNS BGV (pke/bgv_rns.py) vs the exact big-int BGV path:
mult + ModReduce chains and packed rotations must decrypt identically
(rns-leveledshe.cpp ModReduce / EvalMult, BGV branch)."""

import numpy as np
import pytest

from tfhe_tpu.pke.bgv import BGVContext, BGVParams
from tfhe_tpu.pke.bgv_rns import BGVRnsContext, mod_reduce_rns

N, T = 64, 257          # 257 = 1 mod 2N: packed (SIMD) slots available


@pytest.fixture(scope="module")
def ctx():
    cc = BGVContext(BGVParams.create(N=N, t=T, mult_depth=2, limb_bits=30),
                    seed=17)
    sk, pk = cc.key_gen()
    rns = BGVRnsContext(cc, dnum=2, ks_limb_bits=30)
    return cc, rns, sk, pk


def test_mod_reduce_rns_preserves_message(ctx):
    cc, rns, sk, pk = ctx
    rng = np.random.default_rng(0)
    v = rng.integers(0, T, N)
    ct = cc.encrypt_packed(pk, v)
    red = rns.mod_reduce(ct)
    assert red.polys[0].params.L == cc.params.dcrt.L - 1
    np.testing.assert_array_equal(cc.decrypt_packed(sk, red), v)
    # the exact big-int ModReduce must agree on the decrypted message
    np.testing.assert_array_equal(cc.decrypt_packed(sk, cc.mod_switch(ct)), v)


def test_rns_mult_chain_depth2(ctx):
    cc, rns, sk, pk = ctx
    rlk = rns.relin_key_gen(sk)
    rng = np.random.default_rng(1)
    v1, v2, v3 = (rng.integers(0, T, N) for _ in range(3))
    c1 = cc.encrypt_packed(pk, v1)
    c2 = cc.encrypt_packed(pk, v2)
    c3 = cc.encrypt_packed(pk, v3)
    prod = rns.eval_mult(c1, c2, rlk)              # level 3 -> 2
    c3r = rns.mod_reduce(c3)                       # align chains
    prod = rns.eval_mult(prod, c3r, rlk)           # level 2 -> 1
    np.testing.assert_array_equal(cc.decrypt_packed(sk, prod),
                                  (v1 * v2 % T) * v3 % T)


def test_rns_mult_matches_bigint_path(ctx):
    cc, rns, sk, pk = ctx
    rlk = rns.relin_key_gen(sk)
    rlk_big = cc.relin_key_gen(sk)
    rng = np.random.default_rng(2)
    v1, v2 = (rng.integers(0, T, N) for _ in range(2))
    c1 = cc.encrypt_packed(pk, v1)
    c2 = cc.encrypt_packed(pk, v2)
    got_rns = cc.decrypt_packed(sk, rns.eval_mult(c1, c2, rlk))
    got_big = cc.decrypt_packed(sk, cc.eval_mult(c1, c2, rlk_big))
    np.testing.assert_array_equal(got_rns, v1 * v2 % T)
    np.testing.assert_array_equal(got_big, v1 * v2 % T)


def test_rns_eval_add(ctx):
    cc, rns, sk, pk = ctx
    rng = np.random.default_rng(3)
    v1, v2 = (rng.integers(0, T, N) for _ in range(2))
    out = rns.eval_add(cc.encrypt_packed(pk, v1), cc.encrypt_packed(pk, v2))
    np.testing.assert_array_equal(cc.decrypt_packed(sk, out), (v1 + v2) % T)


def test_rns_rotation(ctx):
    cc, rns, sk, pk = ctx
    gk = rns.galois_key_gen(sk, steps=3)
    rng = np.random.default_rng(4)
    v = rng.integers(0, T, N)
    ct = cc.encrypt_packed(pk, v)
    out = cc.decrypt_packed(sk, rns.eval_rotate(ct, 3, gk))
    half = N // 2
    want = np.concatenate([np.roll(v[:half], -3), np.roll(v[half:], -3)])
    np.testing.assert_array_equal(out, want)


def test_rotation_after_reduce(ctx):
    """Rotation at a shortened chain uses the per-level key."""
    cc, rns, sk, pk = ctx
    gk = rns.galois_key_gen(sk, steps=1)
    rng = np.random.default_rng(5)
    v = rng.integers(0, T, N)
    ct = rns.mod_reduce(cc.encrypt_packed(pk, v))
    out = cc.decrypt_packed(sk, rns.eval_rotate(ct, 1, gk))
    half = N // 2
    want = np.concatenate([np.roll(v[:half], -1), np.roll(v[half:], -1)])
    np.testing.assert_array_equal(out, want)


def test_single_key_serves_all_levels(ctx):
    """One full-chain relin/galois key works at every level (level-aware
    restriction of the hybrid key)."""
    cc, rns, sk, pk = ctx
    rlk = rns.relin_key_gen_single(sk)
    gk = rns.galois_key_gen_single(sk, steps=1)
    rng = np.random.default_rng(7)
    v1, v2, v3 = (rng.integers(0, T, N) for _ in range(3))
    prod = rns.eval_mult(cc.encrypt_packed(pk, v1),
                         cc.encrypt_packed(pk, v2), rlk)     # level 3 -> 2
    prod = rns.eval_mult(prod, rns.mod_reduce(cc.encrypt_packed(pk, v3)),
                         rlk)                                # level 2 -> 1
    np.testing.assert_array_equal(cc.decrypt_packed(sk, prod),
                                  (v1 * v2 % T) * v3 % T)
    v = rng.integers(0, T, N)
    out = cc.decrypt_packed(
        sk, rns.eval_rotate(rns.mod_reduce(cc.encrypt_packed(pk, v)), 1, gk))
    half = N // 2
    want = np.concatenate([np.roll(v[:half], -1), np.roll(v[half:], -1)])
    np.testing.assert_array_equal(out, want)


def test_eval_mult_plain(ctx):
    cc, rns, sk, pk = ctx
    rng = np.random.default_rng(8)
    v = rng.integers(0, T, N)
    w = rng.integers(0, T, N)
    out = rns.eval_mult_plain(cc.encrypt_packed(pk, v), w)
    np.testing.assert_array_equal(cc.decrypt_packed(sk, out), v * w % T)
