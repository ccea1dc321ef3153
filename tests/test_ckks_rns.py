"""Pure-RNS CKKS core (pke/ckks_rns.py): fast base conversion, RNS rescale,
RNS hybrid key switching — the no-bigint production form of the rns-*.cpp /
keyswitch-hybrid.cpp machinery, validated against the exact big-int CKKS."""

import numpy as np
import pytest

from tfhe_tpu.pke.ckks import CKKSCiphertext, CKKSContext, CKKSParams
from tfhe_tpu.pke.ckks_rns import (CKKSRnsContext, fast_base_convert,
                                   rescale_rns)
from tfhe_tpu.pke.dcrt import DCRTParams, DCRTPoly, _moduli_chain


def test_fast_base_convert_is_exact_up_to_D():
    """FBC represents x (+/- one multiple of D, the documented HPS error)."""
    ms = _moduli_chain(32, 5, 40)
    src, dst = ms[:2], ms[2:5]
    rng = np.random.default_rng(0)
    D = src[0] * src[1]
    xs = [int(rng.integers(0, src[0])) * src[1] + int(rng.integers(0, src[1]))
          for _ in range(32)]
    rns_src = np.stack([np.array([x % m for x in xs], dtype=np.uint64)
                        for m in src])
    ext = fast_base_convert(rns_src, src, dst)
    for j, m in enumerate(dst):
        for k, x in enumerate(xs):
            assert (int(ext[j][k]) - x) % m in (0, D % m, (-D) % m)


def test_rescale_rns_matches_exact():
    """RNS rescale == exact round(c/q_last) up to the +/-1 centered-rounding
    unit (absorbed into CKKS noise)."""
    lp = DCRTParams.create(32, 3, 40)
    rng = np.random.default_rng(1)
    c = [int(rng.integers(0, 1 << 62)) * int(rng.integers(1, 1 << 50))
         for _ in range(32)]
    poly = DCRTPoly.from_bigint(lp, [x % lp.Q for x in c]).to_eval()
    got = rescale_rns(poly).to_bigint()
    q_last = lp.moduli[-1]
    new_Q = lp.Q // q_last
    for g, x in zip(got, c):
        want = ((x % lp.Q) + q_last // 2) // q_last
        assert (int(g) - want) % new_Q in (0, 1, new_Q - 1)


@pytest.fixture(scope="module")
def rns_ctx():
    p = CKKSParams(N=32, dcrt=DCRTParams.create(32, 5, 40),
                   scale=float(1 << 40))
    ctx = CKKSContext(p, seed=21)
    sk, pk = ctx.key_gen()
    rctx = CKKSRnsContext(ctx, dnum=2)
    keys = rctx.relin_key_gen(sk)
    return ctx, rctx, sk, pk, keys


def test_rns_ckks_depth3_chain(rns_ctx):
    """Depth-3 squaring chain entirely in RNS, checked against plaintext and
    at the same precision class as the exact big-int path."""
    ctx, rctx, sk, pk, keys = rns_ctx
    z = np.linspace(0.1, 0.9, ctx.params.slots)
    ct = ctx.encrypt(pk, z)
    want = z.copy()
    for _ in range(3):
        ct = rctx.eval_mult(ct, ct, keys)
        want = want * want
    assert np.abs(ctx.decrypt(sk, ct) - want).max() < 1e-6


def test_rns_matches_bigint_path(rns_ctx):
    """One multiplication: the pure-RNS result decrypts to the same values as
    the exact big-int eval_mult (difference bounded by the key-switch noise
    of the two independent keys)."""
    ctx, rctx, sk, pk, keys = rns_ctx
    rng = np.random.default_rng(3)
    z1 = rng.normal(size=ctx.params.slots) * 0.5
    z2 = rng.normal(size=ctx.params.slots) * 0.5
    ct1, ct2 = ctx.encrypt(pk, z1), ctx.encrypt(pk, z2)
    rlk_exact = ctx.relin_key_gen(sk)
    got_exact = ctx.decrypt(sk, ctx.eval_mult(ct1, ct2, rlk=rlk_exact))
    got_rns = ctx.decrypt(sk, rctx.eval_mult(ct1, ct2, keys))
    assert np.abs(got_rns - z1 * z2).max() < 1e-6
    assert np.abs(got_rns - got_exact).max() < 1e-6
