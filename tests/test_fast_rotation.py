"""Hoisted rotations (EvalFastRotation, keyswitch-hybrid.cpp
EvalKeySwitchPrecomputeCore + the HS18 hoisting identity): one digit
decomposition serves every rotation, each rotation is a per-limb gather +
key inner product, and the result is BIT-IDENTICAL to the regular
eval_rotate."""

import numpy as np
import pytest

from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
from tfhe_tpu.pke.ckks_rns import (CKKSRnsContext, eval_auto_perm,
                                   rescale_rns)
from tfhe_tpu.pke.dcrt import DCRTParams

N = 64


@pytest.fixture(scope="module")
def rns_ctx():
    p = CKKSParams(N=N, dcrt=DCRTParams.create(N, 4, 40),
                   scale=float(1 << 40))
    ctx = CKKSContext(p, seed=31)
    rns = CKKSRnsContext(ctx, dnum=2)
    sk, pk = ctx.key_gen()
    return ctx, rns, sk, pk


def test_eval_auto_perm_is_transform_commutation():
    """NTT(a(X^k)) == NTT(a)[pi] for random a and several odd k."""
    from tfhe_tpu.pke.encoding import apply_automorphism_coeff
    from tfhe_tpu.ref import ntt as ref_ntt
    from tfhe_tpu.utils.numtheory import ntt_prime
    m = ntt_prime(40, 2 * N)
    rng = np.random.default_rng(0)
    a = rng.integers(0, m, N).astype(np.uint64)
    for k in (3, 5, 25, 2 * N - 1):
        perm = eval_auto_perm(N, k, m)
        lhs = ref_ntt.forward(
            apply_automorphism_coeff(a, k, m)[None], m)[0]
        rhs = ref_ntt.forward(a[None], m)[0][perm]
        np.testing.assert_array_equal(lhs, rhs)


def test_hoisted_equals_regular_bitexact(rns_ctx):
    ctx, rns, sk, pk = rns_ctx
    x = np.linspace(0.1, 0.9, N // 2)
    ct = ctx.encrypt(pk, x)
    pre = None
    for steps in (1, 2, 5, -1):
        gk = rns.galois_key_gen_single(sk, steps)
        if pre is None:
            pre = rns.rotation_precompute(ct, gk)   # ONE precompute
        reg = rns.eval_rotate(ct, steps, gk)
        hoi = rns.eval_rotate_hoisted(ct, steps, gk, pre)
        for a, b in zip(reg.polys, hoi.polys):
            np.testing.assert_array_equal(a.rns, b.rns)
        np.testing.assert_allclose(ctx.decrypt(sk, hoi).real,
                                   np.roll(x, -steps), atol=1e-6)


def test_hoisted_at_reduced_level(rns_ctx):
    """Hoisting with the level-aware single key on a rescaled ciphertext."""
    ctx, rns, sk, pk = rns_ctx
    x = np.linspace(0.1, 0.9, N // 2)
    ct = ctx.encrypt(pk, x)
    red = type(ct)([rescale_rns(p) for p in ct.polys],
                   ct.scale / ct.polys[0].params.moduli[-1], ct.params)
    gk = rns.galois_key_gen_single(sk, 1)
    pre = rns.rotation_precompute(red, gk)
    reg = rns.eval_rotate(red, 1, gk)
    hoi = rns.eval_rotate_hoisted(red, 1, gk, pre)
    for a, b in zip(reg.polys, hoi.polys):
        np.testing.assert_array_equal(a.rns, b.rns)


def test_eval_rotations_many_from_one_precompute(rns_ctx):
    ctx, rns, sk, pk = rns_ctx
    x = np.linspace(0.1, 0.9, N // 2)
    ct = ctx.encrypt(pk, x)
    steps = [1, 2, 4, 8]
    gks = {s: rns.galois_key_gen_single(sk, s) for s in steps}
    outs = rns.eval_rotations(ct, steps, gks)
    for s in steps:
        np.testing.assert_allclose(ctx.decrypt(sk, outs[s]).real,
                                   np.roll(x, -s), atol=1e-6)


def test_wrong_key_rejected(rns_ctx):
    ctx, rns, sk, pk = rns_ctx
    ct = ctx.encrypt(pk, np.ones(N // 2))
    gk1 = rns.galois_key_gen_single(sk, 1)
    pre = rns.rotation_precompute(ct, gk1)
    with pytest.raises(AssertionError):
        rns.eval_rotate_hoisted(ct, 2, gk1, pre)   # key is for steps=1