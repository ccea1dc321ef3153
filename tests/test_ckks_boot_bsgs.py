"""Production-scale CKKS bootstrapping internals (pke/ckks_boot.py BSGS +
Paterson-Stockmeyer): the reference's large-ring configuration
(ckksrns-fhe.cpp rotation batching, ckksrns-advancedshe.cpp
EvalChebyshevSeriesPS)."""

import os

import numpy as np
import pytest

import tfhe_tpu.pke.ckks_boot as cb
from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
from tfhe_tpu.pke.dcrt import DCRTParams


def test_cheb_divmod_identity():
    """f == q*T_e + r as functions, random series, float-exact."""
    rng = np.random.default_rng(0)
    for n, e in [(7, 4), (15, 8), (12, 8), (8, 8), (3, 4)]:
        c = rng.normal(size=n + 1)
        q, r = cb._cheb_divmod_T(c, e)
        x = np.linspace(-1, 1, 64)
        lhs = cb._cheb_apply(c, x)
        Te = np.polynomial.chebyshev.chebval(x, [0] * e + [1])
        rhs = cb._cheb_apply(q, x) * Te + cb._cheb_apply(r, x)
        assert np.abs(lhs - rhs).max() < 1e-9
        assert len(r) <= e


@pytest.fixture(scope="module")
def boot_ctx():
    p = CKKSParams(N=32, dcrt=DCRTParams.create(32, 30, 40),
                   scale=float(1 << 40))
    ctx = CKKSContext(p, seed=7)
    sk, pk = ctx.key_gen()
    from tfhe_tpu.pke.keyswitch import relin_key_gen_hybrid
    rlk = relin_key_gen_hybrid(ctx.rng, p.dcrt, sk[1], dnum=3)
    keys = cb.eval_bootstrap_keygen_bsgs(ctx, sk, dnum=3)
    return ctx, sk, pk, rlk, keys


def test_bsgs_key_count_is_sqrt(boot_ctx):
    ctx, sk, pk, rlk, keys = boot_ctx
    s = ctx.params.slots
    # 2*sqrt(s) scale, not s: baby + giant + conjugation
    assert len(keys) <= 2 * int(np.ceil(np.sqrt(s))) + 1 < s + 1


def test_ps_chebyshev_matches_recurrence(boot_ctx):
    """PS evaluation == plain numpy Chebyshev evaluation on slots."""
    ctx, sk, pk, rlk, keys = boot_ctx
    rng = np.random.default_rng(5)
    coeffs = rng.normal(size=23) * 0.3
    z = np.linspace(-0.9, 0.9, ctx.params.slots)
    ct = ctx.encrypt(pk, z)
    got = ctx.decrypt(sk, cb.eval_chebyshev_ps(ctx, ct, coeffs, rlk)).real
    want = cb._cheb_apply(coeffs, z)
    assert np.abs(got - want).max() < 1e-4


def test_bsgs_linear_transform_matches_dense(boot_ctx):
    """BSGS A z + B conj(z) == the dense per-rotation transform == numpy."""
    ctx, sk, pk, rlk, keys = boot_ctx
    s = ctx.params.slots
    rng = np.random.default_rng(6)
    A = (rng.normal(size=(s, s)) + 1j * rng.normal(size=(s, s))) / s
    B = (rng.normal(size=(s, s)) + 1j * rng.normal(size=(s, s))) / s
    z = rng.normal(size=s) * 0.5 + 1j * rng.normal(size=s) * 0.5
    ct = ctx.encrypt(pk, z)
    got = ctx.decrypt(sk, cb.eval_linear_transform_bsgs(ctx, ct, A, B, keys))
    want = A @ z + B @ np.conj(z)
    assert np.abs(got - want).max() < 1e-4


def test_bootstrap_bsgs_refreshes(boot_ctx):
    """Full BSGS+PS bootstrap: depth-exhausted ciphertext refreshed with the
    documented precision, then keeps computing."""
    ctx, sk, pk, rlk, keys = boot_ctx
    p = ctx.params
    pre = cb.eval_bootstrap_setup(ctx, cheb_deg=22)
    z = np.linspace(-0.04, 0.04, p.slots)
    ct = ctx.encrypt(pk, z)
    # burn the chain down to the last limb
    lp = ct.level_params
    while lp.L > 1:
        ct = ctx.rescale(cb.mult_const(ctx, ct, 1.0, rescale=False))
        lp = ct.level_params
    assert ct.level_params.L == 1
    fresh = cb.eval_bootstrap_bsgs(ctx, ct, pre, keys, rlk)
    assert fresh.level_params.L >= 3, "bootstrap must leave usable levels"
    err = np.abs(ctx.decrypt(sk, fresh).real - z).max()
    assert err < 2e-3, f"bootstrap precision {err}"
    # keep computing on the refreshed ciphertext
    sq = cb.mult_ct(ctx, fresh, fresh, rlk)
    err2 = np.abs(ctx.decrypt(sk, sq).real - z * z).max()
    assert err2 < 4e-3


@pytest.mark.skipif(not os.environ.get("TFHE_SLOW"),
                    reason="large-ring bootstrap (minutes); set TFHE_SLOW=1")
def test_bootstrap_bsgs_large_ring():
    """N = 2^13: the scale the dense transform cannot reach (it would need
    4096 Galois keys and 4096 rotations; BSGS needs 128). Validated
    2026-08-18 (sparse secret, K=28, 59-bit limbs): passes in ~50 min on
    the 1-core host — the per-diagonal cost of the single-level transform
    is exactly what the FFT-factored levelBudget path removes."""
    N = 1 << 13
    # 59-bit limbs (the reference's bootstrap modulus class): SlotsToCoeffs
    # amplifies the EvalMod slot error by ~sqrt(slots)
    p = CKKSParams(N=N, dcrt=DCRTParams.create(N, 24, 59),
                   scale=float(1 << 59))
    ctx = CKKSContext(p, seed=9)
    # production rings need the sparse-secret configuration: with a uniform
    # ternary secret the ModRaise overflow |I| reaches ~4 sigma ~ 80 at
    # N=2^13, far past any practical K; SPARSE_TERNARY (hw 64) keeps
    # |I| <~ 10 and K_SPARSE = 28 covers it (ckksrns-fhe.cpp:144-151)
    sk, pk = ctx.key_gen(secret_dist="sparse")
    from tfhe_tpu.pke.keyswitch import relin_key_gen_hybrid
    rlk = relin_key_gen_hybrid(ctx.rng, p.dcrt, sk[1], dnum=3)
    keys = cb.eval_bootstrap_keygen_bsgs(ctx, sk, dnum=3)
    assert len(keys) <= 2 * int(np.ceil(np.sqrt(p.slots))) + 1
    pre = cb.eval_bootstrap_setup(ctx, K=28.0, cheb_deg=44)
    z = np.linspace(-0.04, 0.04, p.slots)
    ct = ctx.encrypt(pk, z)
    while ct.level_params.L > 1:
        ct = ctx.rescale(cb.mult_const(ctx, ct, 1.0, rescale=False))
    fresh = cb.eval_bootstrap_bsgs(ctx, ct, pre, keys, rlk)
    err = np.abs(ctx.decrypt(sk, fresh).real - z).max()
    assert fresh.level_params.L >= 3 and err < 2e-3


def test_bootstrap_iterative_improves_precision(boot_ctx):
    """EvalBootstrap(ct, numIterations=2, precision): the second iteration
    bootstraps the scaled-up residual and subtracts it, shrinking the error
    ~2^precision (ckksrns-fhe.cpp:229-303)."""
    ctx, sk, pk, rlk, keys = boot_ctx
    p = ctx.params
    pre = cb.eval_bootstrap_setup(ctx, cheb_deg=22)
    z = np.linspace(-0.04, 0.04, p.slots)
    ct = ctx.encrypt(pk, z)
    while ct.level_params.L > 1:
        ct = ctx.rescale(cb.mult_const(ctx, ct, 1.0, rescale=False))
    one = cb.eval_bootstrap_iterative(ctx, ct, pre, keys, rlk,
                                      num_iterations=1)
    two = cb.eval_bootstrap_iterative(ctx, ct, pre, keys, rlk,
                                      num_iterations=2, precision=4)
    err1 = np.abs(ctx.decrypt(sk, one).real - z).max()
    err2 = np.abs(ctx.decrypt(sk, two).real - z).max()
    assert err2 < err1 / 4, f"iterative gain too small: {err1} -> {err2}"
    assert err2 < 5e-4
    assert two.level_params.L >= 3, "second iteration must leave levels"
    with pytest.raises(ValueError):
        cb.eval_bootstrap_iterative(ctx, ct, pre, keys, rlk,
                                    num_iterations=3)
