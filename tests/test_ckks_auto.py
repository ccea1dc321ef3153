"""Automatic scaling techniques (FIXEDAUTO / FLEXIBLEAUTO).

Mirrors the reference's ckksrns-leveledshe.cpp auto-scaling semantics:
multiplications never need a manual rescale, and operands at different
levels / noise degrees align automatically (AdjustLevelsAndDepthInPlace).
All assertions are decrypt round-trips against exact numpy arithmetic.
"""

import numpy as np
import pytest

from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
from tfhe_tpu.pke.ckks_auto import CKKSAutoContext
from tfhe_tpu.pke.ckks_rns import CKKSRnsContext
from tfhe_tpu.pke.dcrt import DCRTParams, _moduli_chain_pattern

N, L = 64, 6
TOL = 2e-5


@pytest.fixture(scope="module", params=["flexibleauto", "fixedauto"])
def auto_ctx(request):
    # wide first limb (firstModSize rule) so last-level values keep headroom
    p = CKKSParams(N=N,
                   dcrt=DCRTParams(N=N, moduli=_moduli_chain_pattern(
                       N, (52,) + (40,) * (L - 1))),
                   scale=float(1 << 40))
    ctx = CKKSContext(p, seed=20260818)
    rctx = CKKSRnsContext(ctx, dnum=2)
    actx = CKKSAutoContext(rctx, technique=request.param)
    sk, pk = ctx.key_gen()
    rlk = actx.relin_key_gen(sk)
    return actx, sk, pk, rlk


def _vecs(k, rng=None):
    rng = rng or np.random.default_rng(42)
    return [rng.uniform(0.2, 1.1, N // 2) for _ in range(k)]


def test_mult_chain_no_manual_rescale(auto_ctx):
    """Depth-4 product with zero rescale calls (EvalMultAuto chaining)."""
    actx, sk, pk, rlk = auto_ctx
    xs = _vecs(5)
    cts = [actx.encrypt(pk, x) for x in xs]
    acc = cts[0]
    want = xs[0]
    for x, ct in zip(xs[1:], cts[1:]):
        acc = actx.eval_mult(acc, ct, rlk)
        want = want * x
    got = actx.decrypt(sk, acc).real
    assert np.abs(got - want).max() < TOL


def test_mixed_depth_add(auto_ctx):
    """(x*y) + z: deg-2 plus fresh deg-1 at the same level."""
    actx, sk, pk, rlk = auto_ctx
    x, y, z = _vecs(3)
    cx, cy, cz = (actx.encrypt(pk, v) for v in (x, y, z))
    s = actx.eval_add(actx.eval_mult(cx, cy, rlk), cz)
    got = actx.decrypt(sk, s).real
    assert np.abs(got - (x * y + z)).max() < TOL


def test_mixed_level_add_gap2(auto_ctx):
    """x^4 (two levels consumed) + fresh y — exercises the constant-multiply
    + rescale + level-reduce path of AdjustLevelsAndDepthInPlace."""
    actx, sk, pk, rlk = auto_ctx
    x, y = _vecs(2)
    cx, cy = actx.encrypt(pk, x), actx.encrypt(pk, y)
    x2 = actx.eval_mult(cx, cx, rlk)
    x4 = actx.eval_mult(x2, x2, rlk)        # deg 2 at a reduced chain
    s = actx.eval_add(x4, cy)
    got = actx.decrypt(sk, s).real
    assert np.abs(got - (x ** 4 + y)).max() < TOL


def test_mixed_level_mult(auto_ctx):
    """(x*y) * z with z fresh: operands at different chains multiply."""
    actx, sk, pk, rlk = auto_ctx
    x, y, z = _vecs(3)
    cx, cy, cz = (actx.encrypt(pk, v) for v in (x, y, z))
    xy = actx.eval_mult(cx, cy, rlk)
    out = actx.eval_mult(xy, cz, rlk)
    got = actx.decrypt(sk, out).real
    assert np.abs(got - x * y * z).max() < TOL


def test_sub_and_plaintext_ops(auto_ctx):
    actx, sk, pk, rlk = auto_ctx
    x, y = _vecs(2)
    cx, cy = actx.encrypt(pk, x), actx.encrypt(pk, y)
    # (3*x - y) + 0.25, with the scalar applied to a deg-2 intermediate
    t = actx.eval_mult_plain(cx, 3.0)
    t = actx.eval_sub(t, cy)
    t = actx.eval_add_plain(t, 0.25)
    got = actx.decrypt(sk, t).real
    assert np.abs(got - (3 * x - y + 0.25)).max() < TOL
    # vector plaintext on a deg-2 ciphertext (auto-rescales first)
    sq = actx.eval_mult(cx, cx, rlk)
    t2 = actx.eval_mult_plain(sq, y)
    got2 = actx.decrypt(sk, t2).real
    assert np.abs(got2 - x * x * y).max() < TOL


def test_eval_power(auto_ctx):
    actx, sk, pk, rlk = auto_ctx
    (x,) = _vecs(1)
    cx = actx.encrypt(pk, x)
    p5 = actx.eval_power(cx, 5, rlk)
    got = actx.decrypt(sk, p5).real
    assert np.abs(got - x ** 5).max() < 10 * TOL


def test_rotation_composes_with_auto(auto_ctx):
    actx, sk, pk, rlk = auto_ctx
    x, y = _vecs(2)
    cx, cy = actx.encrypt(pk, x), actx.encrypt(pk, y)
    gk = actx.galois_key_gen(sk, 1)
    prod = actx.eval_mult(cx, cy, rlk)      # deg 2
    rot = actx.eval_rotate(prod, 1, gk)
    s = actx.eval_add(rot, cx)              # mixed level+deg again
    got = actx.decrypt(sk, s).real
    want = np.roll(x * y, -1) + x
    assert np.abs(got - want).max() < TOL


def test_full_depth_with_plaintext_tail(auto_ctx):
    """Consume the whole chain (x^18 + x^9 + 1 needs 5 levels) and finish
    with a plaintext add at the LAST level — regression for the last-level
    headroom wrap (scale ~ q_0 made encoded constants vanish mod q_0)."""
    actx, sk, pk, rlk = auto_ctx
    x = np.linspace(1.0, 1.07, N // 2)
    c = actx.encrypt(pk, x)
    c2 = actx.eval_mult(c, c, rlk)
    c4 = actx.eval_mult(c2, c2, rlk)
    c8 = actx.eval_mult(c4, c4, rlk)
    c16 = actx.eval_mult(c8, c8, rlk)
    c9 = actx.eval_mult(c8, c, rlk)
    c18 = actx.eval_mult(c16, c2, rlk)
    res = actx.eval_add_plain(actx.eval_add(c18, c9), 1.0)
    assert res.polys[0].params.L == 1      # genuinely at the last level
    got = actx.decrypt(sk, res).real
    want = x ** 18 + x ** 9 + 1
    assert np.abs(got - want).max() < 5e-4


def test_canonical_grid_invariant(auto_ctx):
    """Every produced ciphertext sits exactly on the canonical scale grid."""
    actx, sk, pk, rlk = auto_ctx
    x, y = _vecs(2)
    cx, cy = actx.encrypt(pk, x), actx.encrypt(pk, y)
    prod = actx.eval_mult(cx, cy, rlk)
    l = prod.polys[0].params.L
    assert prod.noise_deg == 2 and prod.scale == actx.sf2[l]
    s = actx.eval_add(prod, cy)
    l2 = s.polys[0].params.L
    assert s.scale in (actx.sf[l2], actx.sf2[l2])
