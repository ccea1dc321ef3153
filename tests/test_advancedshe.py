"""Advanced SHE surface (pke/advancedshe.py): the reference's
base-advancedshe.cpp trees (AddMany/MultMany/LinearWSum/Sum/SumRows/
SumCols/Merge), power-basis EvalPoly (linear + Paterson-Stockmeyer), and
the ckksrns Chebyshev function family (EvalChebyshevFunction, EvalSin,
EvalLogistic, EvalDivide)."""

import numpy as np
import pytest

import tfhe_tpu.pke.advancedshe as ash
from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
from tfhe_tpu.pke.dcrt import DCRTParams


@pytest.fixture(scope="module")
def cc():
    p = CKKSParams(N=32, dcrt=DCRTParams.create(32, 30, 40),
                   scale=float(1 << 40))
    ctx = CKKSContext(p, seed=11)
    sk, pk = ctx.key_gen()
    from tfhe_tpu.pke.keyswitch import relin_key_gen_hybrid
    rlk = relin_key_gen_hybrid(ctx.rng, p.dcrt, sk[1], dnum=3)
    keys = ash.sum_key_gen(ctx, sk)
    return ctx, sk, pk, rlk, keys


def _enc(cc, z):
    ctx, sk, pk, rlk, keys = cc
    return ctx.encrypt(pk, np.asarray(z, dtype=np.float64))


def _dec(cc, ct):
    ctx, sk, pk, rlk, keys = cc
    return ctx.decrypt(sk, ct).real


def test_eval_add_many(cc):
    ctx = cc[0]
    rng = np.random.default_rng(1)
    vs = [rng.normal(size=ctx.params.slots) for _ in range(5)]
    got = _dec(cc, ash.eval_add_many([_enc(cc, v) for v in vs]))
    assert np.abs(got - np.sum(vs, axis=0)).max() < 1e-5


def test_eval_mult_many(cc):
    ctx, sk, pk, rlk, keys = cc
    rng = np.random.default_rng(2)
    vs = [rng.uniform(0.3, 1.0, size=ctx.params.slots) for _ in range(4)]
    got = _dec(cc, ash.eval_mult_many(ctx, [_enc(cc, v) for v in vs], rlk))
    assert np.abs(got - np.prod(vs, axis=0)).max() < 1e-4


def test_eval_linear_wsum(cc):
    ctx = cc[0]
    rng = np.random.default_rng(3)
    vs = [rng.normal(size=ctx.params.slots) for _ in range(3)]
    w = [0.5, -1.25, 2.0]
    got = _dec(cc, ash.eval_linear_wsum(
        ctx, [_enc(cc, v) for v in vs], w))
    want = sum(wi * vi for wi, vi in zip(w, vs))
    assert np.abs(got - want).max() < 1e-4


@pytest.mark.parametrize("deg", [1, 3, 10, 17])
def test_eval_poly_power_basis(cc, deg):
    """Both the linear (deg<5) and the PS route against numpy polyval."""
    ctx, sk, pk, rlk, keys = cc
    rng = np.random.default_rng(deg)
    coeffs = rng.normal(size=deg + 1) * 0.3
    z = np.linspace(-0.9, 0.9, ctx.params.slots)
    got = _dec(cc, ash.eval_poly(ctx, _enc(cc, z), coeffs, rlk))
    want = np.polynomial.polynomial.polyval(z, coeffs)
    assert np.abs(got - want).max() < 1e-3


def test_eval_chebyshev_series_interval(cc):
    """Series over a non-unit interval [0, 4]."""
    ctx, sk, pk, rlk, keys = cc
    rng = np.random.default_rng(7)
    coeffs = rng.normal(size=9) * 0.4
    z = np.linspace(0.2, 3.8, ctx.params.slots)
    got = _dec(cc, ash.eval_chebyshev_series(
        ctx, _enc(cc, z), coeffs, 0.0, 4.0, rlk))
    y = (2 * z - 4.0) / 4.0
    want = np.polynomial.chebyshev.chebval(y, coeffs)
    assert np.abs(got - want).max() < 1e-3


def test_eval_logistic(cc):
    ctx, sk, pk, rlk, keys = cc
    z = np.linspace(-3.5, 3.5, ctx.params.slots)
    got = _dec(cc, ash.eval_logistic(ctx, _enc(cc, z), -4.0, 4.0, 27, rlk))
    want = 1.0 / (1.0 + np.exp(-z))
    assert np.abs(got - want).max() < 5e-3


def test_eval_sin(cc):
    ctx, sk, pk, rlk, keys = cc
    z = np.linspace(-3.0, 3.0, ctx.params.slots)
    got = _dec(cc, ash.eval_sin(ctx, _enc(cc, z), -np.pi, np.pi, 21, rlk))
    assert np.abs(got - np.sin(z)).max() < 5e-3


def test_eval_divide(cc):
    ctx, sk, pk, rlk, keys = cc
    z = np.linspace(1.0, 2.9, ctx.params.slots)
    got = _dec(cc, ash.eval_divide(ctx, _enc(cc, z), 1.0, 3.0, 33, rlk))
    assert np.abs(got - 1.0 / z).max() < 5e-3


def test_eval_sum(cc):
    ctx, sk, pk, rlk, keys = cc
    rng = np.random.default_rng(8)
    v = rng.normal(size=ctx.params.slots)
    got = _dec(cc, ash.eval_sum(ctx, _enc(cc, v), keys))
    assert np.abs(got - v.sum()).max() < 1e-3


def test_eval_sum_partial_batch(cc):
    ctx, sk, pk, rlk, keys = cc
    rng = np.random.default_rng(9)
    v = rng.normal(size=ctx.params.slots)
    got = _dec(cc, ash.eval_sum(ctx, _enc(cc, v), keys, batch_size=4))
    # slot 0 sums slots 0..3
    assert abs(got[0] - v[:4].sum()) < 1e-3


def test_eval_sum_rows(cc):
    ctx, sk, pk, rlk, keys = cc
    s = ctx.params.slots
    R = 4
    rng = np.random.default_rng(10)
    m = rng.normal(size=(s // R, R))
    got = _dec(cc, ash.eval_sum_rows(ctx, _enc(cc, m.ravel()), R, keys))
    col_sums = m.sum(axis=0)
    # every row of the result carries the column sums
    assert np.abs(got.reshape(s // R, R) - col_sums).max() < 1e-3


def test_eval_sum_cols(cc):
    ctx, sk, pk, rlk, keys = cc
    s = ctx.params.slots
    R = 4
    rng = np.random.default_rng(11)
    m = rng.normal(size=(s // R, R))
    got = _dec(cc, ash.eval_sum_cols(ctx, _enc(cc, m.ravel()), R, keys))
    row_sums = m.sum(axis=1)
    assert np.abs(got.reshape(s // R, R) - row_sums[:, None]).max() < 1e-3


def test_eval_merge(cc):
    ctx, sk, pk, rlk, keys = cc
    rng = np.random.default_rng(12)
    vals = rng.normal(size=5)
    cts = []
    for v in vals:
        z = rng.normal(size=ctx.params.slots)  # garbage in slots 1..
        z[0] = v
        cts.append(_enc(cc, z))
    got = _dec(cc, ash.eval_merge(ctx, cts, keys))
    assert np.abs(got[:5] - vals).max() < 1e-3
    assert np.abs(got[5:]).max() < 1e-3
