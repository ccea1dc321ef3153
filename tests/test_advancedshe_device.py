"""Device-tier advanced SHE (pke/advancedshe_device.py): the
base-advancedshe.cpp / ckksrns-advancedshe.cpp function family running
entirely through the u32 device tower kernels, cross-checked against
plaintext numpy. The reference's pke advanced layer is CPU-only; its GPU
fork never touched pke."""

import numpy as np
import pytest

import tfhe_tpu.pke.advancedshe_device as ashd
from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
from tfhe_tpu.pke.ckks_boot_device import CKKSDeviceEvaluator
from tfhe_tpu.pke.ckks_rns import CKKSRnsContext
from tfhe_tpu.pke.dcrt import DCRTParams


@pytest.fixture(scope="module")
def dev():
    # device chain: every limb < 2^31 (28-bit primes), scale = 2^28
    p = CKKSParams(N=32, dcrt=DCRTParams.create(32, 30, 28),
                   scale=float(1 << 28))
    ctx = CKKSContext(p, seed=23)
    sk, pk = ctx.key_gen()
    rctx = CKKSRnsContext(ctx, dnum=3, ks_limb_bits=28)
    ev = CKKSDeviceEvaluator(rctx)
    ashd.sum_key_gen(ev, sk)
    return ctx, sk, pk, ev


def _enc(dev, z):
    ctx, sk, pk, ev = dev
    return ev.dctx.upload(ctx.encrypt(pk, np.asarray(z, dtype=np.float64)))


def _dec(dev, dct):
    ctx, sk, pk, ev = dev
    return ctx.decrypt(sk, ev.dctx.download(dct)).real


def test_eval_add_many_device(dev):
    ctx, sk, pk, ev = dev
    rng = np.random.default_rng(1)
    vs = [rng.normal(size=ctx.params.slots) for _ in range(5)]
    got = _dec(dev, ashd.eval_add_many(ev, [_enc(dev, v) for v in vs]))
    assert np.abs(got - np.sum(vs, axis=0)).max() < 1e-4


def test_eval_mult_many_device(dev):
    ctx, sk, pk, ev = dev
    rng = np.random.default_rng(2)
    vs = [rng.uniform(0.3, 1.0, size=ctx.params.slots) for _ in range(4)]
    got = _dec(dev, ashd.eval_mult_many(ev, [_enc(dev, v) for v in vs]))
    assert np.abs(got - np.prod(vs, axis=0)).max() < 1e-3


def test_eval_linear_wsum_device(dev):
    ctx, sk, pk, ev = dev
    rng = np.random.default_rng(3)
    vs = [rng.normal(size=ctx.params.slots) for _ in range(3)]
    w = [0.5, -1.25, 2.0]
    got = _dec(dev, ashd.eval_linear_wsum(
        ev, [_enc(dev, v) for v in vs], w))
    want = sum(wi * vi for wi, vi in zip(w, vs))
    assert np.abs(got - want).max() < 1e-3


@pytest.mark.parametrize("deg", [3, 10])
def test_eval_poly_device(dev, deg):
    """Both the linear (deg<5) and the PS route against numpy polyval."""
    ctx, sk, pk, ev = dev
    rng = np.random.default_rng(deg)
    coeffs = rng.normal(size=deg + 1) * 0.3
    z = np.linspace(-0.9, 0.9, ctx.params.slots)
    got = _dec(dev, ashd.eval_poly(ev, _enc(dev, z), coeffs))
    want = np.polynomial.polynomial.polyval(z, coeffs)
    # scale 2^28 (u32 limbs): per-op rounding ~2^-28 over the PS tree
    assert np.abs(got - want).max() < 3e-3


def test_eval_chebyshev_series_interval_device(dev):
    ctx, sk, pk, ev = dev
    rng = np.random.default_rng(7)
    coeffs = rng.normal(size=9) * 0.4
    z = np.linspace(0.2, 3.8, ctx.params.slots)
    got = _dec(dev, ashd.eval_chebyshev_series(
        ev, _enc(dev, z), coeffs, 0.0, 4.0))
    y = (2 * z - 4.0) / 4.0
    want = np.polynomial.chebyshev.chebval(y, coeffs)
    assert np.abs(got - want).max() < 3e-3


def test_eval_logistic_device(dev):
    ctx, sk, pk, ev = dev
    z = np.linspace(-3.5, 3.5, ctx.params.slots)
    got = _dec(dev, ashd.eval_logistic(ev, _enc(dev, z), -4.0, 4.0, 27))
    want = 1.0 / (1.0 + np.exp(-z))
    assert np.abs(got - want).max() < 1e-2


def test_eval_divide_device(dev):
    ctx, sk, pk, ev = dev
    z = np.linspace(1.0, 2.9, ctx.params.slots)
    got = _dec(dev, ashd.eval_divide(ev, _enc(dev, z), 1.0, 3.0, 33))
    assert np.abs(got - 1.0 / z).max() < 1e-2


def test_eval_sum_device(dev):
    ctx, sk, pk, ev = dev
    rng = np.random.default_rng(8)
    v = rng.normal(size=ctx.params.slots)
    got = _dec(dev, ashd.eval_sum(ev, _enc(dev, v)))
    assert np.abs(got - v.sum()).max() < 1e-3


def test_eval_sum_rows_device(dev):
    ctx, sk, pk, ev = dev
    s = ctx.params.slots
    R = 4
    rng = np.random.default_rng(10)
    m = rng.normal(size=(s // R, R))
    got = _dec(dev, ashd.eval_sum_rows(ev, _enc(dev, m.ravel()), R))
    col_sums = m.sum(axis=0)
    assert np.abs(got.reshape(s // R, R) - col_sums).max() < 1e-3


def test_eval_sum_cols_device(dev):
    ctx, sk, pk, ev = dev
    s = ctx.params.slots
    R = 4
    rng = np.random.default_rng(11)
    m = rng.normal(size=(s // R, R))
    got = _dec(dev, ashd.eval_sum_cols(ev, _enc(dev, m.ravel()), R))
    row_sums = m.sum(axis=1)
    assert np.abs(got.reshape(s // R, R) - row_sums[:, None]).max() < 3e-3


def test_eval_merge_device(dev):
    ctx, sk, pk, ev = dev
    rng = np.random.default_rng(12)
    vals = rng.normal(size=5)
    cts = []
    for v in vals:
        z = rng.normal(size=ctx.params.slots)  # garbage in slots 1..
        z[0] = v
        cts.append(_enc(dev, z))
    got = _dec(dev, ashd.eval_merge(ev, cts))
    assert np.abs(got[:5] - vals).max() < 3e-3
    assert np.abs(got[5:]).max() < 3e-3
