"""FFT-factored (levelBudget) CKKS bootstrapping on the device kernels
(pke/ckks_boot_fft_device.py): grouped butterfly factors with hoisted baby
rotations and fused diagonal sums — the reference's levelBudget machinery
(ckksrns-fhe.cpp / ckksrns-utils.cpp), which never ran off-CPU there."""

import numpy as np
import pytest

import tfhe_tpu.pke.ckks_boot as cb
import tfhe_tpu.pke.ckks_boot_fft as cf
from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
from tfhe_tpu.pke.ckks_boot_fft_device import CKKSBootstrapFFTDevice
from tfhe_tpu.pke.ckks_rns import CKKSRnsContext
from tfhe_tpu.pke.dcrt import DCRTParams


@pytest.fixture(scope="module")
def boot():
    p = CKKSParams(N=32, dcrt=DCRTParams.create(32, 30, 28),
                   scale=float(1 << 28))
    ctx = CKKSContext(p, seed=73)
    sk, pk = ctx.key_gen()
    rctx = CKKSRnsContext(ctx, dnum=3, ks_limb_bits=28)
    pre = cf.eval_bootstrap_setup_fft(ctx, level_budget=(2, 2))
    bd = CKKSBootstrapFFTDevice(rctx, pre)
    bd.keygen(sk)
    return ctx, sk, pk, bd


def test_device_diag_transform_matches_dense(boot):
    """One grouped factor on device == its dense matrix on slots."""
    ctx, sk, pk, bd = boot
    s = ctx.params.slots
    rng = np.random.default_rng(2)
    z = rng.normal(size=s) * 0.3 + 1j * rng.normal(size=s) * 0.3
    ct = ctx.encrypt(pk, z)
    g = bd.pre.stc_groups[0]
    out = bd.diag_transform(bd.dctx.upload(ct), g)
    got = ctx.decrypt(sk, bd.dctx.download(out))
    want = cf.diag_to_dense(g.diags, s) @ z
    assert np.abs(got - want).max() < 1e-3


def test_device_fft_bootstrap_batch(boot):
    """Batched device bootstrap through the factored transforms refreshes
    with the device-chain precision class and keeps computing."""
    ctx, sk, pk, bd = boot
    p = ctx.params
    zs = [np.linspace(-0.04, 0.04, p.slots),
          np.linspace(0.03, -0.03, p.slots)]
    cts = []
    for z in zs:
        ct = ctx.encrypt(pk, z)
        while ct.level_params.L > 1:
            ct = ctx.rescale(cb.mult_const(ctx, ct, 1.0, rescale=False))
        cts.append(ct)
    fresh = bd.bootstrap_batch(cts)
    for z, f in zip(zs, fresh):
        assert f.level_params.L >= 3
        err = np.abs(ctx.decrypt(sk, f).real - z).max()
        assert err < 6e-3, f"device fft refresh: {err}"
    # keep computing on the refreshed ciphertext (host side)
    half = ctx.decrypt(sk, cb.mult_const(ctx, fresh[0], 0.5)).real
    assert np.abs(half - zs[0] / 2).max() < 6e-3


def test_device_sparse_fft_bootstrap(boot):
    """Sparsely packed case on device: replicated message refreshed."""
    ctx, sk, pk, _ = boot
    p = ctx.params
    rctx = CKKSRnsContext(ctx, dnum=3, ks_limb_bits=28)
    pre = cf.eval_bootstrap_setup_fft(ctx, level_budget=(2, 2),
                                      sparse_slots=4)
    bd = CKKSBootstrapFFTDevice(rctx, pre)
    bd.keygen(sk)
    rng = np.random.default_rng(11)
    zs = rng.uniform(-0.01, 0.01, 4)
    z = np.tile(zs, p.slots // 4)
    ct = ctx.encrypt(pk, z)
    while ct.level_params.L > 1:
        ct = ctx.rescale(cb.mult_const(ctx, ct, 1.0, rescale=False))
    fresh = bd.bootstrap(ct)
    err = np.abs(ctx.decrypt(sk, fresh).real - z).max()
    assert fresh.level_params.L >= 3 and err < 6e-3


def test_device_iterative_bootstrap(boot):
    """2-iteration bootstrapping with BOTH bootstraps on device: residual
    scaled by 2^precision, re-bootstrapped, subtracted — error shrinks
    accordingly (EvalBootstrap(ct, 2, precision), never off-CPU in the
    reference)."""
    ctx, sk, pk, bd = boot
    p = ctx.params
    z = np.linspace(-0.04, 0.04, p.slots)
    ct = ctx.encrypt(pk, z)
    while ct.level_params.L > 1:
        ct = ctx.rescale(cb.mult_const(ctx, ct, 1.0, rescale=False))
    one = bd.bootstrap_batch([ct], target_scale=float(ct.scale))[0]
    err1 = np.abs(ctx.decrypt(sk, one).real - z).max()
    two = bd.bootstrap_iterative_batch([ct], precision=4)[0]
    err2 = np.abs(ctx.decrypt(sk, two).real - z).max()
    assert err2 < err1 / 3, f"device iterative gain too small: {err1} -> {err2}"
    assert err2 < 2e-3
    with pytest.raises(ValueError):
        bd.bootstrap_iterative_batch([ct], precision=12)


def test_lazy_factor_matches_eager(boot):
    """Double-hoisted (lazy-ModDown) giant accumulation == the eager
    one-ModDown-per-giant path, up to the (smaller) single-rounding noise;
    scale/level bookkeeping identical."""
    ctx, sk, pk, bd = boot
    s = ctx.params.slots
    rng = np.random.default_rng(5)
    z = rng.normal(size=s) * 0.3 + 1j * rng.normal(size=s) * 0.3
    ct = ctx.encrypt(pk, z)
    g = bd.pre.cts_groups[0]
    lazy = bd.diag_transform(bd.dctx.upload(ct), g, lazy=True)
    eager = bd.diag_transform(bd.dctx.upload(ct), g, lazy=False)
    assert lazy.scale == eager.scale and lazy.moduli == eager.moduli
    zl = ctx.decrypt(sk, bd.dctx.download(lazy))
    ze = ctx.decrypt(sk, bd.dctx.download(eager))
    want = cf.diag_to_dense(g.diags, s) @ z
    assert np.abs(zl - ze).max() < 1e-4
    assert np.abs(zl - want).max() < 1e-3
