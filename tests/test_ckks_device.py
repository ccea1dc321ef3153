"""Device-resident RNS-CKKS (pke/ckks_device.py): the full mult/rotate/add
hot loop on the accelerator, bit-identical to the host CKKSRnsContext
(shared integer fixed-point FBC alpha). The pke capability the reference
never shipped on an accelerator (rns-leveledshe.cpp / keyswitch-hybrid.cpp
are CPU-only)."""

import numpy as np
import pytest

from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
from tfhe_tpu.pke.ckks_device import CKKSDeviceContext
from tfhe_tpu.pke.ckks_rns import CKKSRnsContext
from tfhe_tpu.pke.dcrt import DCRTParams


@pytest.fixture(scope="module")
def dev_ctx():
    # device chain: every Q and P limb < 2^31 (28-bit NTT primes)
    p = CKKSParams(N=32, dcrt=DCRTParams.create(32, 5, 28),
                   scale=float(1 << 28))
    ctx = CKKSContext(p, seed=33)
    sk, pk = ctx.key_gen()
    rctx = CKKSRnsContext(ctx, dnum=2, ks_limb_bits=28)
    keys = rctx.relin_key_gen(sk)
    dctx = CKKSDeviceContext(rctx)
    dctx.load_relin_keys(keys)
    return ctx, rctx, dctx, sk, pk, keys


def _towers(ct):
    return [np.asarray(p.to_eval().rns) for p in ct.polys]


def test_device_mult_chain_bit_identical(dev_ctx):
    """Depth-3 squaring chain entirely on device == the host RNS chain,
    limb-for-limb, and decrypts to the right values."""
    ctx, rctx, dctx, sk, pk, keys = dev_ctx
    z = np.linspace(0.1, 0.9, ctx.params.slots)
    ct_host = ctx.encrypt(pk, z)
    dct = dctx.upload(ct_host)
    want = z.copy()
    for _ in range(3):
        ct_host = rctx.eval_mult(ct_host, ct_host, keys)
        dct = dctx.eval_mult(dct, dct)
        want = want * want
    got = dctx.download(dct)
    assert got.scale == ct_host.scale
    for dev_p, host_p in zip(_towers(got), _towers(ct_host)):
        np.testing.assert_array_equal(dev_p, host_p)
    assert np.abs(ctx.decrypt(sk, got) - want).max() < 1e-4


def test_device_rotate_bit_identical(dev_ctx):
    """Packed rotation on device == host RNS rotation, and the slots move."""
    ctx, rctx, dctx, sk, pk, keys = dev_ctx
    steps = 3
    gk = rctx.galois_key_gen(sk, steps)
    dctx.load_galois_keys(steps, gk)
    z = np.linspace(-1.0, 1.0, ctx.params.slots)
    ct = ctx.encrypt(pk, z)
    host_rot = rctx.eval_rotate(ct, steps, gk)
    dev_rot = dctx.eval_rotate(dctx.upload(ct), steps)
    got = dctx.download(dev_rot)
    for dev_p, host_p in zip(_towers(got), _towers(host_rot)):
        np.testing.assert_array_equal(dev_p, host_p)
    assert np.abs(ctx.decrypt(sk, got) - np.roll(z, -steps)).max() < 1e-4


def test_device_rotate_after_mult_level_chain(dev_ctx):
    """Rotation at a reduced level (after a rescale) uses the per-level key
    and still matches the host exactly."""
    ctx, rctx, dctx, sk, pk, keys = dev_ctx
    steps = 1
    gk = rctx.galois_key_gen(sk, steps)
    dctx.load_galois_keys(steps, gk)
    z = np.linspace(0.2, 0.8, ctx.params.slots)
    ct = ctx.encrypt(pk, z)
    host_ct = rctx.eval_rotate(rctx.eval_mult(ct, ct, keys), steps, gk)
    dev_ct = dctx.eval_rotate(dctx.eval_mult(dctx.upload(ct), dctx.upload(ct)),
                              steps)
    got = dctx.download(dev_ct)
    for dev_p, host_p in zip(_towers(got), _towers(host_ct)):
        np.testing.assert_array_equal(dev_p, host_p)
    assert np.abs(ctx.decrypt(sk, got) - np.roll(z * z, -steps)).max() < 1e-4


def test_device_add_sub(dev_ctx):
    ctx, rctx, dctx, sk, pk, keys = dev_ctx
    z1 = np.linspace(0.0, 1.0, ctx.params.slots)
    z2 = np.linspace(1.0, 0.0, ctx.params.slots)
    d1, d2 = dctx.upload(ctx.encrypt(pk, z1)), dctx.upload(ctx.encrypt(pk, z2))
    got_add = ctx.decrypt(sk, dctx.download(dctx.eval_add(d1, d2)))
    got_sub = ctx.decrypt(sk, dctx.download(dctx.eval_sub(d1, d2)))
    assert np.abs(got_add - (z1 + z2)).max() < 1e-5
    assert np.abs(got_sub - (z1 - z2)).max() < 1e-5
