"""Device-resident RNS-BGV (pke/bgv_device.py): mult/rotate/add on the
accelerator, bit-identical to the host BGVRnsContext (shared integer
fixed-point FBC alpha and t-corrections). The reference's bgvrns stack
(rns-leveledshe.cpp BGV branch) is CPU-only."""

import numpy as np
import pytest

from tfhe_tpu.pke.bgv import BGVContext, BGVParams
from tfhe_tpu.pke.bgv_device import BGVDeviceContext
from tfhe_tpu.pke.bgv_rns import BGVRnsContext

N, T = 64, 257


@pytest.fixture(scope="module")
def dev_ctx():
    # device chain: every Q and P limb < 2^31 (28-bit NTT primes, = 1 mod t)
    ctx = BGVContext(BGVParams.create(N=N, t=T, mult_depth=2, limb_bits=28),
                     seed=37)
    sk, pk = ctx.key_gen()
    rctx = BGVRnsContext(ctx, dnum=2, ks_limb_bits=28)
    keys = rctx.relin_key_gen(sk)
    dctx = BGVDeviceContext(rctx)
    dctx.load_relin_keys(keys)
    return ctx, rctx, dctx, sk, pk, keys


def _towers(ct):
    return [np.asarray(p.to_eval().rns) for p in ct.polys]


def test_device_mult_chain_bit_identical(dev_ctx):
    """Depth-2 mult chain entirely on device == the host RNS chain,
    limb-for-limb, and decrypts to the right slots."""
    ctx, rctx, dctx, sk, pk, keys = dev_ctx
    rng = np.random.default_rng(0)
    v1, v2, v3 = (rng.integers(0, T, N) for _ in range(3))
    c1, c2, c3 = (ctx.encrypt_packed(pk, v) for v in (v1, v2, v3))
    host = rctx.eval_mult(c1, c2, keys)
    host = rctx.eval_mult(host, rctx.mod_reduce(c3), keys)
    dev = dctx.eval_mult(dctx.upload(c1), dctx.upload(c2))
    # align chains for the second mult: device ModReduce == one eval_mult's
    # tail; reuse the host-reduced c3 upload (exercises mixed residency)
    dev = dctx.eval_mult(dev, dctx.upload(rctx.mod_reduce(c3)))
    got = dctx.download(dev)
    for dev_p, host_p in zip(_towers(got), _towers(host)):
        np.testing.assert_array_equal(dev_p, host_p)
    np.testing.assert_array_equal(ctx.decrypt_packed(sk, got),
                                  (v1 * v2 % T) * v3 % T)


def test_device_rotate_bit_identical(dev_ctx):
    ctx, rctx, dctx, sk, pk, keys = dev_ctx
    steps = 3
    gk = rctx.galois_key_gen(sk, steps)
    dctx.load_galois_keys(steps, gk)
    rng = np.random.default_rng(1)
    v = rng.integers(0, T, N)
    ct = ctx.encrypt_packed(pk, v)
    host_rot = rctx.eval_rotate(ct, steps, gk)
    got = dctx.download(dctx.eval_rotate(dctx.upload(ct), steps))
    for dev_p, host_p in zip(_towers(got), _towers(host_rot)):
        np.testing.assert_array_equal(dev_p, host_p)
    half = N // 2
    want = np.concatenate([np.roll(v[:half], -steps),
                           np.roll(v[half:], -steps)])
    np.testing.assert_array_equal(ctx.decrypt_packed(sk, got), want)


def test_device_add_sub(dev_ctx):
    ctx, rctx, dctx, sk, pk, keys = dev_ctx
    rng = np.random.default_rng(2)
    v1, v2 = (rng.integers(0, T, N) for _ in range(2))
    d1 = dctx.upload(ctx.encrypt_packed(pk, v1))
    d2 = dctx.upload(ctx.encrypt_packed(pk, v2))
    got_add = ctx.decrypt_packed(sk, dctx.download(dctx.eval_add(d1, d2)))
    got_sub = ctx.decrypt_packed(sk, dctx.download(dctx.eval_sub(d1, d2)))
    np.testing.assert_array_equal(got_add, (v1 + v2) % T)
    np.testing.assert_array_equal(got_sub, (v1 - v2) % T)
