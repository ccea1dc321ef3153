"""Device-resident RNS-BFV (pke/bfv_device.py): the HPS mult pipeline on
the accelerator, bit-identical to the host BFVRnsContext (shared u32-word
fixed-point rounding). The reference's bfvrns stack is CPU-only."""

import numpy as np
import pytest

from tfhe_tpu.pke.bfv import BFVContext, BFVParams
from tfhe_tpu.pke.bfv_device import BFVDeviceContext
from tfhe_tpu.pke.bfv_rns import BFVRnsContext

N, T = 64, 257


@pytest.fixture(scope="module")
def dev_ctx():
    # device chain: every Q, R, and P limb < 2^31 (28-bit NTT primes)
    ctx = BFVContext(BFVParams.create(N=N, t=T, mult_depth=2, limb_bits=28),
                     seed=41)
    sk, pk = ctx.key_gen()
    rctx = BFVRnsContext(ctx, dnum=2, ks_limb_bits=28)
    rlk = rctx.relin_key_gen(sk)
    dctx = BFVDeviceContext(rctx)
    dctx.load_relin_key(rlk)
    return ctx, rctx, dctx, sk, pk, rlk


def _towers(ct):
    return [np.asarray(p.to_eval().rns) for p in ct.polys]


def test_device_mult_bit_identical(dev_ctx):
    ctx, rctx, dctx, sk, pk, rlk = dev_ctx
    rng = np.random.default_rng(0)
    v1, v2 = (rng.integers(0, T, N) for _ in range(2))
    c1 = rctx.encrypt_packed(pk, v1)
    c2 = rctx.encrypt_packed(pk, v2)
    host = rctx.eval_mult(c1, c2, rlk)
    got = dctx.download(dctx.eval_mult(dctx.upload(c1), dctx.upload(c2)))
    for dev_p, host_p in zip(_towers(got), _towers(host)):
        np.testing.assert_array_equal(dev_p, host_p)
    np.testing.assert_array_equal(rctx.decrypt_packed(sk, got), v1 * v2 % T)


def test_device_mult_chain(dev_ctx):
    """BFV mults don't consume levels — chain twice on the full modulus."""
    ctx, rctx, dctx, sk, pk, rlk = dev_ctx
    rng = np.random.default_rng(1)
    v1, v2, v3 = (rng.integers(0, T, N) for _ in range(3))
    d = dctx.eval_mult(dctx.upload(rctx.encrypt_packed(pk, v1)),
                       dctx.upload(rctx.encrypt_packed(pk, v2)))
    d = dctx.eval_mult(d, dctx.upload(rctx.encrypt_packed(pk, v3)))
    np.testing.assert_array_equal(rctx.decrypt_packed(sk, dctx.download(d)),
                                  (v1 * v2 % T) * v3 % T)


def test_device_rotate_bit_identical(dev_ctx):
    ctx, rctx, dctx, sk, pk, rlk = dev_ctx
    steps = 3
    gk = rctx.galois_key_gen(sk, steps)
    dctx.load_galois_key(steps, gk)
    rng = np.random.default_rng(2)
    v = rng.integers(0, T, N)
    ct = rctx.encrypt_packed(pk, v)
    host_rot = rctx.eval_rotate(ct, steps, gk)
    got = dctx.download(dctx.eval_rotate(dctx.upload(ct), steps))
    for dev_p, host_p in zip(_towers(got), _towers(host_rot)):
        np.testing.assert_array_equal(dev_p, host_p)
    half = N // 2
    want = np.concatenate([np.roll(v[:half], -steps),
                           np.roll(v[half:], -steps)])
    np.testing.assert_array_equal(rctx.decrypt_packed(sk, got), want)


def test_device_add_sub(dev_ctx):
    ctx, rctx, dctx, sk, pk, rlk = dev_ctx
    rng = np.random.default_rng(3)
    v1, v2 = (rng.integers(0, T, N) for _ in range(2))
    d1 = dctx.upload(rctx.encrypt_packed(pk, v1))
    d2 = dctx.upload(rctx.encrypt_packed(pk, v2))
    got_add = rctx.decrypt_packed(sk, dctx.download(dctx.eval_add(d1, d2)))
    got_sub = rctx.decrypt_packed(sk, dctx.download(dctx.eval_sub(d1, d2)))
    np.testing.assert_array_equal(got_add, (v1 + v2) % T)
    np.testing.assert_array_equal(got_sub, (v1 - v2) % T)
