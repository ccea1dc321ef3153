"""Device BEHZ BFV mult (pke/bfv_behz_device.py): bit-identical to the host
BFVBehzContext (the pipeline is all-integer, so identity needs no shared
fixed point at all). Reference BEHZ is CPU-only (bfvrns-leveledshe.cpp)."""

import numpy as np
import pytest

from tfhe_tpu.pke.bfv import BFVContext, BFVParams
from tfhe_tpu.pke.bfv_behz import BFVBehzContext
from tfhe_tpu.pke.bfv_behz_device import BFVBehzDeviceContext

N, T = 64, 257


@pytest.fixture(scope="module")
def dev_ctx():
    ctx = BFVContext(BFVParams.create(N=N, t=T, mult_depth=2, limb_bits=28),
                     seed=43)
    sk, pk = ctx.key_gen()
    bctx = BFVBehzContext(ctx, dnum=2, ks_limb_bits=28)
    rlk = bctx.relin_key_gen(sk)
    dctx = BFVBehzDeviceContext(bctx)
    dctx.load_relin_key(rlk)
    return bctx, dctx, sk, pk, rlk


def _towers(ct):
    return [np.asarray(p.to_eval().rns) for p in ct.polys]


def test_device_behz_mult_bit_identical(dev_ctx):
    bctx, dctx, sk, pk, rlk = dev_ctx
    rng = np.random.default_rng(0)
    v1, v2 = (rng.integers(0, T, N) for _ in range(2))
    c1 = bctx.encrypt_packed(pk, v1)
    c2 = bctx.encrypt_packed(pk, v2)
    host = bctx.eval_mult(c1, c2, rlk)
    got = dctx.download(dctx.eval_mult(dctx.upload(c1), dctx.upload(c2)))
    for dev_p, host_p in zip(_towers(got), _towers(host)):
        np.testing.assert_array_equal(dev_p, host_p)
    np.testing.assert_array_equal(bctx.decrypt_packed(sk, got), v1 * v2 % T)


def test_device_behz_mult_chain(dev_ctx):
    bctx, dctx, sk, pk, rlk = dev_ctx
    rng = np.random.default_rng(1)
    v1, v2, v3 = (rng.integers(0, T, N) for _ in range(3))
    d = dctx.eval_mult(dctx.upload(bctx.encrypt_packed(pk, v1)),
                       dctx.upload(bctx.encrypt_packed(pk, v2)))
    d = dctx.eval_mult(d, dctx.upload(bctx.encrypt_packed(pk, v3)))
    np.testing.assert_array_equal(bctx.decrypt_packed(sk, dctx.download(d)),
                                  (v1 * v2 % T) * v3 % T)


def test_device_behz_batched(dev_ctx):
    """[L, B, N] towers through the same jit — bit-identical per element."""
    bctx, dctx, sk, pk, rlk = dev_ctx
    rng = np.random.default_rng(2)
    B = 3
    v1s = [rng.integers(0, T, N) for _ in range(B)]
    v2s = [rng.integers(0, T, N) for _ in range(B)]
    c1s = [bctx.encrypt_packed(pk, v) for v in v1s]
    c2s = [bctx.encrypt_packed(pk, v) for v in v2s]
    hosts = [bctx.eval_mult(c1, c2, rlk) for c1, c2 in zip(c1s, c2s)]
    got = dctx.download_batch(dctx.eval_mult(dctx.upload_batch(c1s),
                                             dctx.upload_batch(c2s)))
    for g, h, v1, v2 in zip(got, hosts, v1s, v2s):
        for dev_p, host_p in zip(_towers(g), _towers(h)):
            np.testing.assert_array_equal(dev_p, host_p)
        np.testing.assert_array_equal(bctx.decrypt_packed(sk, g),
                                      v1 * v2 % T)
