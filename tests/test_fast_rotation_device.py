"""Device hoisted rotations: one build_ks_precompute jit feeds every
build_rotate_hoisted jit (automorphism = static eval-domain gather);
bit-identical to the regular device eval_rotate and to the host hoisted
path."""

import numpy as np
import pytest

from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
from tfhe_tpu.pke.ckks_device import CKKSDeviceContext
from tfhe_tpu.pke.ckks_rns import CKKSRnsContext
from tfhe_tpu.pke.dcrt import DCRTParams

N = 64


@pytest.fixture(scope="module")
def dev_ctx():
    p = CKKSParams(N=N, dcrt=DCRTParams.create(N, 4, 28),
                   scale=float(1 << 28))
    ctx = CKKSContext(p, seed=41)
    rns = CKKSRnsContext(ctx, dnum=2, ks_limb_bits=28)
    dev = CKKSDeviceContext(rns)
    sk, pk = ctx.key_gen()
    for s in (1, 2, 4):
        dev.load_galois_keys(s, rns.galois_key_gen_single(sk, s))
    return ctx, rns, dev, sk, pk


def test_device_hoisted_equals_regular(dev_ctx):
    ctx, rns, dev, sk, pk = dev_ctx
    x = np.linspace(0.1, 0.9, N // 2)
    d = dev.upload(ctx.encrypt(pk, x))
    pre = dev.rotation_precompute(d)
    for s in (1, 2, 4):
        reg = dev.eval_rotate(d, s)
        hoi = dev.eval_rotate_hoisted(d, s, pre)
        np.testing.assert_array_equal(np.asarray(reg.c0), np.asarray(hoi.c0))
        np.testing.assert_array_equal(np.asarray(reg.c1), np.asarray(hoi.c1))
        got = ctx.decrypt(sk, dev.download(hoi)).real
        np.testing.assert_allclose(got, np.roll(x, -s), atol=1e-4)


def test_device_hoisted_matches_host_hoisted(dev_ctx):
    """Device towers == host hoisted towers bit for bit."""
    ctx, rns, dev, sk, pk = dev_ctx
    x = np.linspace(0.2, 0.8, N // 2)
    ct = ctx.encrypt(pk, x)
    d = dev.upload(ct)
    gk = rns.galois_key_gen_single(sk, 1)
    dev.load_galois_keys(1, gk)
    host_pre = rns.rotation_precompute(ct, gk)
    host = rns.eval_rotate_hoisted(ct, 1, gk, host_pre)
    dev_pre = dev.rotation_precompute(d)
    down = dev.download(dev.eval_rotate_hoisted(d, 1, dev_pre))
    for hp, dp in zip(host.polys, down.polys):
        np.testing.assert_array_equal(
            np.asarray(hp.rns, dtype=np.uint64),
            np.asarray(dp.rns, dtype=np.uint64))


def test_device_hoisted_batched(dev_ctx):
    """[L, B, N] batch rides the same hoisted jits."""
    ctx, rns, dev, sk, pk = dev_ctx
    rng = np.random.default_rng(2)
    xs = [rng.uniform(0.1, 0.9, N // 2) for _ in range(3)]
    d = dev.upload_batch([ctx.encrypt(pk, x) for x in xs])
    pre = dev.rotation_precompute(d)
    outs = dev.download_batch(dev.eval_rotate_hoisted(d, 2, pre))
    for x, ct in zip(xs, outs):
        np.testing.assert_allclose(ctx.decrypt(sk, ct).real,
                                   np.roll(x, -2), atol=1e-4)