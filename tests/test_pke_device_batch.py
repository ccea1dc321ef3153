"""Batched device pke: [L, B, N] towers through the same jits, bit-identical
to the per-ciphertext path for all three schemes. The batch-first residency
the binfhe backend uses, applied to pke (the reference runs one CPU op per
ciphertext, no batching at all)."""

import numpy as np
import pytest

B = 3


def test_ckks_device_batch():
    from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
    from tfhe_tpu.pke.ckks_device import CKKSDeviceContext
    from tfhe_tpu.pke.ckks_rns import CKKSRnsContext
    from tfhe_tpu.pke.dcrt import DCRTParams
    p = CKKSParams(N=32, dcrt=DCRTParams.create(32, 4, 28),
                   scale=float(1 << 28))
    ctx = CKKSContext(p, seed=51)
    sk, pk = ctx.key_gen()
    rctx = CKKSRnsContext(ctx, dnum=2, ks_limb_bits=28)
    keys = rctx.relin_key_gen(sk)
    dctx = CKKSDeviceContext(rctx)
    dctx.load_relin_keys(keys)
    rng = np.random.default_rng(0)
    zs = [rng.uniform(0.1, 0.9, ctx.params.slots) for _ in range(B)]
    cts = [ctx.encrypt(pk, z) for z in zs]
    batched = dctx.eval_mult(dctx.upload_batch(cts), dctx.upload_batch(cts))
    outs = dctx.download_batch(batched)
    for ct, z, out in zip(cts, zs, outs):
        single = dctx.download(dctx.eval_mult(dctx.upload(ct),
                                              dctx.upload(ct)))
        for bp, sp in zip(out.polys, single.polys):
            np.testing.assert_array_equal(np.asarray(bp.rns),
                                          np.asarray(sp.rns))
        assert np.abs(ctx.decrypt(sk, out) - z * z).max() < 1e-4


def test_bgv_device_batch():
    from tfhe_tpu.pke.bgv import BGVContext, BGVParams
    from tfhe_tpu.pke.bgv_device import BGVDeviceContext
    from tfhe_tpu.pke.bgv_rns import BGVRnsContext
    N, T = 32, 193
    ctx = BGVContext(BGVParams.create(N=N, t=T, mult_depth=1, limb_bits=28),
                     seed=53)
    sk, pk = ctx.key_gen()
    rctx = BGVRnsContext(ctx, dnum=2, ks_limb_bits=28)
    dctx = BGVDeviceContext(rctx)
    dctx.load_relin_keys(rctx.relin_key_gen(sk))
    rng = np.random.default_rng(1)
    vs = [rng.integers(0, T, N) for _ in range(2 * B)]
    c1s = [ctx.encrypt_packed(pk, v) for v in vs[:B]]
    c2s = [ctx.encrypt_packed(pk, v) for v in vs[B:]]
    outs = dctx.download_batch(
        dctx.eval_mult(dctx.upload_batch(c1s), dctx.upload_batch(c2s)))
    for i in range(B):
        single = dctx.download(dctx.eval_mult(dctx.upload(c1s[i]),
                                              dctx.upload(c2s[i])))
        for bp, sp in zip(outs[i].polys, single.polys):
            np.testing.assert_array_equal(np.asarray(bp.rns),
                                          np.asarray(sp.rns))
        np.testing.assert_array_equal(ctx.decrypt_packed(sk, outs[i]),
                                      vs[i] * vs[B + i] % T)


def test_bfv_device_batch_mult_and_rotate():
    from tfhe_tpu.pke.bfv import BFVContext, BFVParams
    from tfhe_tpu.pke.bfv_device import BFVDeviceContext
    from tfhe_tpu.pke.bfv_rns import BFVRnsContext
    N, T = 32, 193
    ctx = BFVContext(BFVParams.create(N=N, t=T, mult_depth=1, limb_bits=28),
                     seed=55)
    sk, pk = ctx.key_gen()
    rctx = BFVRnsContext(ctx, dnum=2, ks_limb_bits=28)
    dctx = BFVDeviceContext(rctx)
    dctx.load_relin_key(rctx.relin_key_gen(sk))
    gk = rctx.galois_key_gen(sk, 1)
    dctx.load_galois_key(1, gk)
    rng = np.random.default_rng(2)
    vs = [rng.integers(0, T, N) for _ in range(B)]
    cts = [rctx.encrypt_packed(pk, v) for v in vs]
    sq = dctx.eval_mult(dctx.upload_batch(cts), dctx.upload_batch(cts))
    rot = dctx.eval_rotate(sq, 1)
    outs = dctx.download_batch(rot)
    half = N // 2
    for v, out in zip(vs, outs):
        want = v * v % T
        want = np.concatenate([np.roll(want[:half], -1),
                               np.roll(want[half:], -1)])
        np.testing.assert_array_equal(rctx.decrypt_packed(sk, out), want)
