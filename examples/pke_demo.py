#!/usr/bin/env python
"""pke tour: the counterparts of the reference's pke example set
(src/pke/examples: simple-integers, simple-real-numbers, rotation, PRE,
threshold FHE, CKKS bootstrapping) on this framework's exact-arithmetic
host pke stack.

Usage: python examples/pke_demo.py [bfv bgv ckks boot pre threshold hybrid
                                    device boot-device]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def demo_bfv():
    """simple-integers.cpp: packed SIMD add/mult/rotate."""
    from tfhe_tpu.pke import BFVContext, BFVParams

    print("== BFV: packed integers, depth-2 mult, rotation ==")
    cc = BFVContext(BFVParams.create(N=256, t=7681, mult_depth=2), seed=1)
    sk, pk = cc.key_gen()
    rlk = cc.relin_key_gen(sk)
    v1 = np.arange(1, 257) % 13
    v2 = np.arange(1, 257) % 7 + 1
    ct1, ct2 = cc.encrypt_packed(pk, v1), cc.encrypt_packed(pk, v2)
    prod = cc.eval_mult(ct1, ct2, rlk)
    print("  v1*v2 slots ok:",
          np.array_equal(cc.decrypt_packed(sk, prod), v1 * v2 % 7681))
    gk = cc.galois_key_gen(sk, steps=2)
    rot = cc.decrypt_packed(sk, cc.eval_rotate(ct1, gk))
    half = cc.params.N // 2
    want = np.concatenate([np.roll(v1[:half], -2), np.roll(v1[half:], -2)])
    print("  rotate by 2 ok:", np.array_equal(rot, want))


def demo_bfv_behz():
    """depth-bfvrns-behz.cpp: the same depth chain under the BEHZ
    multiplication technique (gen_crypto_context switch)."""
    from tfhe_tpu.pke.context import gen_crypto_context

    print("== BFV (BEHZ multiplication technique): depth-2 chain ==")
    cc = gen_crypto_context("BFV", N=256, plaintext_modulus=7681,
                            mult_depth=2, limb_bits=28, seed=9,
                            multiplication_technique="behz")
    sk, pk = cc.key_gen()
    rlk = cc.relin_key_gen(sk)
    v1 = np.arange(1, 257) % 13
    v2 = np.arange(1, 257) % 7 + 1
    v3 = np.arange(1, 257) % 5 + 1
    prod = cc.eval_mult(cc.encrypt_packed(pk, v1),
                        cc.encrypt_packed(pk, v2), rlk)
    prod = cc.eval_mult(prod, cc.encrypt_packed(pk, v3), rlk)
    ok = np.array_equal(cc.decrypt_packed(sk, prod),
                        (v1 * v2 % 7681) * v3 % 7681)
    print("  depth-2 v1*v2*v3 slots ok:", ok)


def demo_bgv():
    """BGV with modulus switching + packed rotation."""
    from tfhe_tpu.pke.bgv import BGVContext, BGVParams

    print("== BGV: leveled mult + ModReduce + rotation ==")
    cc = BGVContext(BGVParams.create(N=256, t=7681, mult_depth=2), seed=2)
    sk, pk = cc.key_gen()
    rlk = cc.relin_key_gen(sk)
    v = np.arange(1, 257) % 11
    ct = cc.encrypt_packed(pk, v)
    sq = cc.eval_mult(ct, ct, rlk)
    sq = cc.mod_switch(sq)
    print("  (v^2 after ModReduce) ok:",
          np.array_equal(cc.decrypt_packed(sk, sq), v * v % 7681))
    gk = cc.galois_key_gen(sk, 1)
    out = cc.decrypt_packed(sk, cc.eval_rotate(ct, gk))
    half = cc.params.N // 2
    want = np.concatenate([np.roll(v[:half], -1), np.roll(v[half:], -1)])
    print("  rotation ok:", np.array_equal(out, want))


def demo_ckks():
    """simple-real-numbers.cpp: approximate arithmetic with rescaling."""
    from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams

    print("== CKKS: real-number mult + rescale ==")
    cc = CKKSContext(CKKSParams.create(N=256, mult_depth=2, scale_bits=40,
                                       limb_bits=40), seed=3)
    sk, pk = cc.key_gen()
    rlk = cc.relin_key_gen(sk)
    z = np.linspace(0.1, 0.9, cc.params.slots)
    sq = cc.eval_mult(cc.encrypt(pk, z), cc.encrypt(pk, z), rlk)
    err = np.abs(cc.decrypt(sk, sq) - z * z).max()
    print(f"  z^2 max err: {err:.2e}")


def demo_boot():
    """CKKS bootstrapping: refresh a depth-exhausted ciphertext."""
    from tfhe_tpu.pke import ckks_boot as cb
    from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
    from tfhe_tpu.pke.dcrt import DCRTParams

    print("== CKKS bootstrapping ==")
    N, L = 32, 30
    p = CKKSParams(N=N, dcrt=DCRTParams.create(N, L, 40), scale=float(1 << 40))
    ctx = CKKSContext(p, seed=4)
    sk, pk = ctx.key_gen()
    rlk = ctx.relin_key_gen(sk)
    z = np.array([0.01, -0.02, 0.03] + [0.0] * (p.slots - 3))
    ct = cb._drop_to(ctx.encrypt(pk, z),
                     DCRTParams(N=N, moduli=p.dcrt.moduli[:1]))
    t0 = time.time()
    pre = cb.eval_bootstrap_setup(ctx, K=8.0, cheb_deg=18)
    keys = cb.eval_bootstrap_keygen(ctx, sk)
    out = cb.eval_bootstrap(ctx, ct, pre, keys, rlk)
    err = np.abs(ctx.decrypt(sk, out) - z).max()
    print(f"  refreshed {out.level_params.L} levels, err {err:.2e}, "
          f"{time.time() - t0:.1f}s")


def demo_pre():
    """Proxy re-encryption (pre.cpp)."""
    from tfhe_tpu.pke import BFVContext, BFVParams, advanced

    print("== PRE: alice -> bob re-encryption ==")
    cc = BFVContext(BFVParams.create(N=256, t=257, mult_depth=1), seed=5)
    sk_a, pk_a = cc.key_gen()
    sk_b, _pk_b = cc.key_gen()
    rk = advanced.re_key_gen(cc, sk_a, sk_b)
    m = np.arange(256) % 17
    ct_b = advanced.re_encrypt(cc, cc.encrypt(pk_a, m), rk)
    print("  bob decrypts alice's ct:",
          np.array_equal(cc.decrypt(sk_b, ct_b), m))


def demo_threshold():
    """n-of-n threshold FHE (threshold-fhe.cpp)."""
    from tfhe_tpu.pke import BFVContext, BFVParams, advanced

    print("== Threshold: 3-party joint keygen + distributed decrypt ==")
    cc = BFVContext(BFVParams.create(N=256, t=257, mult_depth=1), seed=6)
    parties, pk, _joint = advanced.multiparty_key_gen(cc, 3)
    m = np.arange(256) % 29
    ct = cc.encrypt(pk, m)
    shares = [advanced.multiparty_decrypt_lead(cc, parties[0], ct)]
    shares += [advanced.multiparty_decrypt_main(cc, s, ct) for s in parties[1:]]
    got = advanced.multiparty_decrypt_fusion(cc, shares)
    print("  joint decrypt ok:", np.array_equal(got, m))


def demo_hybrid():
    """Hybrid (GHS) key switching: depth-4 chains with dnum-sized keys."""
    from tfhe_tpu.pke.bfv import BFVContext, BFVParams
    from tfhe_tpu.pke.keyswitch import relin_key_gen_hybrid

    print("== Hybrid key switching: BFV depth-4 chain ==")
    p = BFVParams.create(N=32, t=257, mult_depth=4)
    cc = BFVContext(p, seed=7)
    sk, pk = cc.key_gen()
    hks = relin_key_gen_hybrid(cc.rng, p.dcrt, sk.s_signed, dnum=2,
                               limb_bits=54)
    m = np.arange(1, 33) % 5 + 1
    ct = cc.encrypt_packed(pk, m)
    want = m.copy()
    for _ in range(4):
        ct = cc.eval_mult(ct, ct, rlk=hks)
        want = want * want % 257
    print("  x^16 ok:", np.array_equal(cc.decrypt_packed(sk, ct), want))


def demo_device():
    """Device pke: batched mult/rotate chains for all three schemes on the
    accelerator, towers resident as [L, B, N] u32 (a capability the
    reference's CPU-only pke stack never had)."""
    from tfhe_tpu.pke.bgv import BGVContext, BGVParams
    from tfhe_tpu.pke.bgv_device import BGVDeviceContext
    from tfhe_tpu.pke.bgv_rns import BGVRnsContext
    from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
    from tfhe_tpu.pke.ckks_device import CKKSDeviceContext
    from tfhe_tpu.pke.ckks_rns import CKKSRnsContext
    from tfhe_tpu.pke.bfv import BFVContext, BFVParams
    from tfhe_tpu.pke.bfv_device import BFVDeviceContext
    from tfhe_tpu.pke.bfv_rns import BFVRnsContext
    from tfhe_tpu.pke.dcrt import DCRTParams

    print("== Device pke: batched mult on the accelerator ==")
    t0 = time.time()
    p = CKKSParams(N=64, dcrt=DCRTParams.create(64, 4, 28),
                   scale=float(1 << 28))
    ctx = CKKSContext(p, seed=101)
    sk, pk = ctx.key_gen()
    rctx = CKKSRnsContext(ctx, dnum=2, ks_limb_bits=28)
    dctx = CKKSDeviceContext(rctx)
    dctx.load_relin_keys(rctx.relin_key_gen(sk))
    zs = [np.linspace(0.1, 0.9, p.slots) * (1 + i / 10) for i in range(4)]
    d = dctx.upload_batch([ctx.encrypt(pk, z) for z in zs])
    outs = dctx.download_batch(dctx.eval_mult(d, d))
    ok = all(np.abs(ctx.decrypt(sk, o).real - z * z).max() < 1e-3
             for o, z in zip(outs, zs))
    print(f"  CKKS batched device squaring ok: {ok} ({time.time()-t0:.1f}s)")

    t0 = time.time()
    bp = BGVParams.create(N=64, t=257, mult_depth=1, limb_bits=28)
    bc = BGVContext(bp, seed=102)
    bsk, bpk = bc.key_gen()
    brns = BGVRnsContext(bc, ks_limb_bits=28)
    bdev = BGVDeviceContext(brns)
    bdev.load_relin_keys(brns.relin_key_gen(bsk))
    vs = [np.arange(64) * (i + 1) % 257 for i in range(4)]
    bd = bdev.upload_batch([bc.encrypt_packed(bpk, v) for v in vs])
    bouts = bdev.download_batch(bdev.eval_mult(bd, bd))
    ok = all(np.array_equal(bc.decrypt_packed(bsk, o), v * v % 257)
             for o, v in zip(bouts, vs))
    print(f"  BGV batched device squaring ok: {ok} ({time.time()-t0:.1f}s)")

    t0 = time.time()
    fp = BFVParams.create(N=64, t=257, mult_depth=1, limb_bits=28)
    fc = BFVContext(fp, seed=103)
    fsk, fpk = fc.key_gen()
    frns = BFVRnsContext(fc, ks_limb_bits=28)
    fdev = BFVDeviceContext(frns)
    fdev.load_relin_key(frns.relin_key_gen(fsk))
    fd = fdev.upload_batch([frns.encrypt_packed(fpk, v) for v in vs])
    fouts = fdev.download_batch(fdev.eval_mult(fd, fd))
    ok = all(np.array_equal(frns.decrypt_packed(fsk, o), v * v % 257)
             for o, v in zip(fouts, vs))
    print(f"  BFV batched device squaring (HPS) ok: {ok} "
          f"({time.time()-t0:.1f}s)")


def demo_boot_device():
    """CKKS bootstrapping with every homomorphic op on the accelerator."""
    import tfhe_tpu.pke.ckks_boot as cb
    from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
    from tfhe_tpu.pke.ckks_boot_device import CKKSBootstrapDevice
    from tfhe_tpu.pke.ckks_rns import CKKSRnsContext
    from tfhe_tpu.pke.dcrt import DCRTParams

    print("== CKKS bootstrapping on device (BSGS + Paterson-Stockmeyer) ==")
    t0 = time.time()
    p = CKKSParams(N=32, dcrt=DCRTParams.create(32, 30, 28),
                   scale=float(1 << 28))
    ctx = CKKSContext(p, seed=104)
    sk, pk = ctx.key_gen()
    rctx = CKKSRnsContext(ctx, dnum=3, ks_limb_bits=28)
    pre = cb.eval_bootstrap_setup(ctx, cheb_deg=22)
    bd = CKKSBootstrapDevice(rctx, pre)
    bd.keygen(sk)
    z = np.linspace(-0.04, 0.04, p.slots)
    ct = ctx.encrypt(pk, z)
    while ct.level_params.L > 1:
        ct = ctx.rescale(cb.mult_const(ctx, ct, 1.0, rescale=False))
    fresh = bd.bootstrap(ct)
    err = np.abs(ctx.decrypt(sk, fresh).real - z).max()
    print(f"  refreshed L=1 -> L={fresh.level_params.L}, max err {err:.2e} "
          f"({time.time()-t0:.1f}s)")


def main():
    demos = {"bfv": demo_bfv, "bfv-behz": demo_bfv_behz, "bgv": demo_bgv,
             "ckks": demo_ckks,
             "boot": demo_boot, "pre": demo_pre, "threshold": demo_threshold,
             "hybrid": demo_hybrid, "device": demo_device,
             "boot-device": demo_boot_device}
    which = [a for a in sys.argv[1:] if a in demos] or list(demos)
    for name in which:
        demos[name]()


if __name__ == "__main__":
    main()
