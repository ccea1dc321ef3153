"""CKKS bootstrapping tour: simple, FFT-factored (levelBudget), sparsely
packed, and iterative — the counterpart of the reference's
simple-ckks-bootstrapping.cpp, advanced-ckks-bootstrapping.cpp (sparse
packing + levelBudget) and iterative-ckks-bootstrapping.cpp
(src/pke/examples/), plus the on-device FFT-factored run the reference
never had (its ckksrns-fhe.cpp is CPU-only).

Run: python examples/ckks_bootstrapping.py [--device]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tfhe_tpu.pke.ckks_boot as cb
import tfhe_tpu.pke.ckks_boot_fft as cf
from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
from tfhe_tpu.pke.dcrt import DCRTParams
from tfhe_tpu.pke.keyswitch import relin_key_gen_hybrid


def burn_down(ctx, ct):
    while ct.level_params.L > 1:
        ct = ctx.rescale(cb.mult_const(ctx, ct, 1.0, rescale=False))
    return ct


def precision_bits(err: float) -> float:
    return float(-np.log2(max(err, 1e-300)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", action="store_true",
                    help="also run the FFT-factored bootstrap on the "
                         "accelerator (u32 28-bit chain)")
    args = ap.parse_args()

    N, L = 32, 30
    p = CKKSParams(N=N, dcrt=DCRTParams.create(N, L, 40),
                   scale=float(1 << 40))
    ctx = CKKSContext(p, seed=42)
    sk, pk = ctx.key_gen()
    rlk = relin_key_gen_hybrid(ctx.rng, p.dcrt, sk[1], dnum=3)
    z = np.linspace(-0.04, 0.04, p.slots)

    # -- 1. simple bootstrapping (BSGS + Paterson-Stockmeyer) ---------------
    pre = cb.eval_bootstrap_setup(ctx, cheb_deg=22)
    keys = cb.eval_bootstrap_keygen_bsgs(ctx, sk, dnum=3)
    ct = burn_down(ctx, ctx.encrypt(pk, z))
    t0 = time.time()
    fresh = cb.eval_bootstrap_bsgs(ctx, ct, pre, keys, rlk)
    err1 = np.abs(ctx.decrypt(sk, fresh).real - z).max()
    print(f"simple  : L=1 -> L={fresh.level_params.L}, "
          f"precision {precision_bits(err1):.1f} bits, "
          f"{time.time() - t0:.1f}s  (simple-ckks-bootstrapping.cpp)")

    # -- 2. FFT-factored transforms (levelBudget) ---------------------------
    for budget in [(1, 1), (2, 2), (3, 3)]:
        pre_f = cf.eval_bootstrap_setup_fft(ctx, level_budget=budget)
        keys_f = cf.eval_bootstrap_keygen_fft(ctx, sk, pre_f, dnum=3)
        t0 = time.time()
        fresh = cf.eval_bootstrap_fft(ctx, ct, pre_f, keys_f, rlk)
        err = np.abs(ctx.decrypt(sk, fresh).real - z).max()
        rot = sum(len(g.diags) for g in pre_f.cts_groups + pre_f.stc_groups)
        print(f"budget {budget}: L=1 -> L={fresh.level_params.L}, "
              f"precision {precision_bits(err):.1f} bits, "
              f"{len(keys_f)} Galois keys, ~{rot} diagonals, "
              f"{time.time() - t0:.1f}s")

    # -- 3. sparse packing (advanced-ckks-bootstrapping.cpp) ----------------
    sp = 4
    pre_s = cf.eval_bootstrap_setup_fft(ctx, level_budget=(2, 2),
                                        sparse_slots=sp)
    keys_s = cf.eval_bootstrap_keygen_fft(ctx, sk, pre_s, dnum=3)
    zs = np.tile(np.array([0.01, -0.008, 0.004, 0.009]), p.slots // sp)
    ct_s = burn_down(ctx, ctx.encrypt(pk, zs))
    fresh = cf.eval_bootstrap_fft(ctx, ct_s, pre_s, keys_s, rlk)
    err = np.abs(ctx.decrypt(sk, fresh).real - zs).max()
    print(f"sparse {sp}: L=1 -> L={fresh.level_params.L}, "
          f"precision {precision_bits(err):.1f} bits, "
          f"{len(keys_s)} Galois keys")

    # -- 4. iterative bootstrapping (iterative-ckks-bootstrapping.cpp) ------
    # run one iteration to measure the precision, feed it to the 2-iteration
    # run — same protocol as the reference example
    meas = int(precision_bits(err1)) - int(np.log2(1 / 0.04))
    two = cb.eval_bootstrap_iterative(ctx, ct, pre, keys, rlk,
                                      num_iterations=2,
                                      precision=min(max(meas, 2), 6))
    err2 = np.abs(ctx.decrypt(sk, two).real - z).max()
    print(f"iterative(2): precision {precision_bits(err1):.1f} -> "
          f"{precision_bits(err2):.1f} bits")

    # -- 5. on-device FFT-factored bootstrap (beyond the reference) ---------
    if args.device:
        from tfhe_tpu.pke.ckks_boot_fft_device import CKKSBootstrapFFTDevice
        from tfhe_tpu.pke.ckks_rns import CKKSRnsContext
        pd = CKKSParams(N=N, dcrt=DCRTParams.create(N, L, 28),
                        scale=float(1 << 28))
        ctxd = CKKSContext(pd, seed=43)
        skd, pkd = ctxd.key_gen()
        rctx = CKKSRnsContext(ctxd, dnum=3, ks_limb_bits=28)
        pre_d = cf.eval_bootstrap_setup_fft(ctxd, level_budget=(2, 2))
        bd = CKKSBootstrapFFTDevice(rctx, pre_d)
        bd.keygen(skd)
        zd = np.linspace(-0.04, 0.04, pd.slots)
        ctd = burn_down(ctxd, ctxd.encrypt(pkd, zd))
        t0 = time.time()
        fresh = bd.bootstrap(ctd)
        err = np.abs(ctxd.decrypt(skd, fresh).real - zd).max()
        print(f"device  : L=1 -> L={fresh.level_params.L}, "
              f"precision {precision_bits(err):.1f} bits, "
              f"{time.time() - t0:.1f}s (first run includes compiles)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
