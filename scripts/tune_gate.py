"""Sweep the single-limb gate rotation kernel tiling (BT, bt) on hardware.

The STD128 gate pipeline (N=1024, d2=8, n=512) has run BT=256/bt=32 since
round 1; this sweeps alternatives on the real chip. Set the winner via
TFHE_TPU_BT / TFHE_TPU_BTI.

Usage (on the TPU):  python scripts/tune_gate.py [--batch 16384]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--N", type=int, default=1024)
    ap.add_argument("--d2", type=int, default=8)
    ap.add_argument("--tiles",
                    default="128:32,256:16,256:32,256:64,512:32,512:64,1024:64")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from tfhe_tpu.utils.jaxcfg import enable_compile_cache
    enable_compile_cache()
    import jax
    from tfhe_tpu.ops.pallas_rotate import build_pallas_rotate, pack_bsk
    from tfhe_tpu.utils.numtheory import ntt_prime

    N, n, B, d2 = args.N, args.n, args.batch, args.d2
    Q = ntt_prime(27, 2 * N)
    base_g = 1 << 7
    digits_eff = d2 // 2
    print(f"N={N} n={n} B={B} d2={d2} Q={Q}", file=sys.stderr)

    rng = np.random.default_rng(0)
    acc = jax.device_put(rng.integers(0, Q, (B, 2, N)).astype(np.uint32))
    a_idx = jax.device_put(rng.integers(0, 2 * N, (B, n)).astype(np.int32))
    bsk_hat = rng.integers(0, Q, (n, 2, d2, 2, N)).astype(np.uint64)
    bsk = jax.device_put(pack_bsk(bsk_hat, Q))

    for spec in args.tiles.split(","):
        BT, bt = (int(x) for x in spec.split(":"))
        try:
            fn = build_pallas_rotate(N, Q, base_g, digits_eff, 0, n, BT, bt)
            t0 = time.time()
            o = fn(acc, a_idx, bsk)
            np.asarray(jax.device_get(o[:1, :1, :8]))
            compile_s = time.time() - t0
            times = []
            for _ in range(args.iters):
                t0 = time.time()
                o = fn(acc, a_idx, bsk)
                np.asarray(jax.device_get(o[:1, :1, :8]))
                times.append(time.time() - t0)
            best = min(times)
            print(f"BT={BT:4d} bt={bt:3d}: {best*1e3:9.1f} ms/batch "
                  f"({best/B*1e6:6.2f} us/rot, compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"BT={BT:4d} bt={bt:3d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
