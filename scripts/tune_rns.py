"""Sweep the RNS rotation kernel tiling (BT, bt) on real hardware.

The round-1 tuning (BT=256, bt=32) was done at N=1024/d2=12; the sign and
decomp pipelines run N=2048/d2=6 where the optimum may differ (VMEM pressure
doubles with N). Prints ms per rotation batch for each tiling; set the winner
via TFHE_TPU_RNS_BT / TFHE_TPU_RNS_BTI for production runs.

Usage (on the TPU):  python scripts/tune_rns.py [--batch 4096] [--n 1305]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--n", type=int, default=1305)
    ap.add_argument("--N", type=int, default=2048)
    ap.add_argument("--d2", type=int, default=6)
    ap.add_argument("--tiles", default="128:32,256:16,256:32,256:64,512:32")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from tfhe_tpu.utils.jaxcfg import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from tfhe_tpu.ops.pallas_rotate_rns import build_pallas_rotate_rns
    from tfhe_tpu.utils.numtheory import ntt_prime, previous_prime

    N, n, B, d2 = args.N, args.n, args.batch, args.d2
    q1 = ntt_prime(27, 2 * N)
    q2 = previous_prime(q1, 2 * N)
    base_g = 1 << 18          # d2 = 6 (digits_g 3, throw 0) at logQ 17-ish
    digits_eff = d2 // 2
    print(f"N={N} n={n} B={B} d2={d2} q1={q1} q2={q2}", file=sys.stderr)

    rng = np.random.default_rng(0)
    acc1 = jax.device_put(rng.integers(0, q1, (B, 2, N)).astype(np.uint32))
    acc2 = jax.device_put(rng.integers(0, q2, (B, 2, N)).astype(np.uint32))
    a_idx = jax.device_put(rng.integers(0, 2 * N, (B, n)).astype(np.int32))
    bsk = jax.device_put(rng.integers(0, q1, (n, 8 * d2, N)).astype(np.uint32))

    for spec in args.tiles.split(","):
        BT, bt = (int(x) for x in spec.split(":"))
        try:
            fn = build_pallas_rotate_rns(N, q1, q2, base_g, digits_eff, 0, n,
                                         BT, bt)
            t0 = time.time()
            o1, o2 = fn(acc1, acc2, a_idx, bsk)
            np.asarray(jax.device_get(o1[:1, :1, :8]))
            compile_s = time.time() - t0
            times = []
            for _ in range(args.iters):
                t0 = time.time()
                o1, o2 = fn(acc1, acc2, a_idx, bsk)
                np.asarray(jax.device_get(o1[:1, :1, :8]))
                times.append(time.time() - t0)
            best = min(times)
            print(f"BT={BT:4d} bt={bt:3d}: {best*1e3:9.1f} ms/batch "
                  f"({best/B*1e6:6.2f} us/rot, compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"BT={BT:4d} bt={bt:3d}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
