#!/usr/bin/env python
"""Time the fused Pallas blind-rotation kernel on the active JAX device for
different (BT, bt) tilings — compile time and steady-state throughput.

Usage: python scripts/profile_pallas.py [BT bt [BT bt ...]] [--batch B]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tfhe_tpu.utils.jaxcfg import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402

from tfhe_tpu.ops import pallas_rotate as pr  # noqa: E402
from tfhe_tpu.ref import ntt as ref_ntt  # noqa: E402
from tfhe_tpu.utils.numtheory import ntt_prime  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = 4096
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
    tilings = [(int(args[i]), int(args[i + 1])) for i in range(0, len(args), 2)]
    if not tilings:
        tilings = [(256, 32)]

    # STD128 classic shapes
    N, n, base_g, digits, throw = 1024, 512, 128, 4, 0
    Q = ntt_prime(27, 2 * N)
    d2 = 2 * digits
    rng = np.random.default_rng(0)
    acc = rng.integers(0, Q, (batch, 2, N)).astype(np.uint32)
    a_idx = rng.integers(0, 2 * N, (batch, n)).astype(np.int32)
    bsk_hat = ref_ntt.forward(
        rng.integers(0, Q, (n, 2, d2, 2, N)).astype(np.uint64), Q)
    pk = jax.device_put(pr.pack_bsk(bsk_hat, Q))
    acc_d = jax.device_put(acc)
    a_d = jax.device_put(a_idx)
    print(f"device={jax.devices()[0]} batch={batch} N={N} n={n} d2={d2}",
          flush=True)

    def run_sync(fn, *args):
        # device_get forces completion; block_until_ready is unreliable
        # over remote-device tunnels
        out = fn(*args)
        np.asarray(jax.device_get(out[:1]))
        return out

    for BT, bt in tilings:
        fn = pr.build_pallas_rotate(N, Q, base_g, digits, throw, n, BT=BT, bt=bt)
        t0 = time.time()
        run_sync(fn, acc_d, a_d, pk)
        t_compile = time.time() - t0
        t0 = time.time()
        iters = 3
        for _ in range(iters):
            run_sync(fn, acc_d, a_d, pk)
        dt = (time.time() - t0) / iters
        print(f"BT={BT} bt={bt}: compile+1st={t_compile:.1f}s "
              f"steady={dt * 1000:.1f}ms/batch "
              f"-> {batch / dt:.0f} rotations/s", flush=True)


if __name__ == "__main__":
    main()
