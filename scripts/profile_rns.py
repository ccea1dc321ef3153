#!/usr/bin/env python
"""RNS rotation kernel micro-benchmark: time the blind rotation alone at a
given (BT, bt) tiling — the tuning probe for the accelerated 54-bit sets.

Usage: python scripts/profile_rns.py [--bt=BT,bt] [--batch=N] [--d2eff=K]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tfhe_tpu.utils.jaxcfg import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402

from tfhe_tpu.ops.pallas_rotate_rns import build_pallas_rotate_rns, pack_bsk_rns  # noqa: E402
from tfhe_tpu.utils.numtheory import ntt_prime, previous_prime  # noqa: E402


def main():
    BT, bt = 128, 16
    batch, digits_eff, base_g_bits = 4096, 3, 18
    for a in sys.argv[1:]:
        if a.startswith("--bt="):
            BT, bt = (int(x) for x in a.split("=")[1].split(","))
        elif a.startswith("--batch="):
            batch = int(a.split("=")[1])
        elif a.startswith("--d2eff="):
            digits_eff = int(a.split("=")[1])
    N, n = 2048, 1305
    q1 = ntt_prime(27, 2 * N)
    q2 = previous_prime(q1, 2 * N)
    base_g = 1 << base_g_bits
    print(f"N={N} n={n} d2={2*digits_eff} BT={BT} bt={bt} batch={batch}",
          flush=True)

    rng = np.random.default_rng(0)
    acc1 = rng.integers(0, q1, (batch, 2, N)).astype(np.uint32)
    acc2 = rng.integers(0, q2, (batch, 2, N)).astype(np.uint32)
    a_idx = rng.integers(0, 2 * N, (batch, n)).astype(np.int32)
    bsk = rng.integers(0, q1 * q2, (n, 2, 2 * digits_eff, 2, N),
                       dtype=np.uint64)
    t0 = time.time()
    bsk_pack = jax.device_put(pack_bsk_rns(bsk, q1, q2))
    a1d, a2d, aid = (jax.device_put(x) for x in (acc1, acc2, a_idx))
    print(f"pack+upload: {time.time()-t0:.1f}s", flush=True)

    fn = build_pallas_rotate_rns(N, q1, q2, base_g, digits_eff, 0, n,
                                 BT=BT, bt=bt)
    t0 = time.time()
    o1, o2 = fn(a1d, a2d, aid, bsk_pack)
    np.asarray(jax.device_get(o1[:1, :1, :8]))
    print(f"compile+run: {time.time()-t0:.1f}s", flush=True)
    for _ in range(2):
        t0 = time.time()
        o1, o2 = fn(a1d, a2d, aid, bsk_pack)
        np.asarray(jax.device_get(o1[:1, :1, :8]))
        dt = time.time() - t0
        print(f"rotation: {dt:.3f}s  ({batch/dt:.1f} rot/s, "
              f"{dt/batch*1e3:.3f} ms/ct)", flush=True)


if __name__ == "__main__":
    main()
