#!/usr/bin/env python
"""Host-oracle scalar gate latency — the analogue of the reference's
google-benchmark suites `benchmark/src/binfhe-{ginx,ap}.cpp`
(FHEW_BINGATE MEDIUM/STD128{_OPT} single-gate microbenchmark) plus NTT
micro-timings (`poly-benchmark-*.cpp`).

Usage: python scripts/cpu_bench.py [--sets MEDIUM,STD128,STD128_OPT]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tfhe_tpu import BinFHEContext, Gate, Method, ParamSet  # noqa: E402
from tfhe_tpu.ref import ntt as ref_ntt  # noqa: E402
from tfhe_tpu.utils.numtheory import ntt_prime  # noqa: E402


def bench_gate(set_name: str, method: Method, iters: int = 5):
    cc = BinFHEContext(seed=1)
    cc.generate_binfhe_context(ParamSet[set_name], method)
    sk = cc.key_gen()
    t0 = time.time()
    cc.bt_key_gen(sk)
    kg = time.time() - t0
    ct1, ct2 = cc.encrypt(sk, 1), cc.encrypt(sk, 0)
    cc.eval_bin_gate(Gate.OR, ct1, ct2)      # warm caches
    t0 = time.time()
    for _ in range(iters):
        out = cc.eval_bin_gate(Gate.OR, ct1, ct2)
    dt = (time.time() - t0) / iters
    ok = int(cc.decrypt(sk, out)) == 1
    print(f"FHEW_BINGATE/{set_name}_OR_{method.name}: {dt * 1e3:.1f} ms/gate "
          f"(keygen {kg:.1f}s){'  [OK]' if ok else '  [WRONG]'}", flush=True)


def bench_ntt():
    for N in (1024, 4096, 16384, 65536):
        Q = ntt_prime(54, 2 * N)
        x = np.random.default_rng(0).integers(0, Q, (64, N)).astype(np.uint64)
        ref_ntt.forward(x[:1], Q)            # build tables
        t0 = time.time()
        ref_ntt.forward(x, Q)
        dt = (time.time() - t0) / 64
        print(f"NTT_{N} (54-bit, native C++): {dt * 1e6:.0f} us/transform", flush=True)


def main():
    sets = ["MEDIUM", "STD128", "STD128_OPT"]
    for a in sys.argv[1:]:
        if a.startswith("--sets="):
            sets = a.split("=")[1].split(",")
    for s in sets:
        bench_gate(s, Method.GINX)
    bench_gate("STD128_AP", Method.AP)
    bench_ntt()


if __name__ == "__main__":
    main()
