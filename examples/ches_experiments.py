#!/usr/bin/env python
"""CHES-experiments analogue (`src/binfhe/examples/CHES-experiments.cpp`):

1. 1000 iterations of a 256-ciphertext batched AND at STD128 (the TFHE-rs
   comparison harness, CHES-experiments.cpp:31-62) — prints total and
   per-iteration latency.
2. EvalFunc batch-size sweep 1 -> 512 (avg of 5) at logQ=12, baseG=2^18
   (CHES-experiments.cpp:102-122).

Usage: python examples/ches_experiments.py [and|sweep] [--iters N]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tfhe_tpu.utils.jaxcfg import enable_compile_cache

enable_compile_cache()

from tfhe_tpu import BinFHEContext, Gate, ParamSet  # noqa: E402


def run_and(iters: int):
    print(f"== {iters} iterations x 256-ct batched AND, STD128 logQ=11 ==", flush=True)
    cc = BinFHEContext(seed=1)
    cc.generate_binfhe_context(ParamSet.STD128, arb_func=False, log_q=11)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    cc.device_setup()
    rng = np.random.default_rng(0)
    m1, m2 = rng.integers(0, 2, 256), rng.integers(0, 2, 256)
    ct1, ct2 = cc.encrypt(sk, m1), cc.encrypt(sk, m2)
    out = cc.eval_bin_gate(Gate.AND, ct1, ct2)   # compile
    assert np.array_equal(np.asarray(cc.decrypt(sk, out)), m1 & m2)
    t0 = time.time()
    for _ in range(iters):
        out = cc.eval_bin_gate(Gate.AND, ct1, ct2)
    dt = time.time() - t0
    # dimensional cross-check: ms/iteration x gates/s must multiply out to
    # 256 gates/iteration (round-2 docs misreported this line as us)
    per_iter_ms = dt / iters * 1e3
    gates_per_s = 256 * iters / dt
    print(f"total: {dt:.2f}s, {per_iter_ms:.1f} ms/iteration, "
          f"{per_iter_ms / 256:.3f} ms/gate ({gates_per_s:.0f} gates/s; "
          f"check: {per_iter_ms * gates_per_s / 1e3:.0f} gates/iter)",
          flush=True)


def run_sweep():
    print("== EvalFunc batch sweep 1 -> 512, logQ=12, baseG=2^18 (avg of 5) ==",
          flush=True)
    cc = BinFHEContext(seed=2)
    cc.generate_binfhe_context(ParamSet.STD128, arb_func=True, log_q=12,
                               base_g=1 << 18)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    cc.device_setup()
    p = cc.get_max_plaintext_space()
    lut = cc.generate_lut_via_function(lambda m, pp: (m * m) % pp, p)
    rng = np.random.default_rng(1)
    batch = 1
    while batch <= 512:
        m = rng.integers(0, p, batch)
        ct = cc.encrypt(sk, m, "FRESH", p)
        cc.eval_func(ct, lut)    # compile this shape
        t0 = time.time()
        for _ in range(5):
            cc.eval_func(ct, lut)
        dt = (time.time() - t0) / 5
        print(f"batch {batch:4d}: {dt * 1000:8.1f} ms total, "
              f"{dt / batch * 1000:7.2f} ms/ctx", flush=True)
        batch *= 2


def main():
    ops = [a for a in sys.argv[1:] if not a.startswith("--")] or ["and", "sweep"]
    iters = 1000
    for a in sys.argv[1:]:
        if a.startswith("--iters="):
            iters = int(a.split("=")[1])
    if "and" in ops:
        run_and(iters)
    if "sweep" in ops:
        run_sweep()


if __name__ == "__main__":
    main()
