#!/usr/bin/env python
"""Benchmark harness: amortized gate-bootstrap throughput on the active JAX
devices (the analogue of the reference's `examples/time-estimate.cpp`
EvalBinGate test: batched NAND at STD128, amortized per ciphertext).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the driver target of >= 10k STD128 CGGI gate
bootstraps/sec on a v5e-16, i.e. 625 bootstraps/sec/chip (BASELINE.md).

All progress chatter goes to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny TOY run to validate the pipeline end-to-end")
    ap.add_argument("--devices", type=int, default=0)
    args = ap.parse_args()

    from tfhe_tpu.utils.jaxcfg import enable_compile_cache
    enable_compile_cache()
    import jax
    from tfhe_tpu import BinFHEContext, Gate, ParamSet

    devs = jax.devices()
    log(f"devices: {devs}")

    if args.smoke:
        param_set, batch, iters = ParamSet.TOY, min(args.batch, 64), 2
    else:
        param_set, batch, iters = ParamSet.STD128, args.batch, args.iters

    cc = BinFHEContext(seed=20260816)
    cc.generate_binfhe_context(param_set)
    p = cc.params
    log(f"params: n={p.lwe.n} N={p.lwe.N} q={p.lwe.q} Q={p.lwe.Q} "
        f"qKS={p.lwe.q_ks} baseG={p.rgsw.base_g} digitsG2={p.rgsw.digits_g2}")

    t0 = time.time()
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    log(f"keygen: {time.time() - t0:.1f}s")

    t0 = time.time()
    cc.device_setup(num_devices=args.devices)
    log(f"device_setup: {time.time() - t0:.1f}s")

    rng = np.random.default_rng(0)
    m1 = rng.integers(0, 2, batch)
    m2 = rng.integers(0, 2, batch)
    ct1 = cc.encrypt(sk, m1)
    ct2 = cc.encrypt(sk, m2)

    # warm-up/compile
    t0 = time.time()
    out = cc.eval_bin_gate(Gate.NAND, ct1, ct2)
    log(f"first batch (compile + run): {time.time() - t0:.1f}s")

    # correctness check on the warm-up batch
    dec = np.asarray(cc.decrypt(sk, out), dtype=np.int64)
    want = 1 - (m1 & m2)
    n_bad = int((dec != want).sum())
    if n_bad:
        log(f"ERROR: {n_bad}/{batch} wrong gate results")
        print(json.dumps({"metric": "gate_bootstraps_per_sec_per_chip",
                          "value": 0.0, "unit": "bootstraps/s/chip",
                          "vs_baseline": 0.0, "error": f"{n_bad} wrong results"}))
        return 1

    t0 = time.time()
    for _ in range(iters):
        out = cc.eval_bin_gate(Gate.NAND, ct1, ct2)
    elapsed = time.time() - t0
    total = batch * iters
    per_sec = total / elapsed
    n_chips = len(devs) if args.devices == 0 else args.devices
    per_chip = per_sec / n_chips
    log(f"{total} bootstraps in {elapsed:.2f}s -> {per_sec:.1f}/s "
        f"({per_chip:.1f}/s/chip, {1000.0 / per_sec * 1000:.3f} us/bootstrap amortized)")

    print(json.dumps({
        "metric": "gate_bootstraps_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "bootstraps/s/chip (STD128 CGGI batched NAND)",
        "vs_baseline": round(per_chip / 625.0, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
