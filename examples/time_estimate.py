#!/usr/bin/env python
"""Amortized per-ciphertext timings for the five batched operations — the
analogue of the reference's perf harness `examples/time-estimate.cpp`:

  gate    EvalBinGate(NAND), STD128, logQ=11          (time-estimate.cpp:31-58)
  func    EvalFunc x^3 mod p, logQ=12, 1 digit thrown (time-estimate.cpp:60-96)
  floor   EvalFloor, logQ=11                          (time-estimate.cpp:98-123)
  sign    EvalSign, logQ=17                           (time-estimate.cpp:125-156)
  decomp  EvalDecomp, logQ=23                         (time-estimate.cpp:158-190)

Usage: python examples/time_estimate.py [op ...] [--batch N] [--oracle]
Defaults to all five at batch 4096 on the JAX device backend.
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


def make_ctx(log_q: int, arb_func: bool, throw: int = 0):
    cc = BinFHEContext(seed=20260816)
    cc.generate_binfhe_context(ParamSet.STD128, arb_func=arb_func, log_q=log_q,
                               num_digits_to_throw=throw)
    sk = cc.key_gen()
    t0 = time.time()
    cc.bt_key_gen(sk)
    print(f"  keygen: {time.time() - t0:.1f}s", flush=True)
    return cc, sk


def timed(label, batch, fn, check=None):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  first run (compile + run): {dt:.1f}s", flush=True)
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    ok = "" if check is None else ("  [OK]" if check(out) else "  [WRONG RESULTS]")
    print(f"{label}: {dt / batch * 1000:.3f} ms/ctx amortized "
          f"({batch / dt:.1f} ops/s, batch {batch}){ok}", flush=True)
    return out


def run_gate(batch, use_device):
    print("== EvalBinGate(NAND), logQ=11 ==", flush=True)
    cc, sk = make_ctx(11, arb_func=False)
    if use_device:
        cc.device_setup()
    rng = np.random.default_rng(0)
    m1, m2 = rng.integers(0, 2, batch), rng.integers(0, 2, batch)
    ct1, ct2 = cc.encrypt(sk, m1), cc.encrypt(sk, m2)
    timed("gate", batch, lambda: cc.eval_bin_gate(Gate.NAND, ct1, ct2),
          check=lambda out: np.array_equal(
              np.asarray(cc.decrypt(sk, out)), 1 - (m1 & m2)))


def run_func(batch, use_device):
    print("== EvalFunc x^3 mod p, logQ=12, throw 1 ==", flush=True)
    cc, sk = make_ctx(12, arb_func=True, throw=1)
    if use_device:
        cc.device_setup()
    p = cc.get_max_plaintext_space()

    def cube(m, p1):
        return (m * m * m) % p1 if m < p1 else ((m - p1 // 2) ** 3) % p1

    lut = cc.generate_lut_via_function(cube, p)
    rng = np.random.default_rng(1)
    m = rng.integers(0, p, batch)
    ct = cc.encrypt(sk, m, "FRESH", p)
    want = np.array([cube(int(x), p) for x in m])
    timed("func", batch, lambda: cc.eval_func(ct, lut),
          check=lambda out: np.array_equal(
              np.asarray(cc.decrypt(sk, out, p), dtype=np.int64), want))


def run_floor(batch, use_device):
    print("== EvalFloor, logQ=11 ==", flush=True)
    cc, sk = make_ctx(11, arb_func=False)
    if use_device:
        cc.device_setup()
    p = cc.get_max_plaintext_space()
    rng = np.random.default_rng(2)
    m = rng.integers(0, p, batch)
    ct = cc.encrypt(sk, m, "FRESH", p)
    timed("floor", batch, lambda: cc.eval_floor(ct, 1),
          check=lambda out: np.array_equal(
              np.asarray(cc.decrypt(sk, out, p // 2), dtype=np.int64), m // 2))


def run_sign(batch, use_device):
    print("== EvalSign, logQ=17 ==", flush=True)
    cc, sk = make_ctx(17, arb_func=False)
    if use_device:
        cc.device_setup()
    Q_enc = 1 << 17
    q = cc.params.lwe.q
    factor = Q_enc // q
    p = cc.get_max_plaintext_space()
    P = p * factor
    rng = np.random.default_rng(3)
    delta = rng.integers(-3, 4, batch)
    m = (P // 2 + delta) % P
    ct = cc.encrypt(sk, m, "FRESH", P, Q_enc)
    timed("sign", batch, lambda: cc.eval_sign(ct),
          check=lambda out: np.array_equal(
              np.asarray(cc.decrypt(sk, out, 2), dtype=np.int64),
              (delta >= 0).astype(np.int64)))


def run_decomp(batch, use_device):
    print("== EvalDecomp, logQ=23 ==", flush=True)
    cc, sk = make_ctx(23, arb_func=False)
    if use_device:
        cc.device_setup()
    Q_enc = 1 << 23
    q = cc.params.lwe.q
    factor = Q_enc // q
    P = cc.get_max_plaintext_space() * factor
    rng = np.random.default_rng(4)
    m = rng.integers(0, P, batch)
    ct = cc.encrypt(sk, m, "FRESH", P, Q_enc)
    timed("decomp", batch, lambda: cc.eval_decomp(ct))


def main():
    ops = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = 4096
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
    use_device = "--oracle" not in sys.argv
    if not ops:
        ops = ["gate", "func", "floor", "sign", "decomp"]
    table = {"gate": run_gate, "func": run_func, "floor": run_floor,
             "sign": run_sign, "decomp": run_decomp}
    for op in ops:
        table[op](batch, use_device)


if __name__ == "__main__":
    main()
