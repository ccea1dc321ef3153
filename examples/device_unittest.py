#!/usr/bin/env python
"""Device-backend correctness sweep — the analogue of the reference's GPU
validation example `src/binfhe/examples/unittest.cpp` (decrypt-compare of
batched EvalFunc, multi-LUT EvalFunc, all gates, EvalFloor/Sign/Decomp).

Runs at accelerated-TOY parameters so it completes in minutes on any backend.

Usage: python examples/device_unittest.py [--oracle]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tfhe_tpu.utils.jaxcfg import enable_compile_cache

enable_compile_cache()

from tfhe_tpu import BinFHEContext, Gate, ParamSet  # noqa: E402

PASS = {True: "PASS", False: "FAIL"}
failures = 0


def check(name, ok):
    global failures
    print(f"  {name}: {PASS[bool(ok)]}", flush=True)
    failures += not ok


def main():
    use_device = "--oracle" not in sys.argv

    # -- gates (all 8) at TOY logQ=11 ----------------------------------------
    cc = BinFHEContext(seed=101)
    cc.generate_binfhe_context(ParamSet.TOY, arb_func=False, log_q=11)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    if use_device:
        cc.device_setup()
    rng = np.random.default_rng(0)
    m1, m2 = rng.integers(0, 2, 64), rng.integers(0, 2, 64)
    ct1, ct2 = cc.encrypt(sk, m1), cc.encrypt(sk, m2)
    truth = {
        Gate.AND: m1 & m2, Gate.OR: m1 | m2,
        Gate.NAND: 1 - (m1 & m2), Gate.NOR: 1 - (m1 | m2),
        Gate.XOR_FAST: m1 ^ m2, Gate.XNOR_FAST: 1 - (m1 ^ m2),
        Gate.XOR: m1 ^ m2, Gate.XNOR: 1 - (m1 ^ m2),
    }
    print("== gates (TOY, logQ=11) ==", flush=True)
    for g, want in truth.items():
        out = cc.eval_bin_gate(g, ct1, ct2)
        check(g.name, np.array_equal(np.asarray(cc.decrypt(sk, out)), want))

    # -- EvalFunc single + multi-LUT at TOY logQ=12 ---------------------------
    cc = BinFHEContext(seed=102)
    cc.generate_binfhe_context(ParamSet.TOY, arb_func=True, log_q=12)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    if use_device:
        cc.device_setup()
    p = cc.get_max_plaintext_space()
    cube = cc.generate_lut_via_function(lambda m, pp: (m ** 3) % pp, p)
    sq = cc.generate_lut_via_function(lambda m, pp: (m * m) % pp, p)
    msgs = np.arange(p)
    cts = cc.encrypt(sk, msgs, "FRESH", p)
    print("== EvalFunc (TOY, logQ=12) ==", flush=True)
    out = cc.eval_func(cts, cube)
    check("EvalFunc x^3", np.array_equal(
        np.asarray(cc.decrypt(sk, out, p), dtype=np.int64), (msgs ** 3) % p))
    luts = np.stack([cube, sq] * (p // 2))
    out = cc.eval_func(cts, luts, per_ct_luts=True)
    want = np.where(msgs % 2 == 0, (msgs ** 3) % p, (msgs * msgs) % p)
    check("EvalFunc multi-LUT", np.array_equal(
        np.asarray(cc.decrypt(sk, out, p), dtype=np.int64), want))

    # -- EvalFloor / EvalSign at TOY logQ=12 ----------------------------------
    cc = BinFHEContext(seed=103)
    cc.generate_binfhe_context(ParamSet.TOY, arb_func=False, log_q=12)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    if use_device:
        cc.device_setup()
    p = cc.get_max_plaintext_space()
    msgs = rng.integers(0, p, 16)
    cts = cc.encrypt(sk, msgs, "FRESH", p)
    print("== EvalFloor / EvalSign (TOY, logQ=12) ==", flush=True)
    out = cc.eval_floor(cts, 1)
    check("EvalFloor", np.array_equal(
        np.asarray(cc.decrypt(sk, out, p // 2), dtype=np.int64), msgs // 2))
    Q_enc = 1 << 12
    q = cc.params.lwe.q
    P = p * (Q_enc // q)
    delta = rng.integers(-2, 3, 16)
    ms = (P // 2 + delta) % P
    cts = cc.encrypt(sk, ms, "FRESH", P, Q_enc)
    out = cc.eval_sign(cts)
    check("EvalSign", np.array_equal(
        np.asarray(cc.decrypt(sk, out, 2), dtype=np.int64),
        (delta >= 0).astype(np.int64)))

    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
