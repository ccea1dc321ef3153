#!/usr/bin/env python
"""Host-side microbenchmarks — the analogue of the reference's
google-benchmark suite (`benchmark/src/*`):

  binfhe-{ginx,ap}.cpp      -> bench_gate   (FHEW_BINGATE single-gate)
  poly-benchmark-{1k..64k}  -> bench_ntt / bench_poly (SwitchFormat, ring ops)
  IntegerMath.cpp           -> bench_integer_math (ModMul/ModAdd primitives)
  VectorMath.cpp            -> bench_vector_math  (mod vector ops)
  NbTheory.cpp              -> bench_nbtheory     (prime search/root finding)
  lib-benchmark.cpp         -> bench_pke          (keygen/enc/dec/mult rows)

Usage: python scripts/cpu_bench.py [--sets=MEDIUM,STD128,STD128_OPT]
       [--only=gate,ntt,poly,int,vec,nb,pke]
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


def _timeit(fn, iters: int) -> float:
    t0 = time.time()
    for _ in range(iters):
        fn()
    return (time.time() - t0) / iters


def bench_integer_math():
    """IntegerMath.cpp analogue: vectorized modular primitives (the
    NativeInteger ModMul/ModAdd rows; here one row = 2^20 lanes)."""
    from tfhe_tpu.ref import modmath
    Q = ntt_prime(54, 2048)
    rng = np.random.default_rng(1)
    n = 1 << 20
    a = rng.integers(0, Q, n).astype(np.uint64)
    b = rng.integers(0, Q, n).astype(np.uint64)
    for name, fn in (
            ("ModMul54", lambda: modmath.mul(a, b, Q)),
            ("ModAdd54", lambda: (a + b) % np.uint64(Q)),
            ("ModSub54", lambda: (a + np.uint64(Q) - b) % np.uint64(Q))):
        dt = _timeit(fn, 5)
        print(f"IntegerMath/{name}: {dt / n * 1e9:.2f} ns/op "
              f"({n / dt / 1e6:.0f} Mop/s)", flush=True)


def bench_vector_math():
    """VectorMath.cpp analogue: NativeVector-style ops at ring sizes."""
    from tfhe_tpu.ref import modmath
    for N in (1024, 4096, 16384):
        Q = ntt_prime(54, 2 * N)
        rng = np.random.default_rng(2)
        a = rng.integers(0, Q, N).astype(np.uint64)
        b = rng.integers(0, Q, N).astype(np.uint64)
        dt = _timeit(lambda: modmath.mul(a, b, Q), 200)
        print(f"VectorMath/ModMulVector_{N}: {dt * 1e6:.1f} us", flush=True)


def bench_nbtheory():
    """NbTheory.cpp analogue: NTT prime search + root of unity."""
    from tfhe_tpu.utils.numtheory import previous_prime, root_of_unity
    for N in (1024, 4096, 16384):
        t0 = time.time()
        q = ntt_prime(54, 2 * N)
        t1 = time.time()
        root_of_unity(2 * N, q)
        t2 = time.time()
        previous_prime(q, 2 * N)
        t3 = time.time()
        print(f"NbTheory/N={N}: FirstPrime {1e3 * (t1 - t0):.1f} ms, "
              f"RootOfUnity {1e3 * (t2 - t1):.1f} ms, "
              f"PreviousPrime {1e3 * (t3 - t2):.1f} ms", flush=True)


def bench_poly():
    """poly-benchmark-*.cpp analogue: ring-element ops over a DCRT tower
    (SwitchFormat = NTT both ways, eval-form ring product, add)."""
    from tfhe_tpu.pke.dcrt import DCRTParams, DCRTPoly
    for N in (1024, 4096, 16384):
        lp = DCRTParams.create(N, 4, 40)
        rng = np.random.default_rng(3)
        rows = np.stack([rng.integers(0, m, N) for m in lp.moduli]
                        ).astype(np.uint64)
        p = DCRTPoly(lp, rows, eval_form=False)
        pe = p.to_eval()
        print(f"Lattice/poly_{N} (4-limb tower): "
              f"SwitchFormat {_timeit(lambda: p.to_eval(), 20) * 1e3:.2f} ms, "
              f"MulEval {_timeit(lambda: pe * pe, 50) * 1e3:.2f} ms, "
              f"Add {_timeit(lambda: pe + pe, 50) * 1e3:.2f} ms", flush=True)


def bench_pke():
    """lib-benchmark.cpp analogue: per-scheme KeyGen / Encrypt / Decrypt /
    EvalMult wall-clock on small production-shaped contexts."""
    from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
    from tfhe_tpu.pke.ckks_rns import CKKSRnsContext
    from tfhe_tpu.pke.dcrt import DCRTParams

    p = CKKSParams(N=1024, dcrt=DCRTParams.create(1024, 4, 40),
                   scale=float(1 << 40))
    ctx = CKKSContext(p, seed=5)
    t0 = time.time()
    sk, pk = ctx.key_gen()
    t_kg = time.time() - t0
    rns = CKKSRnsContext(ctx, dnum=2)
    rlk = rns.relin_key_gen_single(sk)
    z = np.random.default_rng(6).uniform(0.1, 0.9, p.slots)
    t_enc = _timeit(lambda: ctx.encrypt(pk, z), 5)
    ct = ctx.encrypt(pk, z)
    t_dec = _timeit(lambda: ctx.decrypt(sk, ct), 5)
    t_mul = _timeit(lambda: rns.eval_mult(ct, ct, rlk), 5)
    print(f"pke/CKKS_N1024_L4: KeyGen {t_kg * 1e3:.0f} ms, "
          f"Encrypt {t_enc * 1e3:.0f} ms, Decrypt {t_dec * 1e3:.0f} ms, "
          f"EvalMult(RNS+relin+rescale) {t_mul * 1e3:.0f} ms", flush=True)


def main():
    sets = ["MEDIUM", "STD128", "STD128_OPT"]
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--sets="):
            sets = a.split("=")[1].split(",")
        if a.startswith("--only="):
            only = set(a.split("=")[1].split(","))

    def want(tag):
        return only is None or tag in only

    if want("gate"):
        for s in sets:
            bench_gate(s, Method.GINX)
        bench_gate("STD128_AP", Method.AP)
    if want("ntt"):
        bench_ntt()
    if want("poly"):
        bench_poly()
    if want("int"):
        bench_integer_math()
    if want("vec"):
        bench_vector_math()
    if want("nb"):
        bench_nbtheory()
    if want("pke"):
        bench_pke()


if __name__ == "__main__":
    main()
