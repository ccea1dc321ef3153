#!/usr/bin/env python
"""Advanced CKKS usage: scaling techniques, hybrid key switching, rotations.

Counterpart of the reference's `src/pke/examples/advanced-real-numbers.cpp`:
  - AutomaticRescaleDemo (FLEXIBLEAUTO / FIXEDAUTO): x^18 + x^9 + 1 with no
    manual rescale calls (advanced-real-numbers.cpp:138-213),
  - ManualRescaleDemo (FIXEDMANUAL): the same circuit with explicit
    rescales (advanced-real-numbers.cpp:300-360),
  - HybridKeySwitchingDemo: dnum digit-count vs noise/size trade
    (advanced-real-numbers.cpp:370-450),
  - FastRotationsDemo: packed slot rotations (advanced-real-numbers.cpp:460+).

Run: python examples/pke_advanced_real_numbers.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams  # noqa: E402
from tfhe_tpu.pke.ckks_auto import CKKSAutoContext  # noqa: E402
from tfhe_tpu.pke.ckks_rns import CKKSRnsContext  # noqa: E402
from tfhe_tpu.pke.dcrt import DCRTParams, _moduli_chain_pattern  # noqa: E402

N, DEPTH_LIMBS, SCALE_BITS = 128, 6, 40
# wide first limb (the reference's firstModSize=60 rule) so values computed
# down to the last level keep headroom over the encoding scale
CHAIN = (52,) + (SCALE_BITS,) * (DEPTH_LIMBS - 1)
X = np.array([1.0, 1.01, 1.02, 1.03, 1.04, 1.05, 1.06, 1.07])


def _fresh(technique: str):
    p = CKKSParams(N=N,
                   dcrt=DCRTParams(N=N,
                                   moduli=_moduli_chain_pattern(N, CHAIN)),
                   scale=float(1 << SCALE_BITS))
    base = CKKSContext(p, seed=20260818)
    rns = CKKSRnsContext(base, dnum=2)
    sk, pk = base.key_gen()
    if technique == "fixedmanual":
        return rns, base, sk, pk
    actx = CKKSAutoContext(rns, technique=technique)
    return actx, base, sk, pk


def automatic_rescale_demo(technique: str):
    print(f"\n===== {technique} demo: x^18 + x^9 + 1, no manual rescales =====")
    actx, base, sk, pk = _fresh(technique)
    rlk = actx.relin_key_gen(sk)
    c = actx.encrypt(pk, X)

    # x^18 + x^9 + 1 exactly as the reference sequences it
    c2 = actx.eval_mult(c, c, rlk)          # x^2
    c4 = actx.eval_mult(c2, c2, rlk)        # x^4
    c8 = actx.eval_mult(c4, c4, rlk)        # x^8
    c16 = actx.eval_mult(c8, c8, rlk)       # x^16
    c9 = actx.eval_mult(c8, c, rlk)         # x^9
    c18 = actx.eval_mult(c16, c2, rlk)      # x^18
    res = actx.eval_add_plain(actx.eval_add(c18, c9), 1.0)

    got = actx.decrypt(sk, res).real[:X.size]
    want = X ** 18 + X ** 9 + 1
    print("x^18 + x^9 + 1 =", np.round(got, 6))
    print("max err:", float(np.abs(got - want).max()))


def manual_rescale_demo():
    print("\n===== FIXEDMANUAL demo: explicit rescale management =====")
    rns, base, sk, pk = _fresh("fixedmanual")
    rlk = rns.relin_key_gen_single(sk)
    c = base.encrypt(pk, X)                 # scale Delta, full chain

    def drop_to(ct, lp):                    # align a fresh ct to a chain
        from tfhe_tpu.pke.ckks import CKKSCiphertext
        from tfhe_tpu.pke.dcrt import DCRTPoly
        polys = [DCRTPoly(lp, p.rns[:lp.L], p.eval_form) for p in ct.polys]
        return CKKSCiphertext(polys, ct.scale, ct.params)

    c2 = rns.eval_mult(c, c, rlk)           # rescales internally
    c4 = rns.eval_mult(c2, c2, rlk)
    c8 = rns.eval_mult(c4, c4, rlk)
    c16 = rns.eval_mult(c8, c8, rlk)
    # x^9 = x^8 * x needs x at x^8's level — the manual LevelReduce the
    # automatic modes do for you
    c_at8 = drop_to(c, c8.polys[0].params)
    # scales differ (Delta vs drifted); the manual mode must track them
    c9 = rns.eval_mult(c8, c_at8, rlk)
    c2_at16 = drop_to(c2, c16.polys[0].params)
    c18 = rns.eval_mult(c16, c2_at16, rlk)
    # align c9 to c18 for the final add (one more limb drop)
    c9_at18 = drop_to(c9, c18.polys[0].params)
    c9_at18.scale = c18.scale               # scales agree to ~2^-40 here
    s = rns.eval_add(c18, c9_at18)
    got = base.decrypt(sk, s).real[:X.size] + 1.0
    want = X ** 18 + X ** 9 + 1
    print("x^18 + x^9 + 1 =", np.round(got, 6))
    print("max err:", float(np.abs(got - want).max()),
          " (every alignment above is what fixedauto/flexibleauto automate)")


def hybrid_key_switching_demo():
    print("\n===== Hybrid key switching: dnum trade-off =====")
    for dnum in (2, 3):
        p = CKKSParams(N=N,
                       dcrt=DCRTParams(N=N,
                                       moduli=_moduli_chain_pattern(N, CHAIN)),
                       scale=float(1 << SCALE_BITS))
        base = CKKSContext(p, seed=20260818)
        actx = CKKSAutoContext(CKKSRnsContext(base, dnum=dnum))
        sk, pk = base.key_gen()
        rlk = actx.relin_key_gen(sk)
        towers = len(rlk.bs) * len(rlk.pq_params.moduli)
        c = actx.encrypt(pk, X)
        t0 = time.time()
        c2 = actx.eval_mult(c, c, rlk)
        dt = time.time() - t0
        err = np.abs(actx.decrypt(sk, c2).real[:X.size] - X ** 2).max()
        print(f"dnum={dnum}: key towers={towers} "
              f"(larger dnum = smaller special modulus, more key material), "
              f"mult {dt * 1e3:.1f} ms, err {err:.2e}")


def fast_rotations_demo():
    print("\n===== Packed rotations =====")
    actx, base, sk, pk = _fresh("flexibleauto")
    x = np.arange(1.0, 9.0)
    c = actx.encrypt(pk, x)
    for steps in (1, 2, 3):
        gk = actx.galois_key_gen(sk, steps)
        rot = actx.eval_rotate(c, steps, gk)
        got = actx.decrypt(sk, rot).real[:x.size]
        print(f"rot {steps}: {np.round(got, 4)}")


if __name__ == "__main__":
    automatic_rescale_demo("flexibleauto")
    automatic_rescale_demo("fixedauto")
    manual_rescale_demo()
    hybrid_key_switching_demo()
    fast_rotations_demo()
