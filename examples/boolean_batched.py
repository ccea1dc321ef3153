"""Batched boolean gates on the device backend — the headline workload.

Equivalent of the reference's GPU examples (`unittest.cpp` gate section,
`CHES-experiments.cpp:31-62`): push a whole array of ciphertext pairs through
one batched EvalBinGate call.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import time

import numpy as np

from tfhe_tpu import BinFHEContext, Gate, ParamSet
from tfhe_tpu.utils.jaxcfg import enable_compile_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--paramset", default="STD128")
    args = ap.parse_args()
    enable_compile_cache()

    cc = BinFHEContext(seed=0)
    cc.generate_binfhe_context(ParamSet[args.paramset])
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    cc.device_setup()

    rng = np.random.default_rng(1)
    m1 = rng.integers(0, 2, args.batch)
    m2 = rng.integers(0, 2, args.batch)
    ct1 = cc.encrypt(sk, m1)
    ct2 = cc.encrypt(sk, m2)

    out = cc.eval_bin_gate(Gate.AND, ct1, ct2)  # includes compile
    t0 = time.time()
    out = cc.eval_bin_gate(Gate.AND, ct1, ct2)
    dt = time.time() - t0
    dec = np.asarray(cc.decrypt(sk, out), dtype=np.int64)
    ok = (dec == (m1 & m2)).all()
    print(f"batched AND over {args.batch} ciphertexts: {dt*1000:.1f} ms "
          f"({dt/args.batch*1e6:.0f} us/gate) correct={ok}")


if __name__ == "__main__":
    main()
