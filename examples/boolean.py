"""Boolean gate evaluation — the canonical first example.

Equivalent of the reference's `src/binfhe/examples/boolean.cpp`: generate a
context at STD128 (pass --toy for a fast demo), encrypt two bits, evaluate
AND / OR / NAND / XOR, decrypt, print.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse

from tfhe_tpu import BinFHEContext, Gate, ParamSet


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--toy", action="store_true", help="use the TOY set (fast)")
    ap.add_argument("--device", action="store_true", help="run on the JAX/TPU backend")
    args = ap.parse_args()

    cc = BinFHEContext()
    cc.generate_binfhe_context(ParamSet.TOY if args.toy else ParamSet.STD128)
    print("generating the secret key...")
    sk = cc.key_gen()
    print("generating the bootstrapping keys...")
    cc.bt_key_gen(sk)
    if args.device:
        cc.device_setup()
    print("completed key generation.")

    ct1 = cc.encrypt(sk, 1)
    ct2 = cc.encrypt(sk, 0)

    for gate, expect in ((Gate.AND, 0), (Gate.OR, 1), (Gate.NAND, 1), (Gate.XOR, 1)):
        out = cc.eval_bin_gate(gate, ct1, ct2)
        res = int(cc.decrypt(sk, out))
        print(f"{gate.name}(1, 0) = {res}  (expected {expect})")
        assert res == expect

    ct_not = cc.eval_not(ct1)
    print(f"NOT(1) = {int(cc.decrypt(sk, ct_not))}  (expected 0)")


if __name__ == "__main__":
    main()
