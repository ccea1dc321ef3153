"""Large-precision sign, flooring, and digit decomposition.

Equivalent of `src/binfhe/examples/eval-sign.cpp`, `eval-flooring.cpp`, and
`eval-decomp.cpp` (shrunk to logQ=17 for demo speed; the reference's GPU
harness uses logQ 11/17/23, time-estimate.cpp:96-190).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from tfhe_tpu import BinFHEContext, ParamSet


def main():
    cc = BinFHEContext()
    cc.generate_binfhe_context(ParamSet.TOY, arb_func=False, log_q=17)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)

    Q_enc = 1 << 17
    q = cc.params.lwe.q
    factor = Q_enc // q
    p = cc.get_max_plaintext_space()
    P = p * factor

    print("== EvalSign ==")
    for i in (-3, -1, 0, 2):
        ct = cc.encrypt(sk, P // 2 + i, "FRESH", P, Q_enc)
        out = cc.eval_sign(ct)
        print(f"sign(center{i:+d}) = {int(cc.decrypt(sk, out, 2))} (expected {int(i >= 0)})")

    print("== EvalFloor ==")
    cc2 = BinFHEContext()
    cc2.generate_binfhe_context(ParamSet.TOY, arb_func=False, log_q=12)
    sk2 = cc2.key_gen()
    cc2.bt_key_gen(sk2)
    p2 = cc2.get_max_plaintext_space()
    for i in (5, 9):
        ct = cc2.encrypt(sk2, i, "FRESH", p2)
        out = cc2.eval_floor(ct, 1)
        print(f"floor({i} >> 1) = {int(cc2.decrypt(sk2, out, p2 // 2))} (expected {i // 2})")

    print("== EvalDecomp ==")
    val = P // 2 + 2
    ct = cc.encrypt(sk, val, "FRESH", P, Q_enc)
    digits = cc.eval_decomp(ct)
    got = [int(cc.decrypt(sk, d, p)) for d in digits[:-1]]
    print(f"decomp({val}) base {p}: {got} (low digits of {val})")


if __name__ == "__main__":
    main()
