"""Arbitrary function evaluation via LUT — f(x) = x^3 mod p.

Equivalent of `src/binfhe/examples/eval-function.cpp` and the GPU
`unittest.cpp` EvalFunc section (single and per-ciphertext multi-LUT).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

from tfhe_tpu import BinFHEContext, ParamSet


def main():
    cc = BinFHEContext()
    # TOY keeps the demo fast; use STD128 for the production setting
    cc.generate_binfhe_context(ParamSet.TOY, arb_func=True, log_q=12,
                               num_digits_to_throw=1)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)

    p = cc.get_max_plaintext_space()
    print(f"plaintext space p = {p}")

    def f_cube(m, p1):
        return (m * m * m) % p1 if m < p1 else ((m - p1 // 2) ** 3) % p1

    lut = cc.generate_lut_via_function(f_cube, p)

    msgs = np.arange(p)
    cts = cc.encrypt(sk, msgs, "FRESH", p)
    out = cc.eval_func(cts, lut)
    dec = np.asarray(cc.decrypt(sk, out, p), dtype=np.int64)
    for i in range(p):
        print(f"f({i}) = {dec[i]}  (expected {f_cube(i, p)})")
    assert (dec == [f_cube(i, p) for i in range(p)]).all()

    # per-ciphertext LUTs (multi-LUT overload, binfhe-base-scheme.cpp:791-924)
    lut_sq = cc.generate_lut_via_function(lambda m, q: (m * m) % q, p)
    luts = np.stack([lut, lut_sq] * (p // 2))
    out2 = cc.eval_func(cts, luts, per_ct_luts=True)
    dec2 = np.asarray(cc.decrypt(sk, out2, p), dtype=np.int64)
    print("multi-LUT:", dec2.tolist())


if __name__ == "__main__":
    main()
