"""LWE ciphertext x plaintext-matrix product, checked exactly.

Equivalent of `src/binfhe/examples/GEMM.cpp` (GPU cuBLAS vs CPU compare).
Our implementation is exact for any modulus < 2^54, so the check is
element-exact against big-int arithmetic rather than float64-lucky.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import time

import numpy as np

from tfhe_tpu import BinFHEContext, ParamSet


def main():
    cc = BinFHEContext(seed=0)
    cc.generate_binfhe_context(ParamSet.TOY, arb_func=True, log_q=12)
    sk = cc.key_gen()
    mod = cc.params.lwe.q_ks  # 2^35, as in GEMM.cpp

    K, M = 256, 256
    p = cc.get_max_plaintext_space()
    msgs = np.arange(K) % p
    cts = cc.encrypt(sk, msgs, "FRESH", p, mod)
    rng = np.random.default_rng(1)
    matrix = rng.integers(-100, 101, (K, M))

    t0 = time.time()
    out = cc.ciphertext_mul_matrix(cts, matrix, mod)
    print(f"{K}x{M} ciphertext-matrix product: {time.time()-t0:.2f}s")

    # exact spot check
    j = 7
    want_b = sum(int(matrix[k, j]) * int(cts.b[k]) for k in range(K)) % mod
    assert int(out.b[j]) == want_b
    want_a0 = sum(int(matrix[k, j]) * int(cts.a[k, 0]) for k in range(K)) % mod
    assert int(out.a[j, 0]) == want_a0
    print("element-exact check passed")


if __name__ == "__main__":
    main()
