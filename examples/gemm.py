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

    K, M = 1024, 1024
    if "--small" in sys.argv:
        K = M = 256
    p = cc.get_max_plaintext_space()
    msgs = np.arange(K) % p
    cts = cc.encrypt(sk, msgs, "FRESH", p, mod)
    rng = np.random.default_rng(1)
    matrix = rng.integers(-100, 101, (K, M))

    from tfhe_tpu.ops.lweops import (ciphertext_mul_matrix,
                                     ciphertext_mul_matrix_device)

    t0 = time.time()
    out_host = ciphertext_mul_matrix(cts, matrix, mod)
    t_host = time.time() - t0
    print(f"{K}x{M} host (exact 9-bit-limb numpy): {t_host:.2f}s")

    out = ciphertext_mul_matrix_device(cts, matrix, mod)  # warm-up/compile
    t0 = time.time()
    out = ciphertext_mul_matrix_device(cts, matrix, mod)
    t_dev = time.time() - t0
    print(f"{K}x{M} device (int8-limb MXU): {t_dev:.2f}s "
          f"({t_host / t_dev:.1f}x vs host)")

    # device == host, element-exact (GEMM.cpp's GPU-vs-CPU compare)
    assert np.array_equal(np.asarray(out.a), np.asarray(out_host.a))
    assert np.array_equal(np.asarray(out.b), np.asarray(out_host.b))

    # independent big-int spot check
    j = 7
    want_b = sum(int(matrix[k, j]) * int(cts.b[k]) for k in range(K)) % mod
    assert int(out.b[j]) == want_b
    want_a0 = sum(int(matrix[k, j]) * int(cts.a[k, 0]) for k in range(K)) % mod
    assert int(out.a[j, 0]) == want_a0
    print("element-exact check passed (device == host == bigint)")


if __name__ == "__main__":
    main()
