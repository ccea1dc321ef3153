"""Batched LWE linear algebra: ciphertext x plaintext-matrix products.

Equivalent of `GPULWEOperation::CiphertextMulMatrix_CUDA`
(`src/binfhe/lib/lwe-operation.cu:50-141`), which computes, for K input
ciphertexts and a [K, M] int64 matrix, the M output ciphertexts
out_j = sum_k matrix[k][j] * ct_k (componentwise), mod `modulus`.

The reference computes this in float64 via cuBLAS and `fmod`, which is only
exact while every inner product stays below 2^53 (its own GEMM example keeps
entries small for exactly this reason). We compute the exact residue instead,
for any modulus up to 2^54: the ciphertext components are split into 9-bit
limbs and each limb is multiplied by a pre-shifted copy of the matrix residues
so that every partial product stays below 2^63 in uint64.
"""

from __future__ import annotations

import numpy as np

from .. import lwe


def ciphertext_mul_matrix(cts: lwe.LWECiphertext, matrix: np.ndarray,
                          modulus: int) -> lwe.LWECiphertext:
    """cts: batched ciphertext with a [K, n], b [K]; matrix: [K, M] integers
    (signed allowed). Returns batched ciphertext with a [M, n], b [M] mod
    `modulus`."""
    if cts.a.ndim != 2:
        raise ValueError("ciphertext_mul_matrix expects a batched ciphertext [K, n]")
    K, n = cts.a.shape
    matrix = np.asarray(matrix)
    if matrix.shape[0] != K:
        raise ValueError("number of matrix rows must equal the number of input ciphertexts")
    if modulus >= (1 << 54):
        raise ValueError("modulus must be < 2^54")
    mod = np.uint64(modulus)

    # components [K, n+1]: a columns then b (lwe-operation.cu:79-85)
    comp = np.concatenate([np.asarray(cts.a).astype(np.uint64) % mod,
                           (np.asarray(cts.b).astype(np.uint64) % mod)[:, None]], axis=1)
    w = (matrix.astype(object) % int(modulus)).astype(np.uint64)      # residues [K, M]

    limb_bits = 9
    n_limbs = (modulus.bit_length() + limb_bits - 1) // limb_bits
    mask = np.uint64((1 << limb_bits) - 1)

    # w_i = (w * 2^(9 i)) mod modulus; each doubling step stays < 2^63
    w_shifted = [w]
    for _ in range(n_limbs - 1):
        w_shifted.append((w_shifted[-1] << np.uint64(limb_bits)) % mod)

    out = np.zeros((matrix.shape[1], n + 1), dtype=np.uint64)
    k_chunk = max(1, (1 << 63) // int(modulus))  # keep the K-sum below 2^64
    k_chunk = min(k_chunk, max(1, (1 << 24) // (n + 1)))  # and temporaries bounded
    for i, wi in enumerate(w_shifted):
        limb = (comp >> np.uint64(limb_bits * i)) & mask              # [K, n+1]
        for s in range(0, K, k_chunk):
            e = min(K, s + k_chunk)
            # [Kc, n+1, 1] * [Kc, 1, M] -> reduce over K
            part = (limb[s:e, :, None] * wi[s:e, None, :]) % mod
            out += part.sum(axis=0).T
            out %= mod
    return lwe.LWECiphertext(out[:, :n].copy(), out[:, n].copy(), modulus)
