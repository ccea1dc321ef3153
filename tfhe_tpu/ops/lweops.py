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

import functools

import numpy as np

from .. import lwe

_LIMB_BITS = 7
_LIMB_MASK = (1 << _LIMB_BITS) - 1


def _n_limbs(modulus: int) -> int:
    return (int(modulus - 1).bit_length() + _LIMB_BITS - 1) // _LIMB_BITS


def _split_limbs_i8(x: np.ndarray, n_limbs: int) -> np.ndarray:
    """uint64 residues -> int8 [n_limbs, *x.shape] of 7-bit limbs (all < 128)."""
    out = np.empty((n_limbs,) + x.shape, dtype=np.int8)
    for l in range(n_limbs):
        out[l] = ((x >> np.uint64(_LIMB_BITS * l)) & np.uint64(_LIMB_MASK)).astype(np.int8)
    return out


@functools.lru_cache(maxsize=None)
def _build_mul_matrix_device(modulus: int, n_limbs: int, k_chunks: int):
    """Jitted exact modular GEMM: (wt_limbs [Lw, M, K] i8, c_limbs [La, K, n1] i8)
    -> (lo, hi) uint32 [M, n1] pairs of the residues mod `modulus`.

    The MXU does the integer matmuls (7-bit limbs, int8 x int8 -> int32 is
    exact for K*127^2 < 2^31); partial sums are grouped by limb-weight
    2^(7*(i+j)) and recombined with two-limb Shoup multiplications. TPU-native
    replacement for the reference's float64 cuBLAS GEMM
    (lwe-operation.cu:50-141), exact for any modulus < 2^54."""
    import jax
    import jax.numpy as jnp

    from . import modmath64 as mm64

    n_s = 2 * n_limbs - 1
    w_pairs = []
    for s in range(n_s):
        w = pow(2, _LIMB_BITS * s, modulus)
        sh = mm64.shoup64(np.array([w], dtype=np.uint64), modulus)
        w_pairs.append((mm64._const_pair(w), (np.uint32(sh[0][0]), np.uint32(sh[1][0]))))

    @jax.jit
    def mul(wt_limbs, c_limbs):
        K = wt_limbs.shape[2]
        kc = K // k_chunks
        # per-(i, j) exact int32 matmuls, accumulated per weight-class s=i+j
        # as uint32 pairs (sums stay far below 2^64)
        groups = [None] * n_s
        for j in range(wt_limbs.shape[0]):
            for i in range(c_limbs.shape[0]):
                s_ij = None
                for c in range(k_chunks):
                    p = jax.lax.dot(wt_limbs[j, :, c * kc:(c + 1) * kc],
                                    c_limbs[i, c * kc:(c + 1) * kc, :],
                                    preferred_element_type=jnp.int32)
                    pp = (p.astype(jnp.uint32), jnp.zeros_like(p, dtype=jnp.uint32))
                    s_ij = pp if s_ij is None else mm64.add64(s_ij, pp)
                s = i + j
                groups[s] = s_ij if groups[s] is None else mm64.add64(groups[s], s_ij)
        out = None
        for s in range(n_s):
            w, wsh = w_pairs[s]
            t = mm64.mulmod_shoup64(groups[s], w, wsh, modulus)
            out = t if out is None else mm64.addmod64(out, t, modulus)
        return out

    return mul


def ciphertext_mul_matrix_device(cts: lwe.LWECiphertext, matrix: np.ndarray,
                                 modulus: int) -> lwe.LWECiphertext:
    """Device (MXU) version of ciphertext_mul_matrix — exact, any modulus < 2^54."""
    import jax

    from . import modmath64 as mm64

    if cts.a.ndim != 2:
        raise ValueError("ciphertext_mul_matrix expects a batched ciphertext [K, n]")
    K, n = cts.a.shape
    matrix = np.asarray(matrix)
    if matrix.shape[0] != K:
        raise ValueError("number of matrix rows must equal the number of input ciphertexts")
    if modulus >= (1 << 54):
        raise ValueError("modulus must be < 2^54")
    mod = np.uint64(modulus)
    L = _n_limbs(modulus)

    comp = np.concatenate([np.asarray(cts.a).astype(np.uint64) % mod,
                           (np.asarray(cts.b).astype(np.uint64) % mod)[:, None]], axis=1)
    w = (matrix.astype(object) % int(modulus)).astype(np.uint64)      # [K, M]

    # int32 accumulator bound: k_chunk * 127^2 < 2^31
    k_chunks = 1
    while (K // k_chunks) * _LIMB_MASK * _LIMB_MASK >= (1 << 31) or K % k_chunks:
        k_chunks += 1
    c_limbs = _split_limbs_i8(comp, L)                                # [L, K, n+1]
    wt_limbs = _split_limbs_i8(np.ascontiguousarray(w.T), L)          # [L, M, K]

    mul = _build_mul_matrix_device(int(modulus), L, k_chunks)
    lo, hi = jax.device_get(mul(wt_limbs, c_limbs))
    out = mm64.unpack_host(lo, hi)                                    # [M, n+1]
    return lwe.LWECiphertext(out[:, :n].copy(), out[:, n].copy(), modulus)


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
