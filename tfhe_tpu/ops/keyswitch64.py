"""Fused modswitch -> keyswitch -> modswitch for the accelerated parameter sets
(Q ~ 2^54, qKS = 2^35) on device, in two-limb uint32 arithmetic.

Device analogue of `MKMSwitchKernel` (bootstrapping.cu:73-118) for the
configurations the reference's GPU path actually uses: qKS and baseKS are
powers of two there (qKS = 2^35, baseKS = 32; binfhecontext.cpp:99-103), which
makes digit extraction pure shifts and the final reduction a mask. The
switching key is stored as (lo: uint32, hi: uint8), 5 bytes/entry.

Summation trick: the key rows are summed as three uint32 part-sums
(low 16 bits, high 16 bits of lo, and hi) — with N*digitCount <= 2^16 rows the
part-sums cannot overflow, so no per-row carry handling is needed; the parts
are recombined into a 64-bit pair once at the end.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from . import modmath64 as mm64

_M16 = np.uint32(0xFFFF)


@functools.lru_cache(maxsize=None)
def build_mkm_switch64(N: int, Q: int, q_ks: int, base_ks: int, digit_count: int,
                       n: int, fmod: int, n_chunk: int = 64):
    """Jitted (a_lo, a_hi [B,N], b_lo, b_hi [B], ksk_a_lo [R,n] u32,
    ksk_a_hi [R,n] u8, ksk_b_lo [R] u32, ksk_b_hi [R] u8) -> (a [B,n] u32,
    b [B] u32) mod fmod, with R = N*baseKS*digitCount."""
    assert q_ks & (q_ks - 1) == 0, "64-bit key switch requires power-of-two qKS"
    assert base_ks & (base_ks - 1) == 0, "64-bit key switch requires power-of-two baseKS"
    assert fmod < (1 << 32)
    assert N % n_chunk == 0
    assert N * digit_count <= (1 << 16), "part-sum trick bound"
    ks_bits = q_ks.bit_length() - 1
    b_bits = base_ks.bit_length() - 1
    hi_bits = ks_bits - 32
    assert 0 < hi_bits <= 8
    hi_mask = np.uint32((1 << hi_bits) - 1)

    def digit(a_pair, j):
        """j-th base-2^b_bits digit of a 64-bit pair (values < 2^ks_bits)."""
        sh = j * b_bits
        if sh + b_bits <= 32:
            v = a_pair[0] >> np.uint32(sh)
        elif sh >= 32:
            v = a_pair[1] >> np.uint32(sh - 32)
        else:
            v = (a_pair[0] >> np.uint32(sh)) | (a_pair[1] << np.uint32(32 - sh))
        return (v & np.uint32(base_ks - 1)).astype(jnp.int32)

    def parts_to_pair(s0, s1, s2):
        """s0 + (s1 << 16) + (s2 << 32) as a 64-bit pair."""
        p = (s0, jnp.zeros_like(s0))
        p = mm64.add64(p, (s1 << np.uint32(16), s1 >> np.uint32(16)))
        return mm64.add64(p, (jnp.zeros_like(s2), s2))

    @jax.jit
    def mkm(a_lo, a_hi, b_lo, b_hi, ksk_a_lo, ksk_a_hi, ksk_b_lo, ksk_b_hi):
        B = a_lo.shape[0]
        a1 = mm64.round_q_Q64((a_lo, a_hi), q_ks, Q)                  # pair [B, N]
        b1 = mm64.round_q_Q64((b_lo, b_hi), q_ks, Q)                  # pair [B]

        zero_a = jnp.zeros((B, n), dtype=jnp.uint32)
        zero_b = jnp.zeros((B,), dtype=jnp.uint32)
        num_chunks = N // n_chunk
        base_i = jnp.arange(n_chunk, dtype=jnp.int32)

        def chunk_body(ci, carry):
            (a0s, a1s, a2s, b0s, b1s, b2s) = carry
            start = ci * n_chunk
            ai = (jax.lax.dynamic_slice_in_dim(a1[0], start, n_chunk, axis=1),
                  jax.lax.dynamic_slice_in_dim(a1[1], start, n_chunk, axis=1))
            i_idx = start + base_i
            for j in range(digit_count):
                d = digit(ai, j)                                      # [B, C]
                flat = (i_idx[None, :] * base_ks + d) * digit_count + j
                rows_lo = jnp.take(ksk_a_lo, flat, axis=0)            # [B, C, n]
                rows_hi = jnp.take(ksk_a_hi, flat, axis=0).astype(jnp.uint32)
                a0s = a0s + jnp.sum(rows_lo & _M16, axis=1, dtype=jnp.uint32)
                a1s = a1s + jnp.sum(rows_lo >> np.uint32(16), axis=1, dtype=jnp.uint32)
                a2s = a2s + jnp.sum(rows_hi, axis=1, dtype=jnp.uint32)
                rb_lo = jnp.take(ksk_b_lo, flat, axis=0)              # [B, C]
                rb_hi = jnp.take(ksk_b_hi, flat, axis=0).astype(jnp.uint32)
                b0s = b0s + jnp.sum(rb_lo & _M16, axis=1, dtype=jnp.uint32)
                b1s = b1s + jnp.sum(rb_lo >> np.uint32(16), axis=1, dtype=jnp.uint32)
                b2s = b2s + jnp.sum(rb_hi, axis=1, dtype=jnp.uint32)
            return (a0s, a1s, a2s, b0s, b1s, b2s)

        init = (zero_a, zero_a, zero_a, zero_b, zero_b, zero_b)
        (a0s, a1s, a2s, b0s, b1s, b2s) = jax.lax.fori_loop(0, num_chunks, chunk_body, init)

        acc_a = parts_to_pair(a0s, a1s, a2s)
        acc_b = parts_to_pair(b0s, b1s, b2s)

        def sub_mod_qks(pos, acc):
            """(pos - acc) mod 2^ks_bits (wrapping pair subtract + mask)."""
            d = mm64.sub64(pos, acc)
            return (d[0], d[1] & hi_mask)

        a2 = sub_mod_qks((jnp.zeros((B, n), jnp.uint32), jnp.zeros((B, n), jnp.uint32)), acc_a)
        b2 = sub_mod_qks(b1, acc_b)

        a3 = mm64.round_q_Q64(a2, fmod, q_ks)
        b3 = mm64.round_q_Q64(b2, fmod, q_ks)
        return a3[0], b3[0]

    return mkm
