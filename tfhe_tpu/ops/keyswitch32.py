"""Fused modswitch -> keyswitch -> modswitch on device (uint32 path).

Device analogue of `MKMSwitchKernel` (bootstrapping.cu:73-118), which itself
fuses `LWEEncryptionScheme::{ModSwitch,KeySwitch}` (lwe-pke.cpp:204-321):
round the extracted mod-Q LWE ciphertext to qKS, subtract the base-baseKS
digit rows of the switching key, then round to the output modulus fmod.
Requires Q, qKS < 2^31 (the two-limb path for qKS = 2^35 lives in
keyswitch64)."""

from __future__ import annotations

import functools

import jax
import numpy as np

import jax.numpy as jnp

from . import modmath32 as mm


@functools.lru_cache(maxsize=None)
def build_mkm_switch(N: int, Q: int, q_ks: int, base_ks: int, digit_count: int,
                     n: int, fmod: int, n_chunk: int = 64):
    """Returns a jitted (a_ext [B,N] u32, b_ext [B] u32, ksk_a [N*baseKS*dc, n],
    ksk_b [N*baseKS*dc]) -> (a [B,n] u32, b [B] u32) mod fmod."""

    assert N % n_chunk == 0

    @jax.jit
    def mkm(a_ext, b_ext, ksk_a, ksk_b):
        B = a_ext.shape[0]
        # ModSwitch Q -> qKS (exact RoundqQ)
        a1 = mm.round_q_Q(a_ext, q_ks, Q)                     # [B, N]
        b1 = mm.round_q_Q(b_ext, q_ks, Q)                     # [B]

        # KeySwitch: subtract sum over (i < N, j < digitCount) of key rows
        # indexed by the j-th base-baseKS digit of a1[:, i].
        a_acc = jnp.zeros((B, n), dtype=jnp.uint32)
        b_acc = jnp.zeros((B,), dtype=jnp.uint32)
        num_chunks = (N + n_chunk - 1) // n_chunk
        base_i = jnp.arange(n_chunk, dtype=jnp.int32)

        def chunk_body(ci, carry):
            a_acc, b_acc = carry
            start = ci * n_chunk
            ai = jax.lax.dynamic_slice_in_dim(a1, start, n_chunk, axis=1)  # [B, C]
            i_idx = (start + base_i)                                       # [C]
            atmp = ai
            pa = jnp.zeros((B, n), dtype=jnp.uint32)
            pb = jnp.zeros((B,), dtype=jnp.uint32)
            for j in range(digit_count):
                a0 = (atmp % np.uint32(base_ks)).astype(jnp.int32)        # [B, C]
                flat = (i_idx[None, :] * base_ks + a0) * digit_count + j   # [B, C]
                rows_a = jnp.take(ksk_a, flat, axis=0)                     # [B, C, n]
                rows_b = jnp.take(ksk_b, flat, axis=0)                     # [B, C]
                pa = mm.addmod(pa, mm.sum_mod(rows_a, 1, q_ks), q_ks)
                pb = mm.addmod(pb, mm.sum_mod(rows_b, 1, q_ks), q_ks)
                atmp = atmp // np.uint32(base_ks)
            return mm.addmod(a_acc, pa, q_ks), mm.addmod(b_acc, pb, q_ks)

        a_acc, b_acc = jax.lax.fori_loop(0, num_chunks, chunk_body, (a_acc, b_acc))
        a2 = mm.submod(jnp.zeros((B, n), dtype=jnp.uint32), a_acc, q_ks)
        b2 = mm.submod(b1, b_acc, q_ks)

        # ModSwitch qKS -> fmod
        return mm.round_q_Q(a2, fmod, q_ks), mm.round_q_Q(b2, fmod, q_ks)

    return mkm
