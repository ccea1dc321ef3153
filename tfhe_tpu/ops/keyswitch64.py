"""Fused modswitch -> keyswitch -> modswitch for the accelerated parameter sets
(Q ~ 2^54, qKS = 2^35) on device, in two-limb uint32 arithmetic.

Device analogue of `MKMSwitchKernel` (bootstrapping.cu:73-118) for the
configurations the reference's GPU path actually uses: qKS and baseKS are
powers of two there (qKS = 2^35, baseKS = 32; binfhecontext.cpp:99-103), which
makes digit extraction pure shifts and the final reduction a mask.

The key-switch itself uses the same one-hot MXU formulation as keyswitch32:
each ciphertext selects one of the baseKS rows per (i, j), so the row-sum is

    sums[B, :] = onehot[B, N*baseKS*dc] @ K[N*baseKS*dc, L*(n+1)]

with the 35-bit key entries split into L = 5 seven-bit limbs stored as int8
(s8 x s8 -> s32 MXU-native) and exact i32 accumulation (sums <= N*dc*127
< 2^24). The limb sums are recombined into 64-bit pairs with shifts; mod qKS
is a mask.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from . import modmath64 as mm64

_LIMB_BITS = 7
_CHUNK_BYTES = 1 << 29   # peak transient one-hot bytes per chunk


def n_limbs64(q_ks: int) -> int:
    return (int(q_ks - 1).bit_length() + _LIMB_BITS - 1) // _LIMB_BITS


def seeded_ksk_pack(ksk) -> "jax.Array":
    """Device-side pack of a SeededSwitchingKey: regenerate the A bits from
    threefry IN-GRAPH and emit the int8 limb table directly — the ~5 GB A
    block never exists on the host and never crosses the tunnel (only the
    few-MB B limbs ride up). Bit-identical to
    pack_ksk64(ksk.A.reshape(-1, n), ksk.B, q_ks)."""
    from .. import lwe as lwe_mod

    n, q_ks = ksk.n, ksk.q_ks
    R = ksk.N * ksk.base_ks * ksk.digit_count
    L = n_limbs64(q_ks)
    ks_bits = q_ks.bit_length() - 1
    b_flat = np.asarray(ksk.B, dtype=np.uint64).reshape(-1)
    b_limbs = np.stack(
        [((b_flat >> np.uint64(7 * l)) & np.uint64(127)).astype(np.int8)
         for l in range(L)], axis=1).reshape(R, L, 1)
    from .. import lwe as lwe_mod

    pack = _build_seeded_pack(n, q_ks, L, ks_bits)
    key = jax.random.PRNGKey(np.uint32(ksk.seed))
    C = lwe_mod.KSK_ROW_CHUNK
    parts = []
    for c in range((R + C - 1) // C):
        rows = min(C, R - c * C)
        bl_c = np.zeros((C, L, 1), np.int8)
        bl_c[:rows] = b_limbs[c * C:c * C + rows]
        parts.append(pack(jax.random.fold_in(key, c), jnp.asarray(bl_c)))
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    return out[:R] if out.shape[0] != R else out


@functools.lru_cache(maxsize=None)
def _build_seeded_pack(n: int, q_ks: int, L: int, ks_bits: int):
    """Per-chunk in-graph pack (KSK_ROW_CHUNK rows): full-key graphs make
    the TPU backend compiler unroll the int8 relayout over row tiles
    (compile time ~linear in rows — 457k rows never finished; one 57k-row
    chunk compiles in ~2.5 min once and persists in the compile cache)."""
    from .. import lwe as lwe_mod

    @jax.jit
    def pack(key_c, b_l):
        lo, hi = lwe_mod._seeded_ksk_bits_chunk(key_c, n, q_ks)
        R_c = lo.shape[0]
        cols = [lwe_mod._ksk_limb(lo, hi, l, ks_bits).astype(jnp.int8)
                for l in range(L)]
        limbs = jnp.stack(cols, axis=1)                      # [R_c, L, n]
        return jnp.concatenate([limbs, b_l],
                               axis=2).reshape(R_c, L * (n + 1))

    return pack


def pack_ksk64(ksk_a: np.ndarray, ksk_b: np.ndarray, q_ks: int) -> np.ndarray:
    """Flat switching key (A [R, n], B [R], uint64, row = (i*baseKS+v)*dc+j)
    -> int8 [R, L*(n+1)] of 7-bit limbs, limb-major columns (s8 x s8 -> s32
    is MXU-native and exact; halves the resident table vs bf16 — the
    accelerated-set KSK at N=2048/n=1305 drops from ~6 GB to ~3 GB, which is
    what lets the d2=6 sign pipeline run batch 16384 in 16 GB HBM)."""
    from .keyswitch32 import pack_limbs_i8

    return pack_limbs_i8(ksk_a, np.asarray(ksk_b).reshape(-1),
                         n_limbs64(q_ks))


@functools.lru_cache(maxsize=None)
def build_mkm_switch64(N: int, Q: int, q_ks: int, base_ks: int, digit_count: int,
                       n: int, fmod: int):
    """Jitted (a_lo, a_hi [B,N], b_lo, b_hi [B],
    ksk_bf [N*baseKS*dc, L*(n+1)] int8) -> (a [B,n] u32, b [B] u32) mod fmod."""
    assert q_ks & (q_ks - 1) == 0, "64-bit key switch requires power-of-two qKS"
    assert base_ks & (base_ks - 1) == 0, "64-bit key switch requires power-of-two baseKS"
    assert fmod < (1 << 32)
    assert N * digit_count * 127 < (1 << 24), "i32 accumulation bound exceeded"
    ks_bits = q_ks.bit_length() - 1
    b_bits = base_ks.bit_length() - 1
    hi_bits = ks_bits - 32
    assert 0 < hi_bits <= 31
    hi_mask = np.uint32((1 << hi_bits) - 1)
    L = n_limbs64(q_ks)

    def digit(a_pair, j):
        """j-th base-2^b_bits digit of a 64-bit pair (values < 2^ks_bits)."""
        sh = j * b_bits
        if sh + b_bits <= 32:
            v = a_pair[0] >> np.uint32(sh)
        elif sh >= 32:
            v = a_pair[1] >> np.uint32(sh - 32)
        else:
            v = (a_pair[0] >> np.uint32(sh)) | (a_pair[1] << np.uint32(32 - sh))
        return v & np.uint32(base_ks - 1)

    def shl_pair(x, s: int):
        """u32 x << s as a 64-bit pair (s < 32)."""
        if s == 0:
            return x, jnp.zeros_like(x)
        return x << np.uint32(s), x >> np.uint32(32 - s)

    @jax.jit
    def mkm(a_lo, a_hi, b_lo, b_hi, ksk_bf):
        B = a_lo.shape[0]
        a1 = mm64.round_q_Q64((a_lo, a_hi), q_ks, Q)                  # pair [B, N]
        b1 = mm64.round_q_Q64((b_lo, b_hi), q_ks, Q)                  # pair [B]

        # one-hot over (i, v, j) rows; layout matches flat = (i*baseKS+v)*dc+j
        # (chunked exactly like keyswitch32: the transient one-hot is
        # B*N*baseKS*dc int8, which at batch 4096 / STD128-accelerated params
        # would be ~2 GB — chunking keeps the peak under ~1 GB)
        # digits fit u8 (baseKS = 32 on every accelerated set): 1/4 the u32
        # stack footprint — the u32 stack was ~1 GB at batch 16384 and was
        # the OOM site of the first 16k sign attempt. Power-of-two chunks
        # divide every bucketed batch — no padded copy of d.
        ddt = jnp.uint8 if base_ks <= 256 else jnp.uint32
        d = jnp.stack([digit(a1, j) for j in range(digit_count)],
                      axis=-1).astype(ddt)
        v_iota = jax.lax.broadcasted_iota(ddt, (1, 1, base_ks, 1), 2)
        row_bytes = N * base_ks * digit_count
        cap = max(8, min(B, _CHUNK_BYTES // row_bytes))
        chunk = 1 << (cap.bit_length() - 1)

        def chunk_sums(d_c):
            oh = (d_c[:, :, None, :] == v_iota).astype(jnp.int8)
            oh = oh.reshape(d_c.shape[0], N * base_ks * digit_count)
            return jnp.dot(oh, ksk_bf, preferred_element_type=jnp.int32)

        if B <= chunk:
            sums = chunk_sums(d)
        elif B % chunk == 0:
            sums = jax.lax.map(chunk_sums,
                               d.reshape(B // chunk, chunk, N, digit_count))
            sums = sums.reshape(B, L * (n + 1))
        else:
            n_chunks = (B + chunk - 1) // chunk
            pad = n_chunks * chunk - B
            d_p = jnp.pad(d, ((0, pad), (0, 0), (0, 0)))
            sums = jax.lax.map(chunk_sums,
                               d_p.reshape(n_chunks, chunk, N, digit_count))
            sums = sums.reshape(n_chunks * chunk, L * (n + 1))[:B]
        sums = sums.astype(jnp.uint32).reshape(B, L, n + 1)           # exact

        acc = shl_pair(sums[:, 0], 0)
        for l in range(1, L):
            acc = mm64.add64(acc, shl_pair(sums[:, l], _LIMB_BITS * l))
        acc = (acc[0], acc[1] & hi_mask)                              # mod 2^ks_bits

        def sub_mod_qks(pos, neg):
            s = mm64.sub64(pos, neg)
            return (s[0], s[1] & hi_mask)

        zero = (jnp.zeros((B, n), jnp.uint32), jnp.zeros((B, n), jnp.uint32))
        a2 = sub_mod_qks(zero, (acc[0][:, :n], acc[1][:, :n]))
        b2 = sub_mod_qks(b1, (acc[0][:, n], acc[1][:, n]))

        a3 = mm64.round_q_Q64(a2, fmod, q_ks)
        b3 = mm64.round_q_Q64(b2, fmod, q_ks)
        return a3[0], b3[0]

    return mkm
