"""Fused modswitch -> keyswitch -> modswitch on device (uint32 path).

Device analogue of `MKMSwitchKernel` (bootstrapping.cu:73-118), which itself
fuses `LWEEncryptionScheme::{ModSwitch,KeySwitch}` (lwe-pke.cpp:204-321):
round the extracted mod-Q LWE ciphertext to qKS, subtract the base-baseKS
digit rows of the switching key, then round to the output modulus fmod.

TPU-native formulation: the key-switch "sum the (i, digit, j)-indexed rows of
the switching key" is a *selection* — each ciphertext picks exactly one of the
baseKS rows per (i, j). Row gathers from the ~0.5 GB key are HBM-bound
(N*digitCount rows/ct), so instead the selection is expressed as a one-hot
matrix multiply on the MXU:

    out[B, :] = onehot[B, N*baseKS*dc] @ K[N*baseKS*dc, L*(n+1)]

with the key split into L seven-bit limbs stored as int8 (s8 x s8 -> s32 is
MXU-native; i32 accumulation of N*dc*127 <= 2^24 terms is exact), and the
limbs recombined mod qKS with Shoup multiplications afterwards. One batch
costs 2*B*R*L*(n+1) flops of pure matmul instead of B*N*dc row gathers.

Requires Q, qKS < 2^31 (the two-limb path for qKS = 2^35 lives in
keyswitch64)."""

from __future__ import annotations

import functools

import jax
import numpy as np

import jax.numpy as jnp

from . import modmath32 as mm

_LIMB_BITS = 7


def n_limbs(q_ks: int) -> int:
    return (int(q_ks - 1).bit_length() + _LIMB_BITS - 1) // _LIMB_BITS


def pack_limbs_i8(ksk_a: np.ndarray, ksk_b: np.ndarray, L: int) -> np.ndarray:
    """(A [R, n] uint, B [R] uint) -> int8 [R, L*(n+1)] of 7-bit limbs,
    limb-major columns. Works in A's native dtype and writes each limb
    straight into the output buffer: the build host may have a single CPU
    core, where upcasting the ~10^8-entry key to u64 and concatenating
    (the obvious formulation) costs 40x the packing itself."""
    A = np.asarray(ksk_a)
    Bv = np.asarray(ksk_b, dtype=np.uint64)
    R, n = A.shape
    a_bits = A.dtype.itemsize * 8
    tt = A.dtype.type
    out = np.empty((R, L * (n + 1)), np.int8)
    for l in range(L):
        sh = _LIMB_BITS * l
        col = out[:, l * (n + 1):(l + 1) * (n + 1)]
        if sh >= a_bits:
            col[:, :n] = 0
        elif sh == 0:
            col[:, :n] = (A & tt(127)).astype(np.int8)
        else:
            col[:, :n] = ((A >> tt(sh)) & tt(127)).astype(np.int8)
        col[:, n] = ((Bv >> np.uint64(sh)) & np.uint64(127)).astype(np.int8)
    return out


def pack_ksk(ksk_a: np.ndarray, ksk_b: np.ndarray, q_ks: int) -> np.ndarray:
    """Flat switching key (A [R, n], B [R], row = (i*baseKS+v)*dc+j)
    -> int8 [R, L*(n+1)] of 7-bit limbs, limb-major columns (s8 x s8 -> s32
    is MXU-native and exact; 1 byte per limb halves the resident key table
    vs the earlier bf16 packing)."""
    return pack_limbs_i8(ksk_a, np.asarray(ksk_b).reshape(-1), n_limbs(q_ks))


def _keyswitch_core(N: int, q_ks: int, base_ks: int, digit_count: int,
                    n: int, fmod: int):
    """The shared u32 keyswitch + final modswitch body: takes the already
    mod-switched (a1 [B,N], b1 [B]) residues mod qKS < 2^31."""
    L = n_limbs(q_ks)
    assert N * digit_count * 127 < (1 << 24), "i32 accumulation bound exceeded"
    # limb weights 2^(7l) mod qKS with Shoup companions
    w = np.array([pow(2, _LIMB_BITS * l, q_ks) for l in range(L)], dtype=np.uint64)
    w_sh = mm.shoup(w, q_ks)
    w = w.astype(np.uint32)
    pow2 = base_ks & (base_ks - 1) == 0
    ks_bits = base_ks.bit_length() - 1

    def core(a1, b1, ksk_bf):
        B = a1.shape[0]
        # base-baseKS digits, [B, N, dc]
        digs = []
        atmp = a1
        for _ in range(digit_count):
            if pow2:
                digs.append(atmp & np.uint32(base_ks - 1))
                atmp = atmp >> np.uint32(ks_bits)
            else:
                digs.append(atmp % np.uint32(base_ks))
                atmp = atmp // np.uint32(base_ks)
        # digits fit u8 whenever baseKS <= 256 (every parameter set): the
        # [B, N, dc] stack is 1/4 the u32 footprint — at batch 16384 and
        # production N this array alone was ~1 GB and OOMed the 16 GB HBM
        ddt = jnp.uint8 if base_ks <= 256 else jnp.uint32
        d = jnp.stack(digs, axis=-1).astype(ddt)              # [B, N, dc]

        # one-hot over the row index (i, v, j) and one MXU matmul per batch
        # chunk (the transient one-hot is B*N*baseKS*dc int8 — chunking keeps
        # the peak modest so 16k batches fit in HBM). Power-of-two chunks
        # divide every (bucketed) batch exactly — no padded copy of d.
        v_iota = jax.lax.broadcasted_iota(ddt, (1, 1, base_ks, 1), 2)
        row_bytes = N * base_ks * digit_count
        # 1 GB one-hot cap (the u32 sets' keys are small; only the 64-bit
        # accelerated tail needs the tighter 2^29 cap for batch-16k HBM)
        cap = max(256, min(B, (1 << 30) // row_bytes))
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
        sums = sums.astype(jnp.uint32).reshape(B, L, n + 1)   # exact integers

        # recombine limbs mod qKS (lazy Shoup, single Barrett reduce)
        acc = mm.mulmod_shoup(sums[:, 0], w[0], w_sh[0], q_ks)
        for l in range(1, L):
            t = mm.mulhi32(sums[:, l], w_sh[l])
            acc = acc + sums[:, l] * w[l] - t * np.uint32(q_ks)
        acc = mm.mod_u32(acc, q_ks)                           # [B, n+1]

        a2 = mm.submod(jnp.zeros((B, n), dtype=jnp.uint32), acc[:, :n], q_ks)
        b2 = mm.submod(b1, acc[:, n], q_ks)

        # ModSwitch qKS -> fmod
        return mm.round_q_Q(a2, fmod, q_ks), mm.round_q_Q(b2, fmod, q_ks)

    return core


@functools.lru_cache(maxsize=None)
def build_mkm_switch(N: int, Q: int, q_ks: int, base_ks: int, digit_count: int,
                     n: int, fmod: int):
    """Returns a jitted (a_ext [B,N] u32, b_ext [B] u32,
    ksk_bf [N*baseKS*dc, L*(n+1)] int8) -> (a [B,n] u32, b [B] u32) mod fmod."""
    core = _keyswitch_core(N, q_ks, base_ks, digit_count, n, fmod)

    @jax.jit
    def mkm(a_ext, b_ext, ksk_bf):
        # ModSwitch Q -> qKS (exact RoundqQ)
        a1 = mm.round_q_Q(a_ext, q_ks, Q)                     # [B, N]
        b1 = mm.round_q_Q(b_ext, q_ks, Q)                     # [B]
        return core(a1, b1, ksk_bf)

    return mkm


@functools.lru_cache(maxsize=None)
def build_mkm_switch_from64(N: int, Q: int, q_ks: int, base_ks: int,
                            digit_count: int, n: int, fmod: int):
    """MKM switch for the big-Q classic sets (STD192/STD128Q/STD192Q...):
    ring modulus Q in [2^31, 2^62) arrives as uint32 pairs, qKS < 2^31 so the
    key switch itself runs single-limb u32 after one exact pair RoundqQ.
    The reference runs these sets through the same MKMSwitchKernel with its
    int64 modulus branch (bootstrapping.cu:147, 73-118)."""
    from . import modmath64 as mm64

    assert q_ks < (1 << 31)
    core = _keyswitch_core(N, q_ks, base_ks, digit_count, n, fmod)

    @jax.jit
    def mkm(a_lo, a_hi, b_lo, b_hi, ksk_bf):
        a1 = mm64.round_q_Q64((a_lo, a_hi), q_ks, Q)[0]       # hi limb is 0
        b1 = mm64.round_q_Q64((b_lo, b_hi), q_ks, Q)[0]
        return core(a1, b1, ksk_bf)

    return mkm
