"""Fused Pallas TPU kernel for the batched CGGI blind rotation.

This is the TPU-native answer to the reference's `bootstrappingSingleBlock`
CUDA kernel (bootstrapping.cu:403-687): one fused kernel runs all n rounds of
digit-decompose -> forward NTT -> keyed external product -> inverse NTT ->
(X^a - 1) monomial -> accumulate, with

- the accumulator batch tile resident in VMEM for the *entire* rotation
  (grid = (batch_tiles, rounds); the output block index depends only on the
  batch tile, so Pallas keeps it on-chip across the inner rounds dimension),
- the per-round RGSW key slice streamed HBM -> VMEM by the Pallas pipeline
  (auto double-buffered), the analogue of the reference's per-round key loads,
- a permutation-free DIF/DIT NTT (ntt_sched.py): no gathers anywhere, every
  stage is roll + Shoup multiply + select on full lanes,
- Harvey-style lazy reduction: values ride in [0, 2Q) through the butterfly
  stages and the external-product accumulation sums all digitsG2 lazy
  products in plain uint32 (exact while digitsG2 * 2Q <= 2^32), with one
  Barrett reduction before the inverse NTT.

Layout note: inside the kernel every tensor is [poly, batch, N] — batch rides
the *sublane* dimension so the per-ciphertext monomial-exponent bits load as
(1, bt, 1) and broadcast without cross-dimension relayouts (Mosaic cannot
transpose lane data into leading dims).

Everything is exact u32 arithmetic mod Q (Q < 2^28); results are bit-identical
to ops/blindrotate32.py and to the host oracle.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import modmath32 as mm
from .ntt_sched import schedule

_INTERPRET = False


def _interpret_mode() -> bool:
    return _INTERPRET or jax.default_backend() == "cpu"


def _roll(x, s: int, N: int):
    """np.roll(x, s) along the last axis, static shift."""
    s %= N
    if s == 0:
        return x
    return jnp.concatenate([x[..., N - s:], x[..., :N - s]], axis=-1)


def _mulmod_lazy(a, b, b_sh, Q: int):
    """a*b mod Q + {0, Q}: Shoup multiply without the final correction.
    Exact for ANY uint32 a (the quotient estimate is off by at most 1)."""
    t = mm.mulhi32(a, b_sh)
    return a * b - t * np.uint32(Q)


def _mulhi_presplit(a, b_lo, b_hi):
    """High 32 bits of a * (b_hi<<16 | b_lo) with the b halves PRE-SPLIT —
    two fewer VPU ops per multiply than mm.mulhi32, which matters when the
    multiplicand is a precomputed table row (the NTT twiddles): the split
    moves to pack time."""
    a_lo = a & np.uint32(0xFFFF)
    a_hi = a >> np.uint32(16)
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    t = (ll >> np.uint32(16)) + (lh & np.uint32(0xFFFF)) + (hl & np.uint32(0xFFFF))
    return a_hi * b_hi + (lh >> np.uint32(16)) + (hl >> np.uint32(16)) + \
        (t >> np.uint32(16))


def _mulmod_lazy_tab(a, b, b_sh_lo, b_sh_hi, Q: int):
    """_mulmod_lazy with the Shoup companion pre-split into 16-bit halves."""
    t = _mulhi_presplit(a, b_sh_lo, b_sh_hi)
    return a * b - t * np.uint32(Q)


def _cond_sub(x, c: int):
    cc = np.uint32(c)
    return jnp.where(x >= cc, x - cc, x)


def default_tiles() -> tuple[int, int]:
    """Kernel tiling (batch tile BT, inner sub-tile bt), overridable via
    TFHE_TPU_BT / TFHE_TPU_BTI for hardware retuning
    (scripts/tune_gate.py sweeps these on the TPU)."""
    import os

    return (int(os.environ.get("TFHE_TPU_BT", 256)),
            int(os.environ.get("TFHE_TPU_BTI", 32)))


@functools.lru_cache(maxsize=None)
def build_pallas_rotate(N: int, Q: int, base_g: int, digits_g_eff: int,
                        throw: int, n: int, BT: int = 0, bt: int = 0):
    if not BT or not bt:
        dBT, dbt = default_tiles()
        return build_pallas_rotate(N, Q, base_g, digits_g_eff, throw, n,
                                   BT or dBT, bt or dbt)
    """Returns fn(acc [B,2,N] u32, a_idx [B,n] i32, bsk_pack) -> acc [B,2,N].

    bsk_pack: [n, 8*d2, N] uint32 — per round, row ((vs*2 + key)*2 + out)*d2
    + digit_row, vs = 0 value / 1 Shoup companion, digit_row = 2*digit +
    in_poly so each (key, out, digit) row pair is contiguous; evaluation
    domain in the kernel's bit-reversed (DIF) order — see pack_bsk().
    """
    assert Q < (1 << 28), "single-limb Pallas path requires Q < 2^28"
    d2 = 2 * digits_g_eff
    assert (2 * Q - 1) * d2 < (1 << 32), "lazy external product would overflow"
    logn = N.bit_length() - 1
    g_bits = base_g.bit_length() - 1
    g_mask = np.int32(base_g - 1)
    g_half = np.int32(base_g >> 1)
    half_q = np.uint32(Q >> 1)
    two_n_mask = np.int32(2 * N - 1)

    sch = schedule(N, Q)

    def u32(x):
        return np.ascontiguousarray(np.asarray(x, dtype=np.uint64).astype(np.uint32))

    # row 0 = twist, rows 1..logn = DIF stages (half = N/2 .. 1)
    fwd_tab = np.concatenate([sch["twist"][None], sch["fwd_w"]], axis=0)
    # rows 0..logn-1 = DIT stages (half = 1 .. N/2), row logn = untwist (1/N in)
    inv_tab = np.concatenate([sch["inv_w"], sch["untwist"][None]], axis=0)
    twf, twf_sh = u32(fwd_tab), mm.shoup(fwd_tab, Q)
    twi, twi_sh = u32(inv_tab), mm.shoup(inv_tab, Q)
    # Shoup companions pre-split into 16-bit halves (see _mulhi_presplit)
    twf_lo, twf_hi = twf_sh & np.uint32(0xFFFF), twf_sh >> np.uint32(16)
    twi_lo, twi_hi = twi_sh & np.uint32(0xFFFF), twi_sh >> np.uint32(16)

    def make_kernel(bT: int, bti: int):
        def kernel(acc_in, a_ref, bsk, twf_ref, twf_lo_ref, twf_hi_ref,
                   twi_ref, twi_lo_ref, twi_hi_ref, acc_out):
            r = pl.program_id(1)

            @pl.when(r == 0)
            def _():
                acc_out[:] = acc_in[:]

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
            odd = [((lane >> k) & 1) == 1 for k in range(logn)]

            def tab(ref, k):
                return ref[k:k + 1].reshape(1, 1, N)

            def fwd_ntt(x):
                """Canonical [P,bt,N] -> lazy (< 2Q) bit-reversed eval order."""
                x = _mulmod_lazy_tab(x, tab(twf_ref, 0), tab(twf_lo_ref, 0),
                                     tab(twf_hi_ref, 0), Q)
                for k in range(logn):
                    h = N >> (k + 1)
                    m = logn - 1 - k   # odd-half lanes have bit m of p set
                    w = tab(twf_ref, k + 1)
                    wlo, whi = tab(twf_lo_ref, k + 1), tab(twf_hi_ref, k + 1)
                    d = _roll(x, h, N) + np.uint32(2 * Q) - x
                    t = _mulmod_lazy_tab(d, w, wlo, whi, Q)
                    s = _cond_sub(x + _roll(x, -h, N), 2 * Q)
                    x = jnp.where(odd[m], t, s)
                return x

            def inv_ntt(x):
                """Canonical [P,bt,N] bit-reversed eval order -> canonical."""
                for k in range(logn):
                    h = 1 << k
                    w = tab(twi_ref, k)
                    wlo, whi = tab(twi_lo_ref, k), tab(twi_hi_ref, k)
                    t = _mulmod_lazy_tab(x, w, wlo, whi, Q)
                    y = jnp.where(odd[k],
                                  _roll(x, h, N) + np.uint32(2 * Q) - t,
                                  x + _roll(t, -h, N))
                    x = _cond_sub(y, 2 * Q)
                x = _mulmod_lazy_tab(x, tab(twi_ref, logn), tab(twi_lo_ref, logn),
                                     tab(twi_hi_ref, logn), Q)
                return _cond_sub(x, Q)

            def neg_wrap(x, s: int):
                """X^s * x for 0 < s < N: negacyclic roll."""
                wrap = x[..., N - s:]
                wrap = jnp.where(wrap == 0, wrap, np.uint32(Q) - wrap)
                return jnp.concatenate([wrap, x[..., :N - s]], axis=-1)

            def rot_sub(c, idx):
                """(X^idx - 1) * c; c canonical [P,bt,N], idx [1,bt,1]."""
                out = c
                for k in range(logn):
                    bit = ((idx >> k) & 1) == 1
                    out = jnp.where(bit, neg_wrap(out, 1 << k), out)
                bit_n = ((idx >> logn) & 1) == 1
                out = jnp.where(
                    bit_n, jnp.where(out == 0, out, np.uint32(Q) - out), out)
                return mm.submod(out, c, Q)

            def sub_body(sidx, carry):
                off = pl.multiple_of(sidx * bti, bti)
                acc_sub = acc_out[:, pl.ds(off, bti)]            # [2,bt,N]
                d = jnp.where(acc_sub < half_q, acc_sub.astype(jnp.int32),
                              acc_sub.astype(jnp.int32) - np.int32(Q))
                for _ in range(throw):
                    rr = d & g_mask
                    rr = jnp.where(rr >= g_half, rr - np.int32(base_g), rr)
                    d = (d - rr) >> np.int32(g_bits)

                u = None                                         # [4,bt,N]
                for l in range(digits_g_eff):
                    rr = d & g_mask
                    rr = jnp.where(rr >= g_half, rr - np.int32(base_g), rr)
                    d = (d - rr) >> np.int32(g_bits)
                    dl = jnp.where(rr < 0, rr + np.int32(Q), rr).astype(jnp.uint32)
                    xh = fwd_ntt(dl)                             # [2,bt,N] lazy
                    terms = []
                    for k2 in range(2):
                        for o in range(2):
                            row_v = ((0 * 2 + k2) * 2 + o) * d2 + 2 * l
                            row_s = ((1 * 2 + k2) * 2 + o) * d2 + 2 * l
                            acc_t = None                         # [1,bt,N]
                            for j in range(2):
                                ekv = bsk[0, row_v + j:row_v + j + 1].reshape(1, 1, N)
                                eks = bsk[0, row_s + j:row_s + j + 1].reshape(1, 1, N)
                                p = _mulmod_lazy(xh[j:j + 1], ekv, eks, Q)
                                acc_t = p if acc_t is None else acc_t + p
                            terms.append(acc_t)
                    t4 = jnp.concatenate(terms, axis=0)          # [4,bt,N]
                    u = t4 if u is None else u + t4

                c = inv_ntt(mm.mod_u32(u, Q))                    # [4,bt,N]
                idx_pos = a_ref[:, pl.ds(off, bti)]              # [1,bt,1]
                idx_neg = (np.int32(2 * N) - idx_pos) & two_n_mask
                upd = mm.addmod(rot_sub(c[0:2], idx_pos),
                                rot_sub(c[2:4], idx_neg), Q)
                acc_out[:, pl.ds(off, bti)] = mm.addmod(acc_sub, upd, Q)
                return carry

            jax.lax.fori_loop(0, bT // bti, sub_body, 0)

        return kernel

    def rotate(acc, a_idx, bsk_pack):
        B = acc.shape[0]
        bT = min(BT, B)
        bti = min(bt, bT)
        assert B % bT == 0 and bT % bti == 0
        acc_t = jnp.transpose(acc, (1, 0, 2))                    # [2,B,N]
        a_t = a_idx.T.reshape(n, B, 1)
        out = pl.pallas_call(
            make_kernel(bT, bti),
            grid=(B // bT, n),
            in_specs=[
                pl.BlockSpec((2, bT, N), lambda i, r: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bT, 1), lambda i, r: (r, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8 * d2, N), lambda i, r: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                *([pl.BlockSpec((logn + 1, N), lambda i, r: (0, 0),
                                memory_space=pltpu.VMEM)] * 6),
            ],
            out_specs=pl.BlockSpec((2, bT, N), lambda i, r: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, B, N), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=_interpret_mode(),
        )(acc_t, a_t, bsk_pack, twf, twf_lo, twf_hi, twi, twi_lo, twi_hi)
        return jnp.transpose(out, (1, 0, 2))

    return jax.jit(rotate)


def pack_bsk(bsk_hat: np.ndarray, Q: int) -> np.ndarray:
    """Canonical (natural-order) eval-domain BSkey [n, 2(key), d2, 2(out), N]
    uint64 -> kernel layout [n, 8*d2, N] uint32, rows ordered
    (val/shoup, key, out, digit_row), in DIF bit-reversed evaluation order."""
    n, _, d2, _, N = bsk_hat.shape
    br = schedule(N, Q)["bitrev"]
    b = np.asarray(bsk_hat, dtype=np.uint64)[..., br]
    # [n, key, d2, out, N] -> [n, key, out, d2, N]
    b = np.swapaxes(b, 2, 3)
    pair = np.stack([b.astype(np.uint32), mm.shoup(b, Q)], axis=1)
    return np.ascontiguousarray(pair.reshape(n, 8 * d2, N))
