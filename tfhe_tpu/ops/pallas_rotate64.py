"""Fused Pallas TPU kernel for the two-limb (54-bit prime) CGGI blind rotation.

Same structure as ops/pallas_rotate.py (accumulator tile resident in VMEM for
all n rounds, per-round key slice streamed by the Pallas pipeline,
permutation-free DIF/DIT NTT, batch in the sublane dim) with every modular
primitive in (lo, hi) uint32 pair arithmetic (ops/modmath64 semantics) for
ring primes up to 2^62 — covering the accelerated functional-bootstrapping
parameter sets (logQ 12..29, Q' ~ 2^54; binfhecontext.cpp:70,95).

Bandwidth trick: the streamed key stores ONLY the Shoup companions
b' = floor(b*2^64/Q). The raw key values are reconstructed exactly once per
(round, batch-tile) from b*2^64 = b'*Q + (Q - rho):

    b = hi64(b'*Q) + (lo64(b'*Q) != 0)

which halves the HBM traffic of the dominant key stream at the cost of one
128-bit multiply per key element per tile (amortized over the whole tile).

Exact mod-Q arithmetic throughout; bit-identical to ops/blindrotate64.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import modmath64 as mm64
from .modmath32 import mulhi32
from .ntt_sched import schedule
from .pallas_rotate import _interpret_mode

_Z = np.uint32(0)


def _addc(a, b):
    s = a + b
    return s, (s < a).astype(jnp.uint32)


def _add64(a, b):
    lo, c = _addc(a[0], b[0])
    return lo, a[1] + b[1] + c


def _sub64(a, b):
    lo = a[0] - b[0]
    borrow = (a[0] < b[0]).astype(jnp.uint32)
    return lo, a[1] - b[1] - borrow


def _geq(a, b):
    return (a[1] > b[1]) | ((a[1] == b[1]) & (a[0] >= b[0]))


def _sel(c, a, b):
    return jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1])


def _cpair(v: int):
    return np.uint32(v & 0xFFFFFFFF), np.uint32((v >> 32) & 0xFFFFFFFF)


def _mul64_full(a, b):
    """Full 128-bit product of pairs -> 4 uint32 limbs."""
    ll_lo, ll_hi = a[0] * b[0], mulhi32(a[0], b[0])
    lh_lo, lh_hi = a[0] * b[1], mulhi32(a[0], b[1])
    hl_lo, hl_hi = a[1] * b[0], mulhi32(a[1], b[0])
    hh_lo, hh_hi = a[1] * b[1], mulhi32(a[1], b[1])
    p0 = ll_lo
    s1, c1 = _addc(ll_hi, lh_lo)
    p1, c2 = _addc(s1, hl_lo)
    s2, c3 = _addc(lh_hi, hl_hi)
    s2b, c4 = _addc(s2, hh_lo)
    p2, c5 = _addc(s2b, c1 + c2)
    p3 = hh_hi + c3 + c4 + c5
    return p0, p1, p2, p3


def _mul64_lo(a, b):
    lo, hi = a[0] * b[0], mulhi32(a[0], b[0])
    return lo, hi + a[0] * b[1] + a[1] * b[0]


def _mul64_hi(a, b):
    p0, p1, p2, p3 = _mul64_full(a, b)
    del p0, p1
    return p2, p3


def _mulmod_shoup64_lazy(a, b, b_sh, Q: int):
    """a*b mod Q + {0, Q} for ANY 64-bit pair a; b < Q with Shoup pair b_sh."""
    q_hat = _mul64_hi(a, b_sh)
    r = _sub64(_mul64_lo(a, b), _mul64_lo(q_hat, _cpair(Q)))
    return r  # in [0, 2Q)


def _csub(x, c: int):
    cp = _cpair(c)
    over = _geq(x, cp)
    red = _sub64(x, cp)
    return _sel(over, red, x)


@functools.lru_cache(maxsize=None)
def build_pallas_rotate64(N: int, Q: int, base_g: int, digits_g_eff: int,
                          throw: int, n: int, BT: int = 128, bt: int = 8):
    """Returns fn(acc_lo, acc_hi [B,2,N] u32, a_idx [B,n] i32, bsk_sh) ->
    (acc_lo, acc_hi).

    bsk_sh: [n, 8*d2, N] uint32 — Shoup companions only; limb-lo rows
    [0, 4*d2) ordered ((key*2 + out)*d2 + digit_row), limb-hi rows offset by
    4*d2; DIF bit-reversed evaluation order. See pack_bsk64()."""
    assert Q < (1 << 62)
    d2 = 2 * digits_g_eff
    assert (2 * Q) * d2 < (1 << 62), "lazy external product bound"
    logn = N.bit_length() - 1
    g_bits = base_g.bit_length() - 1
    g_mask = np.uint32(base_g - 1)
    g_half = np.int32(base_g >> 1)
    hq = _cpair(Q >> 1)
    qp = _cpair(Q)
    two_n_mask = np.int32(2 * N - 1)
    # Barrett constant for x < 2^62 -> x mod Q
    s_bits = Q.bit_length() - 1
    M = ((1 << (64 + s_bits)) // Q)
    assert M < (1 << 64)
    Mp = _cpair(M)

    sch = schedule(N, Q)
    fwd_tab = np.concatenate([sch["twist"][None], sch["fwd_w"]], axis=0)
    inv_tab = np.concatenate([sch["inv_w"], sch["untwist"][None]], axis=0)

    def pack_tab(tab):
        t = np.asarray(tab, dtype=np.uint64)
        sh_lo, sh_hi = mm64.shoup64(t, Q)
        return np.ascontiguousarray(np.stack(
            [(t & np.uint64(0xFFFFFFFF)).astype(np.uint32),
             (t >> np.uint64(32)).astype(np.uint32), sh_lo, sh_hi]))

    twf = pack_tab(fwd_tab)          # [4, logn+1, N]
    twi = pack_tab(inv_tab)

    def _mod_u64(x):
        """x mod Q for pair x < 2^62 (Barrett, two corrections)."""
        t = _mul64_hi(x, Mp)
        # t >>= s_bits (s_bits >= 32 for 54-bit primes; handle both)
        if s_bits >= 32:
            t = (t[1] >> np.uint32(s_bits - 32), jnp.zeros_like(t[1]))
        else:
            t = ((t[0] >> np.uint32(s_bits)) | (t[1] << np.uint32(32 - s_bits)),
                 t[1] >> np.uint32(s_bits))
        r = _sub64(x, _mul64_lo(t, qp))
        return _csub(_csub(r, Q), Q)

    def make_kernel(bT: int, bti: int):
        def kernel(ai_lo, ai_hi, a_ref, bsk, twf_ref, twi_ref,
                   ao_lo, ao_hi):
            r = pl.program_id(1)

            @pl.when(r == 0)
            def _():
                ao_lo[:] = ai_lo[:]
                ao_hi[:] = ai_hi[:]

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
            odd = [((lane >> k) & 1) == 1 for k in range(logn)]

            def tab(ref, k):
                return (ref[0, k:k + 1].reshape(1, 1, N),
                        ref[1, k:k + 1].reshape(1, 1, N))

            def tab_sh(ref, k):
                return (ref[2, k:k + 1].reshape(1, 1, N),
                        ref[3, k:k + 1].reshape(1, 1, N))

            # reconstruct key values from Shoup companions, once per
            # (round, tile): b = hi64(b'*Q) + (lo64(b'*Q) != 0)
            sh_lo = bsk[0, 0:4 * d2]                        # [4*d2, N]
            sh_hi = bsk[0, 4 * d2:8 * d2]
            shp = (sh_lo, sh_hi)
            v = _mul64_hi(shp, qp)
            nz = ((_mul64_lo(shp, qp)[0] != _Z) |
                  (_mul64_lo(shp, qp)[1] != _Z)).astype(jnp.uint32)
            ek_lo, c = _addc(v[0], nz)
            ek_hi = v[1] + c                                 # [4*d2, N] pair

            def roll_p(x, s):
                return (jnp.concatenate([x[0][..., N - s:], x[0][..., :N - s]], -1),
                        jnp.concatenate([x[1][..., N - s:], x[1][..., :N - s]], -1)) \
                    if s % N else x

            def fwd_ntt(x):
                """Canonical pair [P,bt,N] -> lazy (<2Q) bitrev eval order."""
                x = _mulmod_shoup64_lazy(x, tab(twf_ref, 0), tab_sh(twf_ref, 0), Q)
                for k in range(logn):
                    h = N >> (k + 1)
                    m = logn - 1 - k
                    w, wsh = tab(twf_ref, k + 1), tab_sh(twf_ref, k + 1)
                    d = _sub64(_add64(roll_p(x, h), _cpair(2 * Q)), x)
                    t = _mulmod_shoup64_lazy(d, w, wsh, Q)
                    s = _csub(_add64(x, roll_p(x, -h % N)), 2 * Q)
                    x = _sel(odd[m], t, s)
                return x

            def inv_ntt(x):
                """Canonical pair [P,bt,N] bitrev order -> canonical."""
                for k in range(logn):
                    h = 1 << k
                    w, wsh = tab(twi_ref, k), tab_sh(twi_ref, k)
                    t = _mulmod_shoup64_lazy(x, w, wsh, Q)
                    y = _sel(odd[k],
                             _sub64(_add64(roll_p(x, h), _cpair(2 * Q)), t),
                             _add64(x, roll_p(t, -h % N)))
                    x = _csub(y, 2 * Q)
                x = _mulmod_shoup64_lazy(x, tab(twi_ref, logn), tab_sh(twi_ref, logn), Q)
                return _csub(x, Q)

            def neg_p(x):
                is_zero = (x[0] == _Z) & (x[1] == _Z)
                r_ = _sub64(qp, x)
                return _sel(is_zero, (x[0], x[1]), r_)

            def neg_wrap(x, s: int):
                w0 = neg_p((x[0][..., N - s:], x[1][..., N - s:]))
                return (jnp.concatenate([w0[0], x[0][..., :N - s]], -1),
                        jnp.concatenate([w0[1], x[1][..., :N - s]], -1))

            def rot_sub(c, idx):
                out = c
                for k in range(logn):
                    bit = ((idx >> k) & 1) == 1
                    out = _sel(bit, neg_wrap(out, 1 << k), out)
                bit_n = ((idx >> logn) & 1) == 1
                out = _sel(bit_n, neg_p(out), out)
                # submod64(out, c)
                t = _sub64(_add64(out, qp), c)
                return _csub(t, Q)

            def addmod_p(a, b):
                return _csub(_add64(a, b), Q)

            def sra64(d, g: int):
                lo = (d[0] >> np.uint32(g)) | (d[1] << np.uint32(32 - g))
                hi = (d[1].astype(jnp.int32) >> g).astype(jnp.uint32)
                return lo, hi

            def sub_body(sidx, carry):
                off = pl.multiple_of(sidx * bti, bti)
                a_sub = (ao_lo[:, pl.ds(off, bti)], ao_hi[:, pl.ds(off, bti)])
                is_neg = _geq(a_sub, hq)
                wrapped = _sub64(a_sub, qp)
                d = _sel(is_neg, wrapped, a_sub)        # two's complement pair

                def extract(d):
                    rr = (d[0] & g_mask).astype(jnp.int32)
                    rr = jnp.where(rr >= g_half, rr - np.int32(base_g), rr)
                    rp = (rr.astype(jnp.uint32), (rr >> 31).astype(jnp.uint32))
                    return rr, sra64(_sub64(d, rp), g_bits)

                for _ in range(throw):
                    _, d = extract(d)

                u = None                                # pair [4,bt,N], lazy sums
                for l in range(digits_g_eff):
                    rr, d = extract(d)
                    neg = rr < 0
                    minus = _sub64(qp, ((-rr).astype(jnp.uint32),
                                        jnp.zeros_like(rr, dtype=jnp.uint32)))
                    dl = _sel(neg, minus,
                              (rr.astype(jnp.uint32),
                               jnp.zeros_like(rr, dtype=jnp.uint32)))
                    xh = fwd_ntt(dl)                    # pair [2,bt,N] lazy
                    terms = []
                    for k2 in range(2):
                        for o in range(2):
                            acc_t = None
                            for j in range(2):
                                row = (k2 * 2 + o) * d2 + 2 * l + j
                                ekv = (ek_lo[row:row + 1].reshape(1, 1, N),
                                       ek_hi[row:row + 1].reshape(1, 1, N))
                                eks = (sh_lo[row:row + 1].reshape(1, 1, N),
                                       sh_hi[row:row + 1].reshape(1, 1, N))
                                xj = (xh[0][j:j + 1], xh[1][j:j + 1])
                                p = _mulmod_shoup64_lazy(xj, ekv, eks, Q)
                                acc_t = p if acc_t is None else _add64(acc_t, p)
                            terms.append(acc_t)
                    t4 = (jnp.concatenate([t[0] for t in terms], axis=0),
                          jnp.concatenate([t[1] for t in terms], axis=0))
                    u = t4 if u is None else _add64(u, t4)

                c = inv_ntt(_mod_u64(u))                # pair [4,bt,N] canonical
                idx_pos = a_ref[:, pl.ds(off, bti)]     # [1,bt,1]
                idx_neg = (np.int32(2 * N) - idx_pos) & two_n_mask
                upd = addmod_p(
                    rot_sub((c[0][0:2], c[1][0:2]), idx_pos),
                    rot_sub((c[0][2:4], c[1][2:4]), idx_neg))
                new = addmod_p(a_sub, upd)
                ao_lo[:, pl.ds(off, bti)] = new[0]
                ao_hi[:, pl.ds(off, bti)] = new[1]
                return carry

            jax.lax.fori_loop(0, bT // bti, sub_body, 0)

        return kernel

    def rotate(acc_lo, acc_hi, a_idx, bsk_sh):
        B = acc_lo.shape[0]
        bT = min(BT, B)
        bti = min(bt, bT)
        assert B % bT == 0 and bT % bti == 0
        al = jnp.transpose(acc_lo, (1, 0, 2))
        ah = jnp.transpose(acc_hi, (1, 0, 2))
        a_t = a_idx.T.reshape(n, B, 1)
        acc_spec = pl.BlockSpec((2, bT, N), lambda i, r: (0, i, 0),
                                memory_space=pltpu.VMEM)
        tab_spec = pl.BlockSpec((4, logn + 1, N), lambda i, r: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            make_kernel(bT, bti),
            grid=(B // bT, n),
            in_specs=[
                acc_spec, acc_spec,
                pl.BlockSpec((1, bT, 1), lambda i, r: (r, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8 * d2, N), lambda i, r: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                tab_spec, tab_spec,
            ],
            out_specs=(acc_spec, acc_spec),
            out_shape=(jax.ShapeDtypeStruct((2, B, N), jnp.uint32),
                       jax.ShapeDtypeStruct((2, B, N), jnp.uint32)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=_interpret_mode(),
        )(al, ah, a_t, bsk_sh, twf, twi)
        return (jnp.transpose(out[0], (1, 0, 2)),
                jnp.transpose(out[1], (1, 0, 2)))

    return jax.jit(rotate)


def pack_bsk64(bsk_hat: np.ndarray, Q: int) -> np.ndarray:
    """Canonical eval-domain BSkey [n, 2(key), d2, 2(out), N] uint64 ->
    [n, 8*d2, N] uint32 of Shoup companions only (lo rows then hi rows),
    row ((key*2 + out)*d2 + digit_row) within each limb half, DIF bit-reversed
    evaluation order."""
    n, _, d2, _, N = bsk_hat.shape
    br = schedule(N, Q)["bitrev"]
    b = np.asarray(bsk_hat, dtype=np.uint64)[..., br]
    b = np.swapaxes(b, 2, 3)                    # [n, key, out, d2, N]
    sh_lo, sh_hi = mm64.shoup64(b, Q)
    pair = np.stack([sh_lo, sh_hi], axis=1)     # [n, 2, key, out, d2, N]
    return np.ascontiguousarray(pair.reshape(n, 8 * d2, N))
