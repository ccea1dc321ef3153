"""Batched CGGI blind rotation for 54-bit ring primes (two-limb uint32 pairs).

Mirrors ops/blindrotate32 with every modular primitive replaced by the 64-bit
pair arithmetic in ops/modmath64. Covers the accelerated parameter sets
(logQ >= 12, Q' ~ 2^54; binfhecontext.cpp:70,95), including approximate gadget
decomposition (num_digits_to_throw, rgsw-acc.cpp:86-89).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from . import modmath64 as mm64
from .ntt64 import NTT64

_M32 = np.uint32(0xFFFFFFFF)


def _shift_right_arith64(d, g: int):
    """Arithmetic >> g for two's-complement pairs, 1 <= g <= 31."""
    lo = (d[0] >> np.uint32(g)) | (d[1] << np.uint32(32 - g))
    hi = (d[1].astype(jnp.int32) >> g).astype(jnp.uint32)
    return lo, hi


def _decompose64(acc, Q: int, base_g: int, digits_g: int, throw: int):
    """Signed digit decomposition on pairs (rgsw-acc.cpp:57-111).

    acc: pair of [B, 2, N] -> pair of [B, 2*digits_g, N] digit residues mod Q.
    Digits are < baseG <= 2^27, so each digit fits one uint32 lane, but the
    residue form (r or r + Q) needs both limbs."""
    half_q = Q >> 1
    qp = (np.uint32(Q & 0xFFFFFFFF), np.uint32(Q >> 32))
    hq = (np.uint32(half_q & 0xFFFFFFFF), np.uint32(half_q >> 32))
    # d = acc < Q/2 ? acc : acc - Q  (two's complement pair; rgsw-acc.cpp:83)
    is_neg = mm64._geq(acc, hq)
    wrapped = mm64.sub64(acc, qp)
    d = (jnp.where(is_neg, wrapped[0], acc[0]), jnp.where(is_neg, wrapped[1], acc[1]))

    g_bits = base_g.bit_length() - 1
    mask = np.uint32(base_g - 1)
    half = np.int32(base_g >> 1)

    def extract(d):
        r = (d[0] & mask).astype(jnp.int32)
        r = jnp.where(r >= half, r - np.int32(base_g), r)      # signed digit
        r_pair = (r.astype(jnp.uint32), (r >> 31).astype(jnp.uint32))  # sign-extended
        d2 = mm64.sub64(d, r_pair)
        return r, _shift_right_arith64(d2, g_bits)

    for _ in range(throw):
        _, d = extract(d)
    rows = []
    for _ in range(digits_g):
        r, d = extract(d)
        # residue mod Q: r >= 0 -> (r, 0); r < 0 -> Q + r
        neg = r < 0
        plus = (r.astype(jnp.uint32), jnp.zeros_like(r, dtype=jnp.uint32))
        minus = mm64.sub64(qp, ((-r).astype(jnp.uint32), jnp.zeros_like(r, dtype=jnp.uint32)))
        rows.append((jnp.where(neg, minus[0], plus[0]), jnp.where(neg, minus[1], plus[1])))

    def interleave(limb_idx):
        dig = jnp.stack([rw[limb_idx] for rw in rows], axis=2)   # [B, 2, dg, N]
        B, _, dg, N = dig.shape
        return jnp.swapaxes(dig, 1, 2).reshape(B, 2 * dg, N)

    return interleave(0), interleave(1)


def _rotate_sub64(c, m, Q: int):
    """(X^m - 1) * c for per-batch exponents m in [0, 2N); c pair of [B, j, N].

    Gather-free bit-decomposed rotation (see ops/blindrotate32._rotate_sub)."""
    N = c[0].shape[-1]
    logn = N.bit_length() - 1
    bshape = (c[0].shape[0],) + (1,) * (c[0].ndim - 1)
    out = c
    for k in range(logn):
        s = 1 << k
        neg_tail = mm64.negmod64((out[0][..., N - s:], out[1][..., N - s:]), Q)
        rolled = (jnp.concatenate([neg_tail[0], out[0][..., :N - s]], axis=-1),
                  jnp.concatenate([neg_tail[1], out[1][..., :N - s]], axis=-1))
        bit = ((m >> k) & 1).astype(bool).reshape(bshape)
        out = (jnp.where(bit, rolled[0], out[0]), jnp.where(bit, rolled[1], out[1]))
    bit_n = ((m >> logn) & 1).astype(bool).reshape(bshape)
    neg = mm64.negmod64(out, Q)
    out = (jnp.where(bit_n, neg[0], out[0]), jnp.where(bit_n, neg[1], out[1]))
    return mm64.submod64(out, c, Q)


@functools.lru_cache(maxsize=None)
def build_blind_rotate64(N: int, Q: int, base_g: int, digits_g_eff: int, throw: int,
                         n: int):
    """Jitted (acc_lo, acc_hi [B,2,N], a_idx [B,n] i32, bsk_lo, bsk_hi,
    bsk_sh_lo, bsk_sh_hi [n,2,d2,2,N]) -> (acc_lo, acc_hi)."""
    ntt = NTT64(N, Q)
    two_n = np.int32(2 * N)

    def round_fn(r, state):
        (acc, a_idx, bsk, bsk_sh) = state
        dct = _decompose64(acc, Q, base_g, digits_g_eff, throw)
        dct_hat = ntt.forward(dct)                                # pair [B, d2, N]

        def pick(t):
            return jax.lax.dynamic_index_in_dim(t, r, 0, keepdims=False)

        ek = (pick(bsk[0]), pick(bsk[1]))                         # [2, d2, 2, N]
        ek_sh = (pick(bsk_sh[0]), pick(bsk_sh[1]))
        dh = (dct_hat[0][:, None, :, None, :], dct_hat[1][:, None, :, None, :])
        ekb = (ek[0][None], ek[1][None])
        ekshb = (ek_sh[0][None], ek_sh[1][None])
        prod = mm64.mulmod_shoup64(dh, ekb, ekshb, Q)             # pair [B,2,d2,2,N]
        d2 = prod[0].shape[2]
        u = (prod[0][:, :, 0], prod[1][:, :, 0])
        for l in range(1, d2):
            u = mm64.addmod64(u, (prod[0][:, :, l], prod[1][:, :, l]), Q)
        c = ntt.inverse(u)                                        # pair [B, 2, 2, N]
        idx_pos = a_idx[:, r]
        idx_neg = (two_n - idx_pos) % two_n
        upd = mm64.addmod64(
            _rotate_sub64((c[0][:, 0], c[1][:, 0]), idx_pos, Q),
            _rotate_sub64((c[0][:, 1], c[1][:, 1]), idx_neg, Q), Q)
        acc = mm64.addmod64(acc, upd, Q)
        return (acc, a_idx, bsk, bsk_sh)

    @jax.jit
    def blind_rotate(acc_lo, acc_hi, a_idx, bsk_lo, bsk_hi, bsk_sh_lo, bsk_sh_hi):
        state = ((acc_lo, acc_hi), a_idx, (bsk_lo, bsk_hi), (bsk_sh_lo, bsk_sh_hi))
        state = jax.lax.fori_loop(0, n, round_fn, state)
        return state[0]

    return blind_rotate


def transpose_extract64(acc, Q: int):
    """Transpose automorphism + constant-term extraction on pairs."""
    out = []
    for limb in (0, 1):
        a = acc[limb][:, 0, :]
        out.append(a)
    a_pair = tuple(out)
    rev = (jnp.flip(a_pair[0], axis=-1), jnp.flip(a_pair[1], axis=-1))
    neg = mm64.negmod64((rev[0][:, :-1], rev[1][:, :-1]), Q)
    a_t = (jnp.concatenate([a_pair[0][:, :1], neg[0]], axis=-1),
           jnp.concatenate([a_pair[1][:, :1], neg[1]], axis=-1))
    b = (acc[0][:, 1, 0], acc[1][:, 1, 0])
    return a_t, b
