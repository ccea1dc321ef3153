"""Batched CGGI blind rotation in pure JAX (uint32 path, Q < 2^31).

Device analogue of `AddToAccCGGI` / `EvalAcc` (rgsw-acc-cggi.cpp:143-307) and
of the CUDA `bootstrappingSingleBlock` loop (bootstrapping.cu:403-687), but
exact: per round, digit-decompose the accumulator, forward-NTT the digits,
take the Shoup-preconditioned inner product with the round's RGSW key pair,
inverse-NTT, apply the (X^a - 1) monomials as negacyclic rotations in the
coefficient domain, and accumulate. The whole batch stays on device for all n
rounds (the reference pays an H2D/D2H round trip per ciphertext per launch).
"""

from __future__ import annotations

import functools

import jax
import numpy as np

import jax.numpy as jnp

from . import modmath32 as mm
from .ntt32 import NTT32


def _decompose(acc, Q: int, base_g: int, digits_g: int, throw: int):
    """Signed digit decomposition (rgsw-acc.cpp:57-111) on device.

    acc: uint32 [B, 2, N] residues mod Q -> uint32 [B, 2*digits_g, N] digit
    residues; digit l of poly j lands at row j + 2l."""
    half_q = Q >> 1
    d = jnp.where(acc < np.uint32(half_q), acc.astype(jnp.int32),
                  (acc.astype(jnp.int32) - np.int32(Q)))
    g_bits = base_g.bit_length() - 1
    mask = np.int32(base_g - 1)
    half = np.int32(base_g >> 1)

    def extract(d):
        r = d & mask
        r = jnp.where(r >= half, r - np.int32(base_g), r)
        return r, (d - r) >> g_bits

    for _ in range(throw):
        _, d = extract(d)
    rows = []
    for _ in range(digits_g):
        r, d = extract(d)
        rows.append(r)
    # rows[l] is [B, 2, N]; interleave to [B, 2*digits_g, N] with row j+2l
    dig = jnp.stack(rows, axis=2)               # [B, 2, digits_g, N]
    dig = jnp.swapaxes(dig, 1, 2).reshape(acc.shape[0], 2 * digits_g, acc.shape[2])
    return jnp.where(dig < 0, dig + np.int32(Q), dig).astype(jnp.uint32)


def _rotate_sub(c, m, Q: int):
    """(X^m - 1) * c for per-batch exponents m in [0, 2N): negacyclic rotation
    minus identity. c: uint32 [B, ..., N], m: int32 [B].

    Gather-free: m is bit-decomposed and each power-of-two rotation is a
    *static* negacyclic roll (slice + concat, compiled to cheap copies)
    selected per batch element. Dynamic per-element gathers are ~10x the cost
    of the entire NTT on TPU, so this formulation wins by a wide margin."""
    N = c.shape[-1]
    logn = N.bit_length() - 1
    bshape = (c.shape[0],) + (1,) * (c.ndim - 1)
    out = c
    for k in range(logn):
        s = 1 << k
        rolled = jnp.concatenate(
            [mm.negmod(out[..., N - s:], Q), out[..., :N - s]], axis=-1)
        bit = ((m >> k) & 1).astype(bool).reshape(bshape)
        out = jnp.where(bit, rolled, out)
    # the 2^logN bit: X^N = -1
    bit_n = ((m >> logn) & 1).astype(bool).reshape(bshape)
    out = jnp.where(bit_n, mm.negmod(out, Q), out)
    return mm.submod(out, c, Q)


@functools.lru_cache(maxsize=None)
def build_blind_rotate(N: int, Q: int, base_g: int, digits_g_eff: int, throw: int,
                       n: int):
    """Returns a jitted function
    (acc [B,2,N] u32, a_idx [B,n] i32, bsk [n,2,d2,2,N] u32, bsk_sh) -> acc.

    a_idx already carries the (q - a) * 2N/q scaling mod 2N
    (rgsw-acc-cggi.cpp:151-154)."""
    ntt = NTT32(N, Q)
    d2 = 2 * digits_g_eff
    two_n = np.int32(2 * N)

    def round_fn(r, state):
        acc, a_idx, bsk, bsk_sh = state
        dct = _decompose(acc, Q, base_g, digits_g_eff, throw)        # [B, d2, N]
        dct_hat = ntt.forward(dct)
        ek = jax.lax.dynamic_index_in_dim(bsk, r, 0, keepdims=False)      # [2, d2, 2, N]
        ek_sh = jax.lax.dynamic_index_in_dim(bsk_sh, r, 0, keepdims=False)
        # accumulate the keyed inner product over gadget rows without
        # materializing the [B, 2, d2, 2, N] product tensor (HBM traffic)
        u = mm.mulmod_shoup(dct_hat[:, None, 0, None, :], ek[None, :, 0], ek_sh[None, :, 0], Q)
        for l in range(1, d2):
            u = mm.addmod(u, mm.mulmod_shoup(dct_hat[:, None, l, None, :],
                                             ek[None, :, l], ek_sh[None, :, l], Q), Q)
        c = ntt.inverse(u)                                           # [B, 2, 2, N]
        idx_pos = a_idx[:, r]
        idx_neg = (two_n - idx_pos) % two_n
        upd = mm.addmod(_rotate_sub(c[:, 0], idx_pos, Q),
                        _rotate_sub(c[:, 1], idx_neg, Q), Q)         # [B, 2, N]
        acc = mm.addmod(acc, upd, Q)
        return acc, a_idx, bsk, bsk_sh

    @jax.jit
    def blind_rotate(acc, a_idx, bsk, bsk_sh):
        state = (acc, a_idx, bsk, bsk_sh)
        state = jax.lax.fori_loop(0, n, round_fn, state)
        return state[0]

    return blind_rotate


def transpose_extract(acc, Q: int):
    """Device version of the post-rotation extraction: transpose automorphism on
    the a-polynomial (poly.cpp:762-770) and constant term of b.
    acc [B,2,N] -> (a_t [B,N], b [B])."""
    a = acc[:, 0, :]
    rev = jnp.flip(a, axis=-1)
    a_t = jnp.concatenate([a[:, :1], mm.negmod(rev[:, :-1], Q)], axis=-1)
    return a_t, acc[:, 1, 0]
