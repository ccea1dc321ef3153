"""Batched DM/AP blind rotation on device (uint32 path, Q < 2^31).

Device analogue of `RingGSWAccumulatorDM::EvalAcc` + `AddToAccDM`
(rgsw-acc-dm.cpp:80-149, 306-359) — a capability the reference never shipped
on its accelerator (its DM GPU path is entirely commented out,
rgsw-acc-dm.cpp:361-464; GPU supports CGGI only).

Per step (i, k): the base-R digit a0 of (q - a_i) selects the RGSW key
ek[i][a0][k], and acc <- <decompose(acc), ek> (the sum skipping gadget row 0
exactly as the reference does). Data-dependent key selection is expressed as
a one-hot bfloat16 MXU matmul over the baseR axis against the 7-bit-limb
split key table (a one-row selection is trivially exact); zero digits are
handled with a per-ciphertext select (the reference skips them on the host).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from . import modmath32 as mm
from .blindrotate32 import _decompose
from .ntt32 import NTT32

_LIMB_BITS = 7


def dm_limbs(Q: int) -> int:
    """7-bit limbs needed to represent values < Q (5 for the 29-bit STD256
    primes, 4 below 2^28)."""
    return (int(Q - 1).bit_length() + _LIMB_BITS - 1) // _LIMB_BITS


def pack_dm_table(bsk_hat: np.ndarray, Q: int) -> np.ndarray:
    """Eval-domain DM key [n, baseR, digitsR, d2, 2, N] uint64 ->
    bf16 limb table [n*digitsR, baseR, 4*d2*2*N] (step-major, selection axis
    second)."""
    import ml_dtypes

    L = dm_limbs(Q)
    n, base_r, d_r, d2, _, N = bsk_hat.shape
    b = np.swapaxes(np.asarray(bsk_hat, dtype=np.uint64), 1, 2)  # [n, dR, baseR, ...]
    b = b.reshape(n * d_r, base_r, d2 * 2 * N)
    limbs = np.stack([((b >> np.uint64(_LIMB_BITS * l)) & np.uint64(127))
                      .astype(np.float32) for l in range(L)], axis=2)
    return limbs.reshape(n * d_r, base_r, L * d2 * 2 * N).astype(ml_dtypes.bfloat16)


def dm_digits(a_batch: np.ndarray, a_modulus: int, base_r: int,
              digits_r: int) -> np.ndarray:
    """Host precompute: base-R digits of (q - a_i), [B, n*digitsR] int32,
    step order (i, k) (rgsw-acc-dm.cpp:120-135)."""
    a = np.asarray(a_batch, dtype=np.int64) % a_modulus
    ai = (a_modulus - a) % a_modulus                       # [B, n]
    out = np.zeros(a.shape + (digits_r,), dtype=np.int32)
    for k in range(digits_r):
        out[..., k] = ai % base_r
        ai //= base_r
    return out.reshape(a.shape[0], -1)


@functools.lru_cache(maxsize=None)
def build_dm_rotate(N: int, Q: int, base_g: int, digits_g: int, base_r: int,
                    n_steps: int):
    """Jitted (acc [B,2,N] u32, digits [B,n_steps] i32, table bf16) -> acc."""
    ntt = NTT32(N, Q)
    d2 = 2 * digits_g
    L = dm_limbs(Q)
    w = [np.uint32(pow(2, _LIMB_BITS * l, 1 << 32)) for l in range(L)]

    def step_fn(step, state):
        acc, digits, table = state
        a0 = jax.lax.dynamic_index_in_dim(digits, step, 1, keepdims=False)  # [B]
        tab = jax.lax.dynamic_index_in_dim(table, step, 0, keepdims=False)  # [baseR, C]
        oh = (a0[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, base_r), 1)).astype(jnp.bfloat16)
        sel = jnp.dot(oh, tab, preferred_element_type=jnp.float32)
        sel = sel.astype(jnp.uint32).reshape(acc.shape[0], L, d2, 2, N)
        ek = sel[:, 0]
        for l in range(1, L):
            ek = ek + sel[:, l] * w[l]                     # < Q < 2^31, exact u32

        dct = _decompose(acc, Q, base_g, digits_g, 0)      # [B, d2, N]
        dct_hat = ntt.forward(dct)
        # gadget-row sum starts at 1 (rgsw-acc-dm.cpp:350-358)
        u = None
        for r in range(1, d2):
            t = mm.barrett_mulmod(dct_hat[:, r, None, :], ek[:, r], Q)  # [B,2,N]
            u = t if u is None else mm.addmod(u, t, Q)
        new = ntt.inverse(u)                               # [B, 2, N]
        keep = (a0 == 0).reshape(-1, 1, 1)
        acc = jnp.where(keep, acc, new)
        return acc, digits, table

    @jax.jit
    def rotate(acc, digits, table):
        state = (acc, digits, table)
        return jax.lax.fori_loop(0, n_steps, step_fn, state)[0]

    return rotate
