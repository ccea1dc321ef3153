"""Vector-modulus u32 modular arithmetic: one XLA op across stacked RNS limbs.

The per-limb builders in the pke device modules originally looped over limbs
in Python, emitting O(L) copies of every op into the jit graph — at L = 30
a single rotate graph took minutes of XLA compile time. These variants take
the modulus (and its preconditioned companions) as a PER-LIMB ARRAY
broadcast over a stacked [L, ..., N] tower, so the graph size is
independent of L and XLA sees large fusible ops — the layout the TPU wants.

Bit-exactness is unchanged: the same Shoup/Barrett identities per element,
with per-limb constants (`LimbModuli` precomputes the magic numbers on the
host). All arrays are uint32 with every modulus < 2^31, like ops/modmath32.
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from . import modmath32 as mm


@functools.lru_cache(maxsize=None)
class LimbModuli:
    """Per-limb constants for a tuple of moduli, reshape-cached per ndim."""

    def __init__(self, moduli: tuple):
        self.moduli = tuple(int(m) for m in moduli)
        assert all(0 < m < (1 << 31) for m in self.moduli)
        self.q = np.array(self.moduli, dtype=np.uint32)
        s = [m.bit_length() - 1 for m in self.moduli]
        # mod_u32 magic: floor(2^(32+s)/Q); power-of-two limbs use the mask
        self.pow2 = np.array([m & (m - 1) == 0 for m in self.moduli])
        self.mask = np.array([m - 1 for m in self.moduli], dtype=np.uint32)
        self.s = np.array(s, dtype=np.uint32)
        self.M = np.array([(1 << (32 + si)) // m if m & (m - 1) else 1
                           for si, m in zip(s, self.moduli)], dtype=np.uint32)
        r32 = [(1 << 32) % m for m in self.moduli]
        self.r32 = np.array(r32, dtype=np.uint32)
        self.r32_sh = np.array([(r << 32) // m
                                for r, m in zip(r32, self.moduli)],
                               dtype=np.uint32)

    def bc(self, arr: np.ndarray, ndim: int) -> np.ndarray:
        """Reshape a per-limb [L] (or [L, N]) constant array to broadcast
        against a stacked [L, ..., N] operand of `ndim` dims."""
        if arr.ndim == 1:
            return arr.reshape((arr.shape[0],) + (1,) * (ndim - 1))
        return arr.reshape((arr.shape[0],) + (1,) * (ndim - arr.ndim)
                           + arr.shape[1:])

    def shoup(self, b: np.ndarray) -> np.ndarray:
        """Per-limb Shoup companions of a stacked [L, ...] constant array."""
        b64 = np.asarray(b, dtype=np.uint64)
        q64 = np.asarray(self.q, dtype=np.uint64).reshape(
            (len(self.moduli),) + (1,) * (b64.ndim - 1))
        return ((b64 << np.uint64(32)) // q64).astype(np.uint32)


def addmod_v(a, b, lm: LimbModuli):
    q = lm.bc(lm.q, a.ndim)
    s = a + b
    return jnp.where(s >= q, s - q, s)


def submod_v(a, b, lm: LimbModuli):
    q = lm.bc(lm.q, a.ndim)
    s = a + q - b
    return jnp.where(s >= q, s - q, s)


def mulmod_shoup_v(a, b, b_shoup, lm: LimbModuli):
    """(a * b) mod q per limb; b/b_shoup are stacked per-limb constants
    already broadcastable against a (use lm.bc on host arrays)."""
    q = lm.bc(lm.q, a.ndim)
    t = mm.mulhi32(a, b_shoup)
    r = a * b - t * q
    return jnp.where(r >= q, r - q, r)


def mod_u32_v(x, lm: LimbModuli):
    """x mod q per limb for arbitrary uint32 x."""
    q = lm.bc(lm.q, x.ndim)
    t = mm.mulhi32(x, lm.bc(lm.M, x.ndim)) >> lm.bc(lm.s, x.ndim)
    r = x - t * q
    r = jnp.where(r >= q, r - q, r)
    r = jnp.where(r >= q, r - q, r)
    if lm.pow2.any():
        r = jnp.where(jnp.asarray(lm.bc(lm.pow2, x.ndim)),
                      x & lm.bc(lm.mask, x.ndim), r)
    return r


def barrett_mulmod_v(a, b, lm: LimbModuli):
    """Generic (a * b) mod q per limb for variable a, b < q."""
    lo = a * b
    hi = mm.mulhi32(a, b)
    part = mulmod_shoup_v(mod_u32_v(hi, lm), lm.bc(lm.r32, a.ndim),
                          lm.bc(lm.r32_sh, a.ndim), lm)
    return addmod_v(part, mod_u32_v(lo, lm), lm)
