"""uint32 modular arithmetic for JAX on TPU (moduli < 2^31).

TPU constraint: 64-bit integer multiplies are not trustworthy on this target
(XLA silently truncates them — verified empirically), so every device-side
operation here is built from exact uint32 primitives:

- `mulhi32`: high 32 bits of a 32x32 product via 16-bit halves,
- Shoup multiplication: for a constant multiplicand b with precomputed
  b' = floor(b * 2^32 / Q), computes (a*b) mod Q in ~6 vector ops. This is the
  same preconditioned-multiplier scheme the reference's CPU NTT uses
  (`transformnat-impl.h:299+`, NativeInteger::PrepModMulConst).
- exact RoundqQ (round-half-up of v*q/Q) via 64-bit fixed-point reciprocal,
  exact for all Q < 2^31 (error < Q/2^64 < boundary gap 1/(2Q)).

All functions are jit-safe and shape-polymorphic.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# numpy scalars (not jnp): device-scalar constants would each cost a
# device round-trip when embedded at trace time on remote backends
_U16_MASK = np.uint32(0xFFFF)
_S16 = np.uint32(16)


def mulhi32(a, b):
    """High 32 bits of the exact 64-bit product of two uint32 arrays."""
    a_lo = a & _U16_MASK
    a_hi = a >> _S16
    b_lo = b & _U16_MASK
    b_hi = b >> _S16
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    t = (ll >> _S16) + (lh & _U16_MASK) + (hl & _U16_MASK)
    return a_hi * b_hi + (lh >> _S16) + (hl >> _S16) + (t >> _S16)


def addmod(a, b, Q: int):
    s = a + b
    q = np.uint32(Q)
    return jnp.where(s >= q, s - q, s)


def submod(a, b, Q: int):
    q = np.uint32(Q)
    s = a + q - b
    return jnp.where(s >= q, s - q, s)


def negmod(a, Q: int):
    q = np.uint32(Q)
    return jnp.where(a == 0, a, q - a)


def mulmod_shoup(a, b, b_shoup, Q: int):
    """(a * b) mod Q where b is accompanied by b' = floor(b * 2^32 / Q).

    Requires a, b < Q < 2^31. Single conditional correction (Shoup/Harvey).
    """
    q = np.uint32(Q)
    t = mulhi32(a, b_shoup)
    r = a * b - t * q          # wrapping uint32 arithmetic; r in [0, 2Q)
    return jnp.where(r >= q, r - q, r)


def shoup(b: np.ndarray, Q: int) -> np.ndarray:
    """Host-side precomputation of floor(b * 2^32 / Q) (numpy, exact)."""
    return ((np.asarray(b, dtype=np.uint64) << np.uint64(32)) // np.uint64(Q)).astype(np.uint32)


def mod_u32(x, Q: int):
    """x mod Q for arbitrary uint32 x (exact; Q < 2^31)."""
    if Q & (Q - 1) == 0:
        return x & np.uint32(Q - 1)
    s = Q.bit_length() - 1            # 2^s < Q < 2^(s+1) (Q not a power of two)
    M = (1 << (32 + s)) // Q          # < 2^32
    t = mulhi32(x, np.uint32(M)) >> np.uint32(s)
    r = x - t * np.uint32(Q)         # r in [0, 3Q)
    q = np.uint32(Q)
    r = jnp.where(r >= q, r - q, r)
    return jnp.where(r >= q, r - q, r)


def barrett_mulmod(a, b, Q: int):
    """Generic (a * b) mod Q for variable a, b < Q < 2^31 — no precomputation.

    (hi*2^32 + lo) mod Q via one Shoup step on the reduced high half. Costs
    ~3x mulmod_shoup; hot paths should precondition constants instead.
    """
    lo = a * b
    hi = mulhi32(a, b)
    r32 = int((1 << 32) % Q)
    r32_sh = int((r32 << 32) // Q)
    part = mulmod_shoup(mod_u32(hi, Q), np.uint32(r32), np.uint32(r32_sh), Q)
    return addmod(part, mod_u32(lo, Q), Q)


def round_q_Q(v, q: int, Q: int):
    """Exact round-half-up of v*q/Q, mod q — RoundqQ (lwe-pke.cpp:41-46) for
    v < Q < 2^31, q <= Q, computed as floor((v*F + 2^63) / 2^64) with
    F = floor(q*2^64/Q); exact because the fixed-point error v*2^-64 < 2^-33
    is smaller than the half-integer gap 1/(2Q) > 2^-32 whenever Q < 2^31.5."""
    if q == Q:
        return v
    F = (int(q) << 64) // int(Q)
    assert F < (1 << 64), "RoundqQ requires q <= Q"
    f_hi = np.uint32((F >> 32) & 0xFFFFFFFF)
    f_lo = np.uint32(F & 0xFFFFFFFF)
    # v*F = (v*f_hi)<<32 + v*f_lo ; add 2^63 ; keep bits [64:96)
    h1 = mulhi32(v, f_hi)
    l1 = v * f_hi
    h2 = mulhi32(v, f_lo)
    mid = l1 + h2
    carry1 = (mid < l1).astype(jnp.uint32)
    mid2 = mid + np.uint32(1 << 31)
    carry2 = (mid2 < mid).astype(jnp.uint32)
    res = h1 + carry1 + carry2
    qq = np.uint32(q)
    return jnp.where(res >= qq, res - qq, res)


def sum_mod(x, axis: int, Q: int):
    """Exact sum mod Q along `axis` for uint32 residues < Q < 2^31.

    Sums chunks small enough that partial sums stay below 2^32, reduces each
    chunk mod Q, then recurses on the (now < Q) chunk sums."""
    chunk = max(2, (1 << 32) // Q - 1)
    while x.shape[axis] > 1:
        k = x.shape[axis]
        c = min(chunk, k)
        pad = (-k) % c
        if pad:
            pad_width = [(0, 0)] * x.ndim
            pad_width[axis] = (0, pad)
            x = jnp.pad(x, pad_width)
        g = (k + pad) // c
        shape = x.shape[:axis] + (g, c) + x.shape[axis + 1:]
        x = mod_u32(jnp.sum(x.reshape(shape), axis=axis + 1, dtype=jnp.uint32), Q)
    return jnp.squeeze(x, axis=axis)
