"""Two-limb (uint32 pair) modular arithmetic for JAX on TPU — moduli up to 2^62.

The accelerated parameter sets use 54-bit NTT primes (binfhecontext.cpp:70,95)
and qKS = 2^35, but 64-bit integer multiplies are unusable on this TPU target,
so values x mod Q are carried as two uint32 lanes (lo, hi) with x = hi*2^32+lo.

Primitives:
- add64/sub64 mod Q (carry-propagating, conditional subtract),
- Shoup multiplication by preconditioned constants: for b with
  b' = floor(b*2^64/Q) (two limbs), q_hat = floor(a*b'/2^64) needs only the top
  half of a 128-bit product and r = a*b - q_hat*Q needs only the bottom half;
  one correction yields (a*b) mod Q — the 64-bit analogue of the scheme in
  `transformnat-impl.h:299+`.
- exact RoundqQ via 128-bit fixed-point reciprocal (used by the fused
  mod/key/mod switch for Q ~ 2^54, qKS = 2^35).

Packing convention everywhere: a pair (lo, hi) of equally-shaped uint32 arrays.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .modmath32 import mulhi32

_ZERO = np.uint32(0)
_ONE = np.uint32(1)


# ---------------------------------------------------------------------------
# packing helpers (host side)
# ---------------------------------------------------------------------------

def pack_host(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 numpy -> (lo, hi) uint32 numpy."""
    x = np.asarray(x, dtype=np.uint64)
    return (x & np.uint64(0xFFFFFFFF)).astype(np.uint32), (x >> np.uint64(32)).astype(np.uint32)


def unpack_host(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    return np.asarray(lo, dtype=np.uint64) | (np.asarray(hi, dtype=np.uint64) << np.uint64(32))


def shoup64(b: np.ndarray, Q: int) -> tuple[np.ndarray, np.ndarray]:
    """floor(b * 2^64 / Q) as (lo, hi) uint32 (host, exact, vectorized).

    Long division in 10-bit steps so every intermediate fits uint64
    (requires b < Q < 2^54)."""
    assert Q < (1 << 54)
    x = np.asarray(b, dtype=np.uint64) % np.uint64(Q)
    q_acc = np.zeros_like(x)
    qv = np.uint64(Q)
    for step in (10, 10, 10, 10, 10, 10, 4):
        x = x << np.uint64(step)
        q_acc = (q_acc << np.uint64(step)) + x // qv
        x = x % qv
    return pack_host(q_acc)


# ---------------------------------------------------------------------------
# device primitives
# ---------------------------------------------------------------------------

def _addc(a, b):
    """32-bit add with carry out: (sum, carry)."""
    s = a + b
    return s, (s < a).astype(jnp.uint32)


def add64(a, b):
    """(a + b) as 64-bit pair (no reduction); inputs/outputs (lo, hi)."""
    lo, c = _addc(a[0], b[0])
    hi = a[1] + b[1] + c
    return lo, hi


def sub64(a, b):
    """(a - b) mod 2^64 as a pair (caller guarantees a >= b)."""
    lo = a[0] - b[0]
    borrow = (a[0] < b[0]).astype(jnp.uint32)
    hi = a[1] - b[1] - borrow
    return lo, hi


def _geq(a, b):
    """a >= b for pairs."""
    return (a[1] > b[1]) | ((a[1] == b[1]) & (a[0] >= b[0]))


def _const_pair(v: int):
    return np.uint32(v & 0xFFFFFFFF), np.uint32((v >> 32) & 0xFFFFFFFF)


def addmod64(a, b, Q: int):
    s = add64(a, b)          # < 2Q < 2^63: no 64-bit overflow
    qp = _const_pair(Q)
    over = _geq(s, qp)
    red = sub64(s, qp)
    return (jnp.where(over, red[0], s[0]), jnp.where(over, red[1], s[1]))


def submod64(a, b, Q: int):
    s = add64(a, _const_pair(Q))
    s = sub64(s, b)
    qp = _const_pair(Q)
    over = _geq(s, qp)
    red = sub64(s, qp)
    return (jnp.where(over, red[0], s[0]), jnp.where(over, red[1], s[1]))


def negmod64(a, Q: int):
    qp = _const_pair(Q)
    is_zero = (a[0] == _ZERO) & (a[1] == _ZERO)
    r = sub64(qp, a)
    return (jnp.where(is_zero, _ZERO, r[0]), jnp.where(is_zero, _ZERO, r[1]))


def mul32x32(a, b):
    """Full 64-bit product of uint32 arrays as (lo, hi)."""
    return a * b, mulhi32(a, b)


def _mul64_full(a, b):
    """Full 128-bit product of two 64-bit pairs -> 4 uint32 limbs (p0..p3)."""
    ll_lo, ll_hi = mul32x32(a[0], b[0])
    lh_lo, lh_hi = mul32x32(a[0], b[1])
    hl_lo, hl_hi = mul32x32(a[1], b[0])
    hh_lo, hh_hi = mul32x32(a[1], b[1])

    p0 = ll_lo
    # p1 = ll_hi + lh_lo + hl_lo (with carries into p2)
    s1, c1 = _addc(ll_hi, lh_lo)
    p1, c2 = _addc(s1, hl_lo)
    # p2 = lh_hi + hl_hi + hh_lo + carries
    s2, c3 = _addc(lh_hi, hl_hi)
    s2b, c4 = _addc(s2, hh_lo)
    p2, c5 = _addc(s2b, c1 + c2)
    p3 = hh_hi + c3 + c4 + c5
    return p0, p1, p2, p3


def mul64_lo(a, b):
    """Low 64 bits of a*b as a pair."""
    lo, hi = mul32x32(a[0], b[0])
    hi = hi + a[0] * b[1] + a[1] * b[0]
    return lo, hi


def mul64_hi(a, b):
    """High 64 bits of the 128-bit product a*b as a pair (exact)."""
    _, p1, p2, p3 = _mul64_full(a, b)
    del p1
    return p2, p3


def mulmod_shoup64(a, b, b_sh, Q: int):
    """(a*b) mod Q for a, b < Q < 2^62, with b_sh = floor(b*2^64/Q) pairs.

    q_hat = floor(a*b_sh / 2^64); r = a*b - q_hat*Q in [0, 2Q); one correction.
    """
    q_hat = mul64_hi(a, b_sh)
    ab = mul64_lo(a, b)
    qq = mul64_lo(q_hat, _wrap_const(Q))
    r = sub64(ab, qq)          # mod 2^64 arithmetic; true r in [0, 2Q)
    qp = _const_pair(Q)
    over = _geq(r, qp)
    red = sub64(r, qp)
    return (jnp.where(over, red[0], r[0]), jnp.where(over, red[1], r[1]))


def _wrap_const(v: int):
    return _const_pair(v)


def round_q_Q64(v, q: int, Q: int):
    """Exact RoundqQ for v < Q < 2^62: floor((v*F + 2^127) / 2^128) with
    F = floor(q*2^128/Q). Handles both directions — scale-down (q <= Q) and
    scale-up (q > Q, e.g. the accelerated logQ=11 configs with Q ~ 2^27 and
    qKS = 2^35, where the reference's MKMSwitchKernel scales the extracted
    ciphertext UP). Exact because the fixed-point error v*2^-128 < 2^-66 is
    below the half-integer gap 1/(2Q) > 2^-63.

    v is a (lo, hi) uint32 pair; returns a (lo, hi) pair of residues mod q.
    Computed by 16-bit-limb schoolbook: column sums stay < 2^21 in uint32, so
    carry handling is a plain shift chain (this runs once per modswitch
    coefficient — clarity over cycle count)."""
    if q == Q:
        return v
    F = (int(q) << 128) // int(Q)
    n_f = max(8, (F.bit_length() + 15) // 16)          # F limbs (q > Q: up to 10)
    assert q < (1 << 62) and v is not None
    f16 = [np.uint32((F >> (16 * j)) & 0xFFFF) for j in range(n_f)]
    v16 = [v[0] & np.uint32(0xFFFF), v[0] >> np.uint32(16),
           v[1] & np.uint32(0xFFFF), v[1] >> np.uint32(16)]

    n_cols = 4 + n_f + 1
    cols = [None] * n_cols
    for i in range(4):
        for j in range(n_f):
            p = v16[i] * f16[j]
            k = i + j
            cols[k] = p & np.uint32(0xFFFF) if cols[k] is None else cols[k] + (p & np.uint32(0xFFFF))
            hi = p >> np.uint32(16)
            cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    zero = jnp.zeros_like(v[0])
    cols = [zero if c is None else c for c in cols]
    cols[7] = cols[7] + np.uint32(0x8000)      # + 2^127

    # carry propagation (each column < 14*2^16 + carry < 2^21)
    carry = zero
    out16 = []
    for k in range(n_cols):
        s = cols[k] + carry
        out16.append(s & np.uint32(0xFFFF))
        carry = s >> np.uint32(16)
    out16.append(carry)
    while len(out16) < 12:
        out16.append(zero)
    # result = bits [128:192) = limbs 8..11 (q < 2^62 fits in 4 limbs)
    res = (out16[8] | (out16[9] << np.uint32(16)),
           out16[10] | (out16[11] << np.uint32(16)))
    qp = _const_pair(q)
    over = _geq(res, qp)
    red = sub64(res, qp)
    return (jnp.where(over, red[0], res[0]), jnp.where(over, red[1], res[1]))
