"""Batched exact negacyclic NTT for 54-bit primes (two-limb uint32 pairs).

Same stage schedule and evaluation-domain ordering as `ops.ntt32` /
`ref.ntt`, with every butterfly running the 64-bit Shoup multiplication from
`ops.modmath64`. Used for the accelerated parameter sets whose ring primes
exceed 32 bits (binfhecontext.cpp:70,95: 54-bit Q').
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from ..ref import ntt as ref_ntt
from . import modmath64 as mm64


@functools.lru_cache(maxsize=None)
class NTT64:
    """Tables for (N, Q) with Q up to 2^62; operates on (lo, hi) uint32 pairs."""

    def __init__(self, N: int, Q: int):
        assert Q < (1 << 62)
        self.N, self.Q = N, Q
        t = ref_ntt._tables(N, Q)

        # host numpy constants only (device constants stall trace time on
        # remote backends — see ops/ntt32.py)
        def pair(x):
            return mm64.pack_host(np.asarray(x, dtype=np.uint64))

        def pair_sh(x):
            return mm64.shoup64(np.asarray(x, dtype=np.uint64), Q)

        self.bitrev = t["bitrev"].astype(np.int32)
        self.twist = pair(t["twist"])
        self.twist_sh = pair_sh(t["twist"])
        self.untwist = pair(t["untwist"])
        self.untwist_sh = pair_sh(t["untwist"])
        self.fwd_stages = [(pair(s), pair_sh(s)) for s in t["fwd_stages"]]
        self.inv_stages = [(pair(s), pair_sh(s)) for s in t["inv_stages"]]

    def _cyclic(self, x, stages):
        N, Q = self.N, self.Q
        x = (jnp.take(x[0], self.bitrev, axis=-1), jnp.take(x[1], self.bitrev, axis=-1))
        length = 2
        for tw, tw_sh in stages:
            half = length // 2

            def blocks(v):
                return v.reshape(v.shape[:-1] + (N // length, length))

            lo, hi = blocks(x[0]), blocks(x[1])
            even = (lo[..., :half], hi[..., :half])
            odd_in = (lo[..., half:], hi[..., half:])
            odd = mm64.mulmod_shoup64(odd_in, tw, tw_sh, Q)
            top = mm64.addmod64(even, odd, Q)
            bot = mm64.submod64(even, odd, Q)

            def join(a, b):
                out = jnp.concatenate([a, b], axis=-1)
                return out.reshape(out.shape[:-2] + (N,))

            x = (join(top[0], bot[0]), join(top[1], bot[1]))
            length *= 2
        return x

    def forward(self, x):
        tx = mm64.mulmod_shoup64(x, self.twist, self.twist_sh, self.Q)
        return self._cyclic(tx, self.fwd_stages)

    def inverse(self, x):
        y = self._cyclic(x, self.inv_stages)
        return mm64.mulmod_shoup64(y, self.untwist, self.untwist_sh, self.Q)
