"""Batched exact negacyclic NTT in pure JAX (uint32, Q < 2^31).

Device analogue of the reference's `ChineseRemainderTransformFTTNat`
(transformnat-impl.h) with Shoup-preconditioned twiddles, structured for XLA:
log2(N) unrolled stages of reshape + butterfly (no dynamic gathers except one
static bit-reversal permutation). Operates on the last axis; any leading batch
shape.

The evaluation-domain ordering matches `tfhe_tpu.ref.ntt` (same root, same
radix-2 DIT schedule), so eval-domain key material is interchangeable between
the host oracle and this backend.
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from ..ref import ntt as ref_ntt
from . import modmath32 as mm


@functools.lru_cache(maxsize=None)
class NTT32:
    """Precomputed tables for (N, Q); forward/inverse are jit-safe methods."""

    def __init__(self, N: int, Q: int):
        assert Q < (1 << 31)
        self.N, self.Q = N, Q
        t = ref_ntt._tables(N, Q)

        # NOTE: tables are kept as *host* numpy constants. Device (jnp) arrays
        # here would be fetched back during MLIR constant embedding at trace
        # time — prohibitively slow over remote-device tunnels.
        def dev(x):
            return np.asarray(x, dtype=np.uint64).astype(np.uint32)

        def dev_sh(x):
            return mm.shoup(np.asarray(x, dtype=np.uint64), Q)

        self.bitrev = t["bitrev"].astype(np.int32)
        self.twist = dev(t["twist"])
        self.twist_sh = dev_sh(t["twist"])
        self.untwist = dev(t["untwist"])
        self.untwist_sh = dev_sh(t["untwist"])
        self.fwd_stages = [(dev(s), dev_sh(s)) for s in t["fwd_stages"]]
        self.inv_stages = [(dev(s), dev_sh(s)) for s in t["inv_stages"]]

    def _cyclic(self, x, stages):
        N, Q = self.N, self.Q
        x = jnp.take(x, self.bitrev, axis=-1)
        length = 2
        for tw, tw_sh in stages:
            half = length // 2
            x = x.reshape(x.shape[:-1] + (N // length, length))
            even = x[..., :half]
            odd = mm.mulmod_shoup(x[..., half:], tw, tw_sh, Q)
            x = jnp.concatenate([mm.addmod(even, odd, Q), mm.submod(even, odd, Q)], axis=-1)
            x = x.reshape(x.shape[:-2] + (N,))
            length *= 2
        return x

    def forward(self, x):
        """Coefficient -> evaluation (negacyclic), uint32 [..., N]."""
        tx = mm.mulmod_shoup(x, self.twist, self.twist_sh, self.Q)
        return self._cyclic(tx, self.fwd_stages)

    def inverse(self, x):
        """Evaluation -> coefficient (negacyclic), uint32 [..., N]."""
        y = self._cyclic(x, self.inv_stages)
        return mm.mulmod_shoup(y, self.untwist, self.untwist_sh, self.Q)
