"""Limb-stacked exact negacyclic NTT: every RNS limb in one XLA op.

NTT32 (ops/ntt32.py) transforms one modulus at a time; the pke device
builders called it in a Python loop over limbs, inflating the jit graph by
a factor of L (and XLA compile time along with it). NTTL stacks the
per-limb twiddle tables to [L, ...] and runs the identical butterfly
schedule on a [L, ..., N] tower with vector-modulus arithmetic
(ops/modmath32v) — O(log N) graph ops regardless of chain length, with
lane-dim vectorization XLA can map straight onto the VPU.

Bit-identical to per-limb NTT32/ref_ntt on every input (the same radix-2
DIT schedule, roots, and Shoup preconditioning per limb)."""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from ..ref import ntt as ref_ntt
from . import modmath32v as mv


@functools.lru_cache(maxsize=None)
class NTTL:
    """Precomputed stacked tables for (N, moduli tuple)."""

    def __init__(self, N: int, moduli: tuple):
        self.N = N
        self.moduli = tuple(int(m) for m in moduli)
        self.lm = mv.LimbModuli(self.moduli)
        tabs = [ref_ntt._tables(N, m) for m in self.moduli]

        def stack(key):
            return np.stack([np.asarray(t[key], dtype=np.uint64)
                             for t in tabs]).astype(np.uint32)

        self.bitrev = tabs[0]["bitrev"].astype(np.int32)
        self.twist = stack("twist")                       # [L, N]
        self.twist_sh = self.lm.shoup(self.twist)
        self.untwist = stack("untwist")
        self.untwist_sh = self.lm.shoup(self.untwist)
        n_stages = len(tabs[0]["fwd_stages"])
        self.fwd_stages = []
        self.inv_stages = []
        for si in range(n_stages):
            for dst, key in ((self.fwd_stages, "fwd_stages"),
                             (self.inv_stages, "inv_stages")):
                tw = np.stack([np.asarray(t[key][si], dtype=np.uint64)
                               for t in tabs]).astype(np.uint32)  # [L, half]
                dst.append((tw, self.lm.shoup(tw)))

    def _bc_stage(self, tw: np.ndarray, ndim: int) -> np.ndarray:
        # operand inside the butterfly is [L, ..., N//len, half]
        return tw.reshape((tw.shape[0],) + (1,) * (ndim - 2) + (tw.shape[1],))

    def _cyclic(self, x, stages):
        N = self.N
        L = len(self.moduli)
        x = jnp.take(x, self.bitrev, axis=-1)
        length = 2
        for tw, tw_sh in stages:
            half = length // 2
            x = x.reshape(x.shape[:-1] + (N // length, length))
            even = x[..., :half]
            odd = mv.mulmod_shoup_v(x[..., half:],
                                    self._bc_stage(tw, x.ndim),
                                    self._bc_stage(tw_sh, x.ndim), self.lm)
            x = jnp.concatenate([mv.addmod_v(even, odd, self.lm),
                                 mv.submod_v(even, odd, self.lm)], axis=-1)
            x = x.reshape(x.shape[:-2] + (N,))
            length *= 2
        assert x.shape[0] == L
        return x

    def _bc_tab(self, tab: np.ndarray, ndim: int) -> np.ndarray:
        return tab.reshape((tab.shape[0],) + (1,) * (ndim - 2)
                           + (tab.shape[1],))

    def forward(self, x):
        """Coefficient -> evaluation (negacyclic), uint32 [L, ..., N]."""
        tx = mv.mulmod_shoup_v(x, self._bc_tab(self.twist, x.ndim),
                               self._bc_tab(self.twist_sh, x.ndim), self.lm)
        return self._cyclic(tx, self.fwd_stages)

    def inverse(self, x):
        """Evaluation -> coefficient (negacyclic), uint32 [L, ..., N]."""
        y = self._cyclic(x, self.inv_stages)
        return mv.mulmod_shoup_v(y, self._bc_tab(self.untwist, x.ndim),
                                 self._bc_tab(self.untwist_sh, x.ndim),
                                 self.lm)
