"""JAX device backend: batched blind rotation + fused key switching on TPU
(or any JAX device), bit-exact against the host oracle.

The setup step is the analogue of the reference's `GPUSetup`
(bootstrapping.cu:725-1083): the canonical coefficient-domain bootstrapping
key is transformed to the evaluation domain, paired with Shoup preconditioned
multipliers, and the switching key is flattened to one gatherable table —
exactly where the reference converts its key to the cuFFTDx layout and
flattens `KSkey[N][baseKS][digitCount]`.

Currently uint32-only (ring modulus Q and key-switching modulus qKS < 2^31),
which covers every classic parameter set with modKS <= 2^30 and the
accelerated logQ=11 gate configuration. The 54-bit two-limb path is tracked in
ops/modmath64 (in progress); larger configs fall back to the host oracle.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .. import lwe
from ..params import BinFHEParams, Method
from ..ref import ntt as ref_ntt
from . import modmath32 as mm
from .blindrotate32 import build_blind_rotate, transpose_extract
from .keyswitch32 import build_mkm_switch


class JaxBackend:
    """Implements the `scheme.Backend` protocol on JAX devices."""

    def __init__(self, num_devices: int = 0):
        self.num_devices = num_devices
        self._device_keys: dict[int, dict] = {}

    # -- setup -------------------------------------------------------------

    def supports(self, params: BinFHEParams) -> bool:
        return (params.lwe.Q < (1 << 31) and params.lwe.q_ks < (1 << 31)
                and params.rgsw.method == Method.GINX)

    def setup(self, params: BinFHEParams, key) -> None:
        if not self.supports(params):
            raise NotImplementedError(
                "JaxBackend currently requires GINX with Q, qKS < 2^31 "
                "(the two-limb 54-bit path is not wired up yet)")
        self._get_device_key(params, key)

    def _get_device_key(self, params: BinFHEParams, key) -> dict:
        cache_id = id(key.bsk_coeff)
        if cache_id in self._device_keys:
            return self._device_keys[cache_id]
        p = params.lwe
        Q = p.Q
        # evaluation-domain BSkey + Shoup companions (host, vectorized NTT)
        bsk_hat = ref_ntt.forward(np.asarray(key.bsk_coeff, dtype=np.uint64), Q)
        dk = {
            "bsk": jnp.asarray(bsk_hat.astype(np.uint32)),
            "bsk_sh": jnp.asarray(mm.shoup(bsk_hat, Q)),
            "ksk_a": jnp.asarray(
                np.asarray(key.ksk.A, dtype=np.uint64).astype(np.uint32).reshape(-1, p.n)),
            "ksk_b": jnp.asarray(
                np.asarray(key.ksk.B, dtype=np.uint64).astype(np.uint32).reshape(-1)),
        }
        self._device_keys[cache_id] = dk
        return dk

    # -- protocol ----------------------------------------------------------

    @staticmethod
    def _bucket(B: int) -> int:
        """Pad batch sizes to powers of two so jit compiles are reused (the
        blind-rotation graph costs minutes to compile)."""
        b = 8
        while b < B:
            b *= 2
        return b

    def eval_acc(self, params: BinFHEParams, key, acc_init: np.ndarray,
                 a_batch: np.ndarray, a_modulus: int) -> np.ndarray:
        dk = self._get_device_key(params, key)
        rg = params.rgsw
        N, Q = rg.N, rg.Q
        fn = build_blind_rotate(N, Q, rg.base_g,
                                rg.digits_g - rg.num_digits_to_throw,
                                rg.num_digits_to_throw, params.lwe.n)
        B = acc_init.shape[0]
        Bp = self._bucket(B)
        acc = np.zeros((Bp, 2, N), dtype=np.uint32)
        acc[:B] = np.asarray(acc_init, dtype=np.uint64).astype(np.uint32)
        a_idx = np.zeros((Bp, params.lwe.n), dtype=np.int32)
        a_idx[:B] = self._scaled_indices(a_batch, a_modulus, N)
        out = fn(jnp.asarray(acc), jnp.asarray(a_idx), dk["bsk"], dk["bsk_sh"])
        return np.asarray(jax.device_get(out))[:B].astype(np.uint64)

    def mkm_switch(self, params: BinFHEParams, key, a_ext: np.ndarray,
                   b_ext: np.ndarray, fmod: int) -> lwe.LWECiphertext:
        dk = self._get_device_key(params, key)
        p = params.lwe
        fn = build_mkm_switch(p.N, p.Q, p.q_ks, p.base_ks, p.digit_count_ks,
                              p.n, int(fmod))
        B = a_ext.shape[0]
        Bp = self._bucket(B)
        a_pad = np.zeros((Bp, p.N), dtype=np.uint32)
        a_pad[:B] = np.asarray(a_ext, dtype=np.uint64).astype(np.uint32)
        b_pad = np.zeros((Bp,), dtype=np.uint32)
        b_pad[:B] = np.asarray(b_ext, dtype=np.uint64).astype(np.uint32)
        a_out, b_out = fn(jnp.asarray(a_pad), jnp.asarray(b_pad), dk["ksk_a"], dk["ksk_b"])
        return lwe.LWECiphertext(np.asarray(jax.device_get(a_out))[:B].astype(np.uint64),
                                 np.asarray(jax.device_get(b_out))[:B].astype(np.uint64),
                                 int(fmod))

    # -- helpers -----------------------------------------------------------

    @staticmethod
    def _scaled_indices(a_batch: np.ndarray, a_modulus: int, N: int) -> np.ndarray:
        """(q - a) * (2N / q) mod 2N as int32 (rgsw-acc-cggi.cpp:151-154)."""
        a = np.asarray(a_batch, dtype=np.uint64) % np.uint64(a_modulus)
        factor = (2 * N) // a_modulus
        idx = ((np.uint64(a_modulus) - a) % np.uint64(a_modulus)) * np.uint64(factor)
        return (idx % np.uint64(2 * N)).astype(np.int32)
