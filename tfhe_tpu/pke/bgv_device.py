"""Device-resident RNS-BGV: the leveled homomorphic hot loop on the
accelerator.

The BGV counterpart of pke/ckks_device.py — the same u32 tower kernels
(tensor product, hybrid key switch, ModReduce, automorphisms) with the BGV
t-corrections threaded through (`t` parameter of the ckks_device builders):
t-exact ModDown inside the key switch and the t-preserving ModReduce after
each mult. Bit-identical to the host BGVRnsContext on every input
(tests/test_bgv_device.py) — a capability the reference's CPU-only bgvrns
stack (rns-leveledshe.cpp BGV branch) never had on an accelerator.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax

from .bfv import BFVCiphertext
from .bgv_rns import BGVRnsContext
from .ckks_device import (_PackedKey, build_add, build_mult_relin_rescale,
                          build_rotate)
from .dcrt import DCRTParams, DCRTPoly
from .encoding import rotation_automorphism_index


@dataclass
class DeviceBGVCiphertext:
    """Ciphertext resident on device: two [L, N] u32 eval-form towers."""
    c0: jax.Array
    c1: jax.Array
    moduli: tuple

    @property
    def level_len(self) -> int:
        return len(self.moduli)


class BGVDeviceContext:
    """Front door for the BGV device offload: wraps a BGVRnsContext (which
    must carry a sub-2^31-limb chain and ks_limb_bits <= 30), keeps
    relin/galois keys device-resident, and runs mult/rotate/add chains
    without the towers ever visiting the host."""

    def __init__(self, rns_ctx: BGVRnsContext):
        assert all(m < (1 << 31) for m in rns_ctx.params.dcrt.moduli), \
            "device chain needs limb moduli < 2^31 (use limb_bits <= 30)"
        self.rns = rns_ctx
        self.params = rns_ctx.params
        self._rlk: dict[int, _PackedKey] = {}
        self._gk: dict[tuple[int, int], _PackedKey] = {}

    # -- key management ----------------------------------------------------

    def _load(self, store: dict, keyfn, keys) -> None:
        if isinstance(keys, dict):
            for lvl_len, key in keys.items():
                store[keyfn(lvl_len)] = _PackedKey(key)
        else:
            pk = _PackedKey(keys)       # ONE full-chain key, every level
            for lvl_len in range(2, pk.q_len + 1):
                store[keyfn(lvl_len)] = pk

    def load_relin_keys(self, keys) -> None:
        """Per-level dict OR a single full-chain key (level-aware)."""
        self._load(self._rlk, lambda lv: lv, keys)

    def load_galois_keys(self, steps: int, keys) -> None:
        self._load(self._gk, lambda lv: (steps, lv), keys)

    # -- transfers ----------------------------------------------------------

    def upload(self, ct: BFVCiphertext) -> DeviceBGVCiphertext:
        lp = ct.polys[0].params
        return DeviceBGVCiphertext(
            jax.device_put(np.asarray(ct.polys[0].to_eval().rns,
                                      dtype=np.uint64).astype(np.uint32)),
            jax.device_put(np.asarray(ct.polys[1].to_eval().rns,
                                      dtype=np.uint64).astype(np.uint32)),
            lp.moduli)

    def download(self, dct: DeviceBGVCiphertext) -> BFVCiphertext:
        lp = DCRTParams(N=self.params.N, moduli=dct.moduli)
        c0 = np.asarray(jax.device_get(dct.c0)).astype(np.uint64)
        c1 = np.asarray(jax.device_get(dct.c1)).astype(np.uint64)
        return BFVCiphertext([DCRTPoly(lp, c0, True), DCRTPoly(lp, c1, True)],
                             self.params)

    def upload_batch(self, cts) -> DeviceBGVCiphertext:
        """Batch-first residency: towers stacked to [L, B, N]; the same jits
        amortize one compile across the batch (see
        CKKSDeviceContext.upload_batch)."""
        lp = cts[0].polys[0].params
        assert all(c.polys[0].params.moduli == lp.moduli for c in cts)

        def stack(k):
            return jax.device_put(np.stack(
                [np.asarray(c.polys[k].to_eval().rns,
                            dtype=np.uint64).astype(np.uint32) for c in cts],
                axis=1))

        return DeviceBGVCiphertext(stack(0), stack(1), lp.moduli)

    def download_batch(self, dct: DeviceBGVCiphertext) -> list:
        lp = DCRTParams(N=self.params.N, moduli=dct.moduli)
        c0 = np.asarray(jax.device_get(dct.c0)).astype(np.uint64)
        c1 = np.asarray(jax.device_get(dct.c1)).astype(np.uint64)
        return [BFVCiphertext([DCRTPoly(lp, c0[:, b], True),
                               DCRTPoly(lp, c1[:, b], True)], self.params)
                for b in range(c0.shape[1])]

    # -- homomorphic ops ----------------------------------------------------

    def eval_mult(self, a: DeviceBGVCiphertext,
                  b: DeviceBGVCiphertext) -> DeviceBGVCiphertext:
        """Tensor product -> t-noise hybrid relinearization -> BGV ModReduce,
        one jit per level chain (level consumed, like BGVRnsContext)."""
        assert a.moduli == b.moduli
        key = self._rlk[a.level_len]
        groups, rows = key.level_view(a.level_len)
        fn = build_mult_relin_rescale(self.params.N, a.moduli, key.p_moduli,
                                      groups, self.params.t, rows)
        c0, c1 = fn(a.c0, a.c1, b.c0, b.c1,
                    key.kb, key.kb_sh, key.ka, key.ka_sh)
        return DeviceBGVCiphertext(c0, c1, a.moduli[:-1])

    def eval_rotate(self, dct: DeviceBGVCiphertext,
                    steps: int) -> DeviceBGVCiphertext:
        key = self._gk[(steps, dct.level_len)]
        groups, rows = key.level_view(dct.level_len)
        k = rotation_automorphism_index(self.params.N, steps)
        fn = build_rotate(self.params.N, dct.moduli, key.p_moduli,
                          groups, k, self.params.t, rows)
        c0, c1 = fn(dct.c0, dct.c1, key.kb, key.kb_sh, key.ka, key.ka_sh)
        return DeviceBGVCiphertext(c0, c1, dct.moduli)

    def eval_add(self, a: DeviceBGVCiphertext,
                 b: DeviceBGVCiphertext) -> DeviceBGVCiphertext:
        assert a.moduli == b.moduli
        c0, c1 = build_add(a.moduli)(a.c0, a.c1, b.c0, b.c1)
        return DeviceBGVCiphertext(c0, c1, a.moduli)

    def eval_sub(self, a: DeviceBGVCiphertext,
                 b: DeviceBGVCiphertext) -> DeviceBGVCiphertext:
        assert a.moduli == b.moduli
        c0, c1 = build_add(a.moduli, sub=True)(a.c0, a.c1, b.c0, b.c1)
        return DeviceBGVCiphertext(c0, c1, a.moduli)
