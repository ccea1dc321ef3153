"""BinFHEContext: the user-facing API of the TPU BinFHE framework.

Mirrors `BinFHEContext` (`src/binfhe/include/binfhecontext.h:58-445`,
`src/binfhe/lib/binfhecontext.cpp`): context generation (3 overloads), key
generation, encryption/decryption, scalar and batched gate/functional
evaluation, LUT generation, the ciphertext-matrix product, and device setup.

Differences from the reference, by design:
- every evaluation API accepts a single ciphertext *or* a batch (the scalar
  and `std::vector` overloads collapse into one),
- `device_setup()` replaces `GPUSetup()` and targets the JAX/TPU backend;
  without it, evaluation runs on the exact host oracle,
- serialization is numpy-`.npz` based (`tfhe_tpu.serial`), not cereal.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from . import lwe, params as params_mod, scheme
from .params import BinFHEParams, Gate, Method, ParamSet
from .ref.backend import RefBackend
from .utils.rng import BinFHERng


class BinFHEContext:
    def __init__(self, seed: int | None = None,
                 seeded_ksk: bool | None = None):
        """`seeded_ksk` opts the accelerated power-of-two-qKS sets into the
        device-generated switching key (lwe.SeededSwitchingKey: threefry A
        block regenerated+packed in-graph — ~140 s of host keygen becomes
        ~2 s of device work). None = decide from TFHE_TPU_SEEDED_KSK."""
        self.params: BinFHEParams | None = None
        self.rng = BinFHERng(seed)
        self.seeded_ksk = seeded_ksk
        self._bt_key: scheme.BTKey | None = None
        self._bt_key_map: dict[int, scheme.BTKey] = {}
        self._backend: scheme.Backend = RefBackend()
        self._time_optimization = False

    # -- context generation ------------------------------------------------

    def generate_binfhe_context(self, param_set: ParamSet | str,
                                method: Method = Method.GINX,
                                arb_func: bool | None = None,
                                log_q: int | None = None,
                                N: int = 0,
                                time_optimization: bool = False,
                                base_g: int = 0,
                                num_digits_to_throw: int = 0,
                                rns_modulus: bool | None = None) -> None:
        """Classic-table form when only (set, method) are given
        (binfhecontext.cpp:115-181); the batched/accelerated form when
        arb_func/log_q are provided (binfhecontext.cpp:51-113)."""
        if isinstance(param_set, str):
            param_set = ParamSet[param_set]
        if arb_func is None and log_q is None:
            self.params = params_mod.from_param_set(param_set, method)
            self._time_optimization = False
        else:
            self.params = params_mod.from_gpu_style(
                param_set, bool(arb_func), 11 if log_q is None else log_q, N,
                method, time_optimization, base_g, num_digits_to_throw,
                rns_modulus)
            self._time_optimization = time_optimization

    def generate_binfhe_context_custom(self, n: int, N: int, q: int, Q: int,
                                       std: float, base_ks: int, base_g: int,
                                       base_r: int, method: Method = Method.GINX) -> None:
        self.params = params_mod.from_custom(n, N, q, Q, std, base_ks, base_g, base_r, method)
        self._time_optimization = False

    # -- keys --------------------------------------------------------------

    def key_gen(self) -> lwe.LWEPrivateKey:
        p = self.params.lwe
        return lwe.key_gen(self.rng, p.n, p.q_ks)

    def key_gen_n(self) -> lwe.LWEPrivateKey:
        p = self.params.lwe
        return lwe.key_gen(self.rng, p.N, p.Q)

    def bt_key_gen(self, sk: lwe.LWEPrivateKey,
                   sk_n: lwe.LWEPrivateKey | None = None,
                   ksk: lwe.LWESwitchingKey | None = None,
                   bases: set[int] | None = None) -> None:
        """BTKeyGen (binfhecontext.cpp:224-246); with time_optimization, one key
        per gadget base in the sign-eval map — sharing one ring secret and one
        switching key across the map (the KSK is base-independent).

        `sk_n`/`ksk` allow reusing another context's ring secret + switching
        key when the LWE parameters match (all accelerated logQ configs share
        n=1305, N=2048, qKS=2^35 — one ~5 GB switching key serves them all).

        `bases` restricts the time_optimization map to the listed gadget
        bases (plus the default): EvalSign/EvalDecomp schedules at logQ <= 26
        statically never reach the 2^14 base, whose RGSW keygen is the most
        expensive of the map — the reference always generates all three
        (binfhecontext.cpp:229-237); the dynamic switch simply keeps the
        current base when a target is absent."""
        rgsw_p = self.params.rgsw
        temp = rgsw_p.base_g
        if self._time_optimization:
            for base in sorted(rgsw_p.g_power_map):
                if bases is not None and base != temp and base not in bases:
                    continue
                rgsw_p.change_base_g(base)
                key = scheme.key_gen(self.rng, self.params, sk, sk_n, ksk,
                                     seeded_ksk=self.seeded_ksk)
                sk_n, ksk = key.sk_n, key.ksk
                self._bt_key_map[base] = key
            rgsw_p.change_base_g(temp)
        if self._bt_key_map:
            self._bt_key = self._bt_key_map[temp]
        else:
            self._bt_key = scheme.key_gen(self.rng, self.params, sk, sk_n, ksk,
                                          seeded_ksk=self.seeded_ksk)
            self._bt_key_map[temp] = self._bt_key

    @property
    def bt_key(self) -> scheme.BTKey:
        return self._bt_key

    @property
    def bt_key_map(self) -> dict[int, scheme.BTKey]:
        return self._bt_key_map

    def bt_key_load(self, key: scheme.BTKey) -> None:
        self._bt_key = key
        self._bt_key_map[key.base_g] = key

    # -- encryption --------------------------------------------------------

    def encrypt(self, sk: lwe.LWEPrivateKey, m, output: str = "BOOTSTRAPPED",
                p: int = 4, mod: int | None = None) -> lwe.LWECiphertext:
        """LWE encryption (binfhecontext.cpp:193-206; note the reference's
        auto-bootstrap-after-encrypt is disabled there too). `m` may be an int
        or an array (batched)."""
        return lwe.encrypt(self.rng, self.params.lwe, sk, m, p, mod)

    def decrypt(self, sk: lwe.LWEPrivateKey, ct: lwe.LWECiphertext, p: int = 4):
        return lwe.decrypt(self.params.lwe, sk, ct, p)

    def decrypt_without_scale(self, sk: lwe.LWEPrivateKey, ct: lwe.LWECiphertext, p: int = 4):
        return lwe.decrypt_without_scale(self.params.lwe, sk, ct, p)

    def key_switch_gen(self, sk: lwe.LWEPrivateKey, sk_n: lwe.LWEPrivateKey) -> lwe.LWESwitchingKey:
        return lwe.key_switch_gen(self.rng, self.params.lwe, sk, sk_n)

    # -- evaluation --------------------------------------------------------

    def eval_bin_gate(self, gate: Gate, ct1: lwe.LWECiphertext,
                      ct2: lwe.LWECiphertext) -> lwe.LWECiphertext:
        return scheme.eval_bin_gate(self._backend, self.params, gate, self._bt_key, ct1, ct2)

    def bootstrap(self, ct: lwe.LWECiphertext) -> lwe.LWECiphertext:
        return scheme.bootstrap(self._backend, self.params, self._bt_key, ct)

    def eval_not(self, ct: lwe.LWECiphertext) -> lwe.LWECiphertext:
        return scheme.eval_not(self.params, ct)

    def eval_constant(self, value: bool) -> lwe.LWECiphertext:
        return lwe.noiseless_embedding(self.params.lwe, int(value))

    def eval_func(self, ct: lwe.LWECiphertext, lut, per_ct_luts: bool = False) -> lwe.LWECiphertext:
        return scheme.eval_func(self._backend, self.params, self._bt_key, ct,
                                lut, self.get_beta(), per_ct_luts)

    def eval_floor(self, ct: lwe.LWECiphertext, roundbits: int = 0) -> lwe.LWECiphertext:
        return scheme.eval_floor(self._backend, self.params, self._bt_key, ct,
                                 self.get_beta(), roundbits)

    def eval_sign(self, ct: lwe.LWECiphertext) -> lwe.LWECiphertext:
        keys = self._bt_key_map if self._bt_key_map else {self.params.rgsw.base_g: self._bt_key}
        return scheme.eval_sign(self._backend, self.params, keys, ct, self.get_beta())

    def eval_decomp(self, ct: lwe.LWECiphertext) -> list[lwe.LWECiphertext]:
        keys = self._bt_key_map if self._bt_key_map else {self.params.rgsw.base_g: self._bt_key}
        return scheme.eval_decomp(self._backend, self.params, keys, ct, self.get_beta())

    def ciphertext_mul_matrix(self, cts: lwe.LWECiphertext,
                              matrix: np.ndarray, modulus: int) -> lwe.LWECiphertext:
        """Batched LWE x integer-matrix product (lwe-operation.cu:50-141):
        K input ciphertexts x [K, M] int64 matrix -> M output ciphertexts,
        component-wise mod `modulus`. Runs on the accelerator (exact int8-limb
        MXU matmuls) when device_setup is active, else the exact host path."""
        from .ops.lweops import ciphertext_mul_matrix, ciphertext_mul_matrix_device
        if not isinstance(self._backend, RefBackend):
            return ciphertext_mul_matrix_device(cts, matrix, modulus)
        return ciphertext_mul_matrix(cts, matrix, modulus)

    # -- helpers -----------------------------------------------------------

    def get_beta(self) -> int:
        return self.params.beta

    def get_max_plaintext_space(self) -> int:
        return self.params.max_plaintext_space

    def get_params(self) -> BinFHEParams:
        return self.params

    def generate_lut_via_function(self, f: Callable[[int, int], int], p: int) -> np.ndarray:
        """LUT over Z_q from f: Z_p -> Z_p; p must be a power of two
        (binfhecontext.cpp:291-313)."""
        if p & (p - 1):
            raise NotImplementedError("Only support plaintext space to be power-of-two.")
        q = self.params.lwe.q
        interval = q // p
        lut = np.zeros(q, dtype=np.uint64)
        for i in range(q):
            v = int(f(i // interval, p))
            if v >= p:
                raise ValueError("input function should output in Z_{p_output}.")
            lut[i] = v * interval
        return lut

    # -- device management -------------------------------------------------

    def device_setup(self, num_devices: int = 0) -> None:
        """Move evaluation to the JAX/TPU backend (the analogue of GPUSetup,
        binfhecontext.cpp:349-360). Requires bt_key_gen first.

        Unlike the reference's GPUSetup (which rejects timeOptimization,
        binfhecontext.cpp:352-354), the multi-baseG key map is supported on
        device: keys are plain arrays, and each base's pipeline is set up
        lazily on first use by EvalSign/EvalDecomp."""
        if self._bt_key is None:
            raise RuntimeError("Need to call bt_key_gen before calling device_setup")
        from .ops.backend import JaxBackend
        self._backend = JaxBackend(num_devices=num_devices)
        temp = self.params.rgsw.base_g
        for base, key in (self._bt_key_map or {temp: self._bt_key}).items():
            self.params.rgsw.change_base_g(base)
            if base == temp:
                # eager pack+upload for the default base; non-default map
                # entries only VALIDATE here and pack lazily on first use —
                # EvalSign's schedule typically never touches the smallest
                # base, whose key is the largest pack of the map
                self._backend.setup(self.params, key)
            elif not self._backend.supports(self.params):
                self.params.rgsw.change_base_g(temp)
                raise NotImplementedError(
                    f"JaxBackend does not support key-map base 2^"
                    f"{base.bit_length() - 1} at these parameters")
        self.params.rgsw.change_base_g(temp)

    def device_clean(self) -> None:
        self._backend = RefBackend()

    def use_backend(self, backend: scheme.Backend) -> None:
        self._backend = backend

    # -- serialization (cereal analogue, utils/serial.h) ---------------------

    def save(self, path: str) -> None:
        """Serialize parameters + all bootstrapping keys to one .npz file."""
        from .utils import serial
        serial.save_context(path, self.params, self._bt_key, self._bt_key_map)

    @classmethod
    def load(cls, path: str, seed: int | None = None) -> "BinFHEContext":
        """Recreate a context (params + keys) from `save` output; the analogue
        of deserializing the cryptocontext + BTKeyLoad (binfhecontext.h:208-220,
        321-334)."""
        from .utils import serial
        cc = cls(seed)
        cc.params, keys = serial.load_context(path)
        cc._bt_key_map = keys
        if keys:
            base = cc.params.rgsw.base_g
            cc._bt_key = keys.get(base) or next(iter(keys.values()))
        cc._time_optimization = cc.params.time_optimization
        return cc
