"""BinFHE scheme orchestration: gates, bootstrapping, functional bootstrapping.

Mirrors `BinFHEScheme` (`src/binfhe/lib/binfhe-base-scheme.cpp`). Every
operation here is natively *batched*: ciphertexts carry a leading batch
dimension and the accumulator core processes the whole batch on the active
backend (the analogue of the reference's GPU-vector overloads,
binfhe-base-scheme.cpp:598-1277). Scalar calls are batch-1.

The heavy steps — blind rotation (`EvalAcc`) and the fused
modswitch->keyswitch->modswitch (`MKMSwitch`, bootstrapping.cu:73-118) — are
delegated to a Backend (host oracle or JAX/TPU).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Protocol

import numpy as np

from . import lwe
from .params import BinFHEParams, Gate, Method
from .ref import modmath, ntt, rgsw
from .utils.profiling import profile_log, tic
from .utils.rng import BinFHERng


@dataclass
class BTKey:
    """RingGSWBTKey (binfhe-base-scheme.h:52-57): blind-rotation key + LWE
    switching key. `bsk_coeff` is the canonical coefficient-domain RGSW key:
    CGGI [n, 2, digitsG2, 2, N]; DM [n, baseR, digitsR, digitsG2, 2, N]."""
    bsk_coeff: np.ndarray
    ksk: lwe.LWESwitchingKey
    base_g: int
    sk_n: lwe.LWEPrivateKey | None = None  # kept for noise-analysis tooling


class Backend(Protocol):
    """Compute backend for the two device-heavy stages."""

    def setup(self, params: BinFHEParams, key: BTKey) -> None: ...

    def eval_acc(self, params: BinFHEParams, key: BTKey, acc_init: np.ndarray,
                 a_batch: np.ndarray, a_modulus: int) -> np.ndarray:
        """Blind rotation: acc_init [B, 2, N] coeff-domain mod Q; a_batch [B, n]
        mod a_modulus. Returns final accumulator [B, 2, N] coeff-domain."""
        ...

    def mkm_switch(self, params: BinFHEParams, key: BTKey, a_ext: np.ndarray,
                   b_ext: np.ndarray, fmod: int) -> lwe.LWECiphertext:
        """ModSwitch(Q->qKS) -> KeySwitch -> ModSwitch(qKS->fmod) on the
        extracted LWE ciphertexts (a_ext [B, N], b_ext [B] mod Q)."""
        ...


def key_gen(rng: BinFHERng, params: BinFHEParams, sk: lwe.LWEPrivateKey,
            sk_n: lwe.LWEPrivateKey | None = None,
            ksk: lwe.LWESwitchingKey | None = None,
            seeded_ksk: bool | None = None) -> BTKey:
    """Bootstrapping-key generation (binfhe-base-scheme.cpp:39-55).

    `sk_n`/`ksk` let a caller reuse an existing ring secret and its
    key-switching key: the KSK depends only on (sk, sk_n) and the LWE
    parameters, not on the gadget base, so one KSK can serve every BTKey of a
    multi-baseG map — and every *context* that shares (n, N, Q, qKS, baseKS)
    (the accelerated logQ 12..29 sets all do). The switching-key block is
    ~5 GB at production sizes; regenerating it per base is pure waste.

    `seeded_ksk` (None = env TFHE_TPU_SEEDED_KSK) selects the device-
    generated threefry switching key for the big power-of-two qKS sets."""
    import os

    p = params.lwe
    if sk_n is None:
        sk_n = lwe.key_gen(rng, p.N, p.Q)
    if ksk is None:
        use_seeded = seeded_ksk
        if use_seeded is None:
            use_seeded = os.environ.get(
                "TFHE_TPU_SEEDED_KSK", "") not in ("", "0")
        if (use_seeded and p.q_ks & (p.q_ks - 1) == 0
                and p.q_ks > (1 << 32)):
            ksk = lwe.key_switch_gen_seeded(rng, p, sk, sk_n)
        else:
            ksk = lwe.key_switch_gen(rng, p, sk, sk_n)
    sk_n_coeff = modmath.asarray(sk_n.s, p.Q)
    sk_n_ntt = ntt.forward(sk_n_coeff, p.Q)
    if params.rgsw.method == Method.GINX:
        bsk = rgsw.keygen_acc_cggi(rng, params.rgsw, sk_n_ntt, sk.s)
    else:
        bsk = rgsw.keygen_acc_dm(rng, params.rgsw, sk_n_ntt, sk.s)
    return BTKey(bsk_coeff=bsk, ksk=ksk, base_g=params.rgsw.base_g, sk_n=sk_n)


# ---------------------------------------------------------------------------
# accumulator initialisation (test polynomials)
# ---------------------------------------------------------------------------

def _gate_test_poly(params: BinFHEParams, gate: Gate, b: np.ndarray, q: int) -> np.ndarray:
    """Batched gate test polynomial (binfhe-base-scheme.cpp:437-489 and the
    batched variant 1087-1145): m[j*(2N/q)] = +-(Q/8+1) by window membership of
    (b - j) mod q in [q1, q1 + q/2)."""
    Q, N = params.lwe.Q, params.lwe.N
    q_half = q >> 1
    q1 = params.rgsw.gate_const(gate) % q
    q2 = (q1 + q_half) % q
    Q8 = Q // 8 + 1
    Q8neg = Q - Q8

    b = np.asarray(b, dtype=np.uint64).reshape(-1)
    j = np.arange(q_half, dtype=np.uint64)
    temp = (b[:, None] + np.uint64(q) - j[None, :]) % np.uint64(q)   # [B, q/2]
    if q1 < q2:
        in_win = (temp >= q1) & (temp < q2)
    else:
        in_win = ~((temp >= q2) & (temp < q1))
    vals = np.where(in_win, Q8neg, Q8)

    if (2 * N) % q:
        raise ValueError(
            f"ciphertext modulus q={q} must divide 2N={2 * N} for bootstrapping")
    factor = 2 * N // q
    m = _zeros_modQ((len(b), N), Q)
    m[:, j.astype(np.int64) * factor] = vals if m.dtype != object else vals.astype(object)
    return m


def _func_test_poly(params: BinFHEParams, b: np.ndarray, ct_mod: int, fmod: int,
                    f: Callable[[np.ndarray, int, int], np.ndarray]) -> np.ndarray:
    """Batched functional test polynomial (binfhe-base-scheme.cpp:1147-1192):
    m[j*(2N/ctMod)] = (Q // fmod) * f((b - j) mod ctMod, ctMod, fmod)."""
    Q, N = params.lwe.Q, params.lwe.N
    half = ct_mod >> 1
    b = np.asarray(b, dtype=np.uint64).reshape(-1)
    j = np.arange(half, dtype=np.uint64)
    temp = (b[:, None] + np.uint64(ct_mod) - j[None, :]) % np.uint64(ct_mod)
    fv = f(temp, ct_mod, fmod)                                        # [B, half]
    scale = Q // fmod
    if (2 * N) % ct_mod:
        raise ValueError(
            f"ciphertext modulus {ct_mod} must divide 2N={2 * N} for bootstrapping")
    factor = 2 * N // ct_mod
    m = _zeros_modQ((len(b), N), Q)
    if m.dtype == object:
        vals = np.empty(fv.shape, dtype=object)
        fl_in, fl_out = fv.ravel(), vals.ravel()
        for i, v in enumerate(fl_in):
            fl_out[i] = (scale * int(v)) % Q
        m[:, j.astype(np.int64) * factor] = vals
    else:
        m[:, j.astype(np.int64) * factor] = (np.uint64(scale) * fv.astype(np.uint64)) % np.uint64(Q)
    return m


def _zeros_modQ(shape, Q: int) -> np.ndarray:
    if Q < (1 << 31):
        return np.zeros(shape, dtype=np.uint64)
    out = np.empty(shape, dtype=object)
    out[...] = 0
    return out


def _acc_init(m_poly: np.ndarray) -> np.ndarray:
    """acc = (0, m) coefficient domain, [B, 2, N]."""
    B, N = m_poly.shape
    acc = np.zeros((B, 2, N), dtype=m_poly.dtype)
    if m_poly.dtype == object:
        acc[...] = 0
    acc[:, 1, :] = m_poly
    return acc


# ---------------------------------------------------------------------------
# core bootstraps
# ---------------------------------------------------------------------------

def _as_batch(ct: lwe.LWECiphertext) -> tuple[lwe.LWECiphertext, bool]:
    if ct.a.ndim == 1:
        return lwe.LWECiphertext(ct.a[None, :], np.asarray(ct.b).reshape(1), ct.modulus), True
    return ct, False


def _unbatch(ct: lwe.LWECiphertext, was_scalar: bool) -> lwe.LWECiphertext:
    if was_scalar:
        return lwe.LWECiphertext(ct.a[0], ct.b[0], ct.modulus)
    return ct


def bootstrap_gate_core(backend: Backend, params: BinFHEParams, gate: Gate,
                        key: BTKey, ct: lwe.LWECiphertext) -> np.ndarray:
    if key is None:
        raise RuntimeError("Bootstrapping keys have not been generated. "
                           "Please call bt_key_gen before calling bootstrapping.")
    m = _gate_test_poly(params, gate, ct.b, ct.modulus)
    acc = _acc_init(m)
    return backend.eval_acc(params, key, acc, ct.a, ct.modulus)


def _core_bootstrap(backend: Backend, params: BinFHEParams, key: BTKey,
                    m_poly: np.ndarray, ct: lwe.LWECiphertext, fmod: int,
                    add_q8: bool) -> lwe.LWECiphertext:
    """Accumulate + extract + switch, using the backend's fused on-device
    pipeline when it has one (no host round trip between the blind rotation
    and the key switch)."""
    acc = _acc_init(m_poly)
    if hasattr(backend, "bootstrap_pipeline"):
        return backend.bootstrap_pipeline(params, key, acc, ct.a, ct.modulus,
                                          fmod, add_q8)
    acc = backend.eval_acc(params, key, acc, ct.a, ct.modulus)
    return _extract_and_switch(backend, params, key, acc, fmod, add_q8)


def _extract_and_switch(backend: Backend, params: BinFHEParams, key: BTKey,
                        acc: np.ndarray, fmod: int, add_q8: bool) -> lwe.LWECiphertext:
    """Transpose the a-polynomial, extract the constant term of b, then run the
    fused modswitch->keyswitch->modswitch (binfhe-base-scheme.cpp:92-111,
    659-675)."""
    Q = params.lwe.Q
    a_t = rgsw.poly_transpose(acc[:, 0, :], Q)
    b = acc[:, 1, 0]
    if add_q8:
        q8 = (Q // 8 + 1)
        if acc.dtype == object:
            b = np.array([(int(x) + q8) % Q for x in b], dtype=object)
        else:
            b = (b + np.uint64(q8)) % np.uint64(Q)
    return backend.mkm_switch(params, key, a_t, b, fmod)


def eval_bin_gate(backend: Backend, params: BinFHEParams, gate: Gate, key: BTKey,
                  ct1: lwe.LWECiphertext, ct2: lwe.LWECiphertext) -> lwe.LWECiphertext:
    """Binary gate evaluation (binfhe-base-scheme.cpp:58-113, batched 598-677)."""
    ct1b, was_scalar = _as_batch(ct1)
    ct2b, _ = _as_batch(ct2)

    if gate in (Gate.XOR, Gate.XNOR):
        ct1n = eval_not(params, ct1b)
        ct2n = eval_not(params, ct2b)
        ct_and1 = eval_bin_gate(backend, params, Gate.AND, key, ct1b, ct2n)
        ct_and2 = eval_bin_gate(backend, params, Gate.AND, key, ct1n, ct2b)
        ct_or = eval_bin_gate(backend, params, Gate.OR, key, ct_and1, ct_and2)
        out = eval_not(params, ct_or) if gate == Gate.XNOR else ct_or
        return _unbatch(out, was_scalar)

    if key is None:
        raise RuntimeError("Bootstrapping keys have not been generated. "
                           "Please call bt_key_gen before calling bootstrapping.")
    neg2 = gate in (Gate.XOR_FAST, Gate.XNOR_FAST)
    gbp = getattr(backend, "gate_bootstrap_pair", None)
    if gbp is not None and ct1b.modulus == ct2b.modulus:
        # fused fast path: the LWE combination (ct1+ct2, or 2*(ct1-ct2) for
        # the FAST xor variants) runs inside the device graph — the host
        # never materializes a combined u64 batch
        out = gbp(params, key, gate, ct1b, ct2b, neg2, ct1b.modulus)
        if out is not None:
            return _unbatch(out, was_scalar)

    prep = ct1b.copy()
    if neg2:
        lwe.sub_eq(prep, ct2b)
        lwe.add_eq(prep, prep)
    else:
        lwe.add_eq(prep, ct2b)

    gb = getattr(backend, "gate_bootstrap", None)
    if gb is not None:
        out = gb(params, key, gate, prep, ct1b.modulus)
        if out is not None:
            return _unbatch(out, was_scalar)
    m = _gate_test_poly(params, gate, prep.b, prep.modulus)
    out = _core_bootstrap(backend, params, key, m, prep, ct1b.modulus, add_q8=True)
    return _unbatch(out, was_scalar)


def bootstrap(backend: Backend, params: BinFHEParams, key: BTKey,
              ct: lwe.LWECiphertext) -> lwe.LWECiphertext:
    """Fresh-noise bootstrap (binfhe-base-scheme.cpp:116-144): ct + q/4 through
    the AND test polynomial."""
    ctb, was_scalar = _as_batch(ct)
    prep = ctb.copy()
    lwe.add_const_eq(prep, ctb.modulus >> 2)
    gb = getattr(backend, "gate_bootstrap", None)
    if gb is not None:
        out = gb(params, key, Gate.AND, prep, ctb.modulus)
        if out is not None:
            return _unbatch(out, was_scalar)
    m = _gate_test_poly(params, Gate.AND, prep.b, prep.modulus)
    out = _core_bootstrap(backend, params, key, m, prep, ctb.modulus, add_q8=True)
    return _unbatch(out, was_scalar)


def eval_not(params: BinFHEParams, ct: lwe.LWECiphertext) -> lwe.LWECiphertext:
    """Key-free NOT (binfhe-base-scheme.cpp:147-159): a -> -a, b -> q/4 - b."""
    q = ct.modulus
    mq = np.uint64(q)
    a = (mq - ct.a) % mq
    b = (np.uint64(q >> 2) + mq - np.uint64(ct.b)) % mq
    return lwe.LWECiphertext(a, b, q)


# ---------------------------------------------------------------------------
# functional bootstrapping (https://eprint.iacr.org/2021/1337)
# ---------------------------------------------------------------------------

def check_input_function(lut: np.ndarray, mod: int) -> int:
    """0 = negacyclic, 1 = periodic, 2 = arbitrary (binfhe-base-scheme.cpp:162-186)."""
    lut = [int(x) for x in lut]
    half = len(lut) // 2
    if lut[0] == mod - lut[half]:
        for i in range(1, half):
            if lut[i] != mod - lut[half + i]:
                return 2
        return 0
    elif lut[0] == lut[half]:
        for i in range(1, half):
            if lut[i] != lut[half + i]:
                return 2
        return 1
    return 2


def bootstrap_func(backend: Backend, params: BinFHEParams, key: BTKey,
                   ct: lwe.LWECiphertext,
                   f: Callable[[np.ndarray, int, int], np.ndarray],
                   fmod: int) -> lwe.LWECiphertext:
    """General functional bootstrap (binfhe-base-scheme.cpp:494-592, batched
    1147-1277). No Q/8 offset is added to the extracted b."""
    if key is None:
        raise RuntimeError("Bootstrapping keys have not been generated. "
                           "Please call bt_key_gen before calling bootstrapping.")
    ctb, was_scalar = _as_batch(ct)
    fb = getattr(backend, "func_bootstrap", None)
    if fb is not None and (2 * params.lwe.N) % ctb.modulus == 0:
        # device fast path: ship the value table instead of host-built
        # accumulators — a shared [ctMod] table, or [B, ctMod] when f is a
        # per-ciphertext LUT closure (the multi-LUT overload,
        # binfhe-base-scheme.cpp:791-924)
        t = np.arange(ctb.modulus, dtype=np.uint64).reshape(1, -1)
        try:
            fv = np.asarray(f(t, ctb.modulus, fmod))
        except Exception:
            # any probe failure falls back to the host test-poly route
            fv = None
        if fv is not None:
            B = ctb.a.shape[0]
            if fv.size == ctb.modulus:
                fv = fv.reshape(-1)
            elif fv.ndim == 2 and fv.shape == (B, ctb.modulus):
                pass                                  # per-ct table
            else:
                fv = None
        if fv is not None:
            out = fb(params, key, fv, ctb, int(fmod))
            if out is not None:
                return _unbatch(out, was_scalar)
    m = _func_test_poly(params, ctb.b, ctb.modulus, fmod, f)
    out = _core_bootstrap(backend, params, key, m, ctb, fmod, add_q8=False)
    return _unbatch(out, was_scalar)


def _f0(x: np.ndarray, q: int, Q: int) -> np.ndarray:
    """1/4 q_small or -1/4 q_small mod q (binfhe-base-scheme.cpp:223-228)."""
    return np.where(x < (q // 2), np.uint64(Q - q // 4), np.uint64(q // 4))


def eval_func(backend: Backend, params: BinFHEParams, key: BTKey,
              ct: lwe.LWECiphertext, lut, beta: int,
              per_ct_luts: bool = False) -> lwe.LWECiphertext:
    """Arbitrary function evaluation (binfhe-base-scheme.cpp:190-269; batched
    679-924). `lut` is a [q]-entry table, or [B, q] when per_ct_luts (the
    GPU-only multi-LUT overload, binfhe-base-scheme.cpp:791-924)."""
    ctb, was_scalar = _as_batch(ct)
    q = ctb.modulus
    lut_arr = np.asarray(lut, dtype=np.uint64)
    first_lut = lut_arr[0] if per_ct_luts else lut_arr
    prop = check_input_function(first_lut, q)

    def lut_f(table_scale: int):
        def f(x, fq, fQ):
            x_idx = x.astype(np.int64)
            if per_ct_luts:
                return _lut_lookup_per_ct(lut_arr, x_idx, fq, fQ, table_scale)
            if table_scale == 1:  # negacyclic: direct lookup
                return lut_arr[x_idx]
            # periodic/arbitrary second bootstrap: fold to [0, q/2)
            return np.where(x_idx < fq // 2, lut_arr[x_idx % lut_arr.shape[-1]],
                            (np.uint64(fQ) - lut_arr[(x_idx - fq // 2) % lut_arr.shape[-1]]) % np.uint64(fQ))
        return f

    ct1 = ctb.copy()
    if prop == 0:
        lwe.add_const_eq(ct1, beta)
        out = bootstrap_func(backend, params, key, ct1, lut_f(1), q)
        return _unbatch(out, was_scalar)
    if prop == 2:
        N = params.lwe.N
        if q > N:
            raise NotImplementedError(
                "ciphertext modulus q needs to be <= ring dimension for arbitrary function evaluation")
        lut2 = np.concatenate([lut_arr, lut_arr], axis=-1)
        dq = q << 1
        ct1.set_modulus(dq)

        def f_lut2(x, fq, fQ):
            x_idx = x.astype(np.int64)
            if per_ct_luts:
                return _lut_lookup_per_ct(lut2, x_idx, fq, fQ, 2)
            return np.where(x_idx < fq // 2, lut2[x_idx % lut2.shape[-1]],
                            (np.uint64(fQ) - lut2[(x_idx - fq // 2) % lut2.shape[-1]]) % np.uint64(fQ))

        B = ctb.a.shape[0]
        fv0 = _probe_table(_f0, dq, dq, B)
        fv1 = _probe_table(f_lut2, dq, dq, B)
        if (_chain_mods_ok(backend, params, key, (), dq)
                and fv0 is not None and fv1 is not None):
            # both bootstraps + the inter-bootstrap fixups in-graph; one
            # upload, one download (binfhe-base-scheme.cpp:709-761)
            dct = backend.lwe_upload(ct1)
            c2 = backend.dev_add_const(dct, beta)
            c3 = backend.func_bootstrap_dev(params, key, fv0, c2, dq, dq)
            c3 = backend.dev_sub(dct, c3)           # ct3 = ct1 - ct3
            c3 = backend.dev_add_const(c3, beta)
            c3 = backend.dev_sub_const(c3, q >> 1)
            c4 = backend.func_bootstrap_dev(params, key, fv1, c3, dq, dq)
            out = backend.lwe_download(c4)
            out.set_modulus(q)
            return _unbatch(out, was_scalar)

        ct2 = ct1.copy()
        lwe.add_const_eq(ct2, beta)
        ct3 = bootstrap_func(backend, params, key, ct2, _f0, dq)
        ct3b, _ = _as_batch(ct3)
        lwe.sub_eq2(ct1, ct3b)            # ct3 = ct1 - ct3
        lwe.add_const_eq(ct3b, beta)
        lwe.sub_const_eq(ct3b, q >> 1)

        ct4 = bootstrap_func(backend, params, key, ct3b, f_lut2, dq)
        ct4b, _ = _as_batch(ct4)
        ct4b.set_modulus(q)
        return _unbatch(ct4b, was_scalar)

    # periodic
    B = ctb.a.shape[0]
    fv0 = _probe_table(_f0, q, q, B)
    fv1 = _probe_table(lut_f(2), q, q, B)
    if (_chain_mods_ok(backend, params, key, (), q)
            and fv0 is not None and fv1 is not None):
        dct = backend.lwe_upload(ctb)
        c1 = backend.dev_add_const(dct, beta)
        c2 = backend.func_bootstrap_dev(params, key, fv0, c1, q, q)
        c2 = backend.dev_sub(dct, c2)               # ct2 = ct - ct2
        c2 = backend.dev_add_const(c2, beta)
        c2 = backend.dev_sub_const(c2, q >> 2)
        out = backend.func_bootstrap_dev(params, key, fv1, c2, q, q)
        return _unbatch(backend.lwe_download(out), was_scalar)

    lwe.add_const_eq(ct1, beta)
    ct2 = bootstrap_func(backend, params, key, ct1, _f0, q)
    ct2b, _ = _as_batch(ct2)
    lwe.sub_eq2(ctb, ct2b)               # ct2 = ct - ct2
    lwe.add_const_eq(ct2b, beta)
    lwe.sub_const_eq(ct2b, q >> 2)
    out = bootstrap_func(backend, params, key, ct2b, lut_f(2), q)
    return _unbatch(out, was_scalar)


def _probe_table(f, ct_mod: int, fmod: int, B: int) -> np.ndarray | None:
    """Value table f(t) for t in [0, ctMod) — the same probe the
    func_bootstrap fast path runs; None when f is not table-expressible."""
    t = np.arange(ct_mod, dtype=np.uint64).reshape(1, -1)
    try:
        fv = np.asarray(f(t, ct_mod, fmod))
    except Exception:
        return None
    if fv.size == ct_mod:
        return fv.reshape(-1)
    if fv.ndim == 2 and fv.shape == (B, ct_mod):
        return fv
    return None


def _lut_lookup_per_ct(luts: np.ndarray, x_idx: np.ndarray, fq: int, fQ: int,
                       scale: int) -> np.ndarray:
    b_idx = np.arange(luts.shape[0])[:, None]
    if scale == 1:
        return luts[b_idx, x_idx]
    lo = luts[b_idx, x_idx % luts.shape[-1]]
    hi = (np.uint64(fQ) - luts[b_idx, (x_idx - fq // 2) % luts.shape[-1]]) % np.uint64(fQ)
    return np.where(x_idx < fq // 2, lo, hi)


def _floor_f2(x: np.ndarray, fq: int, fQ: int) -> np.ndarray:
    """Second EvalFloor test function (binfhe-base-scheme.cpp:286-301)."""
    x = x.astype(np.uint64)
    lo = (np.uint64(fQ) - np.uint64(fq // 2) - x)
    mid = x
    hi = (np.uint64(fQ) + np.uint64(fq // 2) - x)
    return np.where(x < fq // 4, lo, np.where(x < 3 * fq // 4, mid, hi))


def _sign_f3(x: np.ndarray, fq: int, fQ: int) -> np.ndarray:
    """Final EvalSign test function (binfhe-base-scheme.cpp:346-352)."""
    return np.where(x.astype(np.uint64) < fq // 2, np.uint64(fQ // 4),
                    np.uint64(fQ - fQ // 4))


def _mod_schedule(mod: int, q: int, beta: int) -> tuple[int, ...]:
    """Statically-derived modulus sequence of the EvalSign/EvalDecomp loop
    (binfhe-base-scheme.cpp:1016-1023): mod -> mod//q * 2*beta until <= q."""
    mods = [mod]
    while mods[-1] > q:
        mods.append(mods[-1] // q * 2 * beta)
    return tuple(mods)


def _dyn_base_switch(rgsw_p, keys: dict, mod: int, cur_key):
    """Dynamic gadget-base switch for timeOptimization key maps
    (binfhe-base-scheme.cpp:355-366; the reference tests EKs.size()==3 —
    here any multi-entry map participates so that schedule-restricted maps
    (context.bt_key_gen `bases`) behave identically where their bases
    coincide, and a missing target base keeps the current key)."""
    if len(keys) < 2:
        return cur_key
    bin_log = int(math.ceil(math.log2(mod)))
    base = 0
    if bin_log <= 17:
        base = 1 << 27
    elif bin_log <= 26:
        base = 1 << 18
    if base != 0 and base in keys:
        rgsw_p.change_base_g(base)
        return keys[base]
    return cur_key


def _chain_mods_ok(backend: Backend, params: BinFHEParams, keys,
                   mods: tuple[int, ...], q: int) -> bool:
    """Eligibility for the device-resident chain: backend support for every
    key involved, every bootstrap input modulus a power-of-two divisor of 2N
    within u16, and every chain modulus a power of two (the in-graph
    RoundqQ is then an exact shift — scheme moduli mod/q/2beta are all
    powers of two in the reference's accelerated configurations)."""
    import os
    if os.environ.get("TFHE_TPU_CHAIN", "") == "0":
        return False
    cs = getattr(backend, "chain_supported", None)
    if cs is None:
        return False
    if not isinstance(keys, dict):
        keys = {getattr(keys, "base_g", 0): keys}
    if not all(cs(params, k) for k in keys.values()):
        return False
    if (2 * params.lwe.N) % q or q > (1 << 16):
        return False
    return all(m & (m - 1) == 0 and m < (1 << 30) for m in mods)


def _eval_floor_dev(backend: Backend, params: BinFHEParams, key: BTKey,
                    dct, beta: int, q: int):
    """EvalFloor on a device-resident ciphertext: both bootstraps and the
    inter-bootstrap LWE arithmetic run in-graph; nothing returns to the host
    (the host-route glue — u64 copies, sub_eq, per-bootstrap tunnel round
    trips over [B, n] arrays — costs ~30% of EvalSign wall time)."""
    mod = dct.modulus
    ct1 = backend.dev_add_const(dct, beta)
    fv0 = _f0(np.arange(q, dtype=np.uint64), q, mod)
    ct2 = backend.func_bootstrap_dev(params, key, fv0, ct1, q, mod)
    ct1 = backend.dev_sub(ct1, ct2)
    fv2 = _floor_f2(np.arange(q, dtype=np.uint64), q, mod)
    ct3 = backend.func_bootstrap_dev(params, key, fv2, ct1, q, mod)
    return backend.dev_sub(ct1, ct3)


def eval_floor(backend: Backend, params: BinFHEParams, key: BTKey,
               ct: lwe.LWECiphertext, beta: int, roundbits: int = 0) -> lwe.LWECiphertext:
    """Homomorphic flooring: clears the low log2(q) bits (binfhe-base-scheme.cpp:272-309)."""
    ctb, was_scalar = _as_batch(ct)
    q = params.lwe.q if roundbits == 0 else beta * 2 * (1 << roundbits)
    mod = ctb.modulus

    if _chain_mods_ok(backend, params, key, (mod,), q):
        dct = backend.lwe_upload(ctb)
        out = backend.lwe_download(_eval_floor_dev(backend, params, key,
                                                   dct, beta, q))
        return _unbatch(out, was_scalar)

    t0 = tic()
    ct1 = ctb.copy()
    lwe.add_const_eq(ct1, beta)

    ct1_modq = ct1.copy()
    ct1_modq.set_modulus(q)
    profile_log("eval_floor host glue 1", t0)
    ct2 = bootstrap_func(backend, params, key, ct1_modq, _f0, mod)
    t0 = tic()
    ct2b, _ = _as_batch(ct2)
    lwe.sub_eq(ct1, ct2b)

    ct2_modq = ct1.copy()
    ct2_modq.set_modulus(q)
    profile_log("eval_floor host glue 2", t0)

    ct3 = bootstrap_func(backend, params, key, ct2_modq, _floor_f2, mod)
    t0 = tic()
    ct3b, _ = _as_batch(ct3)
    lwe.sub_eq(ct1, ct3b)
    profile_log("eval_floor host glue 3", t0)
    return _unbatch(ct1, was_scalar)


def eval_sign(backend: Backend, params: BinFHEParams, keys: dict[int, BTKey],
              ct: lwe.LWECiphertext, beta: int) -> lwe.LWECiphertext:
    """Large-precision sign (binfhe-base-scheme.cpp:312-372): EvalFloor loop with
    modulus shrink mod -> mod/q * 2*beta; with a 3-entry key map the gadget base
    switches dynamically (2^18 then 2^27) as the modulus shrinks."""
    ctb, was_scalar = _as_batch(ct)
    q = params.lwe.q
    mod = ctb.modulus
    rgsw_p = params.rgsw
    cur_base = rgsw_p.base_g
    cur_key = keys[cur_base]

    if _chain_mods_ok(backend, params, keys, _mod_schedule(mod, q, beta), q):
        dct = backend.lwe_upload(ctb)
        try:
            while mod > q:
                dct = _eval_floor_dev(backend, params, cur_key, dct, beta, q)
                mod = mod // q * 2 * beta
                dct = backend.dev_mod_switch(dct, mod)
                cur_key = _dyn_base_switch(rgsw_p, keys, mod, cur_key)
            dct = backend.dev_add_const(dct, beta)
            fv3 = _sign_f3(np.arange(mod, dtype=np.uint64), mod, q)
            dct = backend.func_bootstrap_dev(params, cur_key, fv3, dct,
                                             mod, q)
        finally:
            rgsw_p.change_base_g(cur_base)
        out = backend.lwe_download(backend.dev_sub_const(dct, q >> 2))
        return _unbatch(out, was_scalar)

    cttmp = ctb.copy()
    try:
        while mod > q:
            cttmp = eval_floor(backend, params, cur_key, cttmp, beta)
            t0 = tic()
            cttmp, _ = _as_batch(cttmp)
            mod = mod // q * 2 * beta
            cttmp = lwe.mod_switch(mod, cttmp)
            profile_log(f"eval_sign mod_switch -> {mod}", t0)
            cur_key = _dyn_base_switch(rgsw_p, keys, mod, cur_key)
        lwe.add_const_eq(cttmp, beta)

        out = bootstrap_func(backend, params, cur_key, cttmp, _sign_f3, q)
    finally:
        rgsw_p.change_base_g(cur_base)
    outb, _ = _as_batch(out)
    lwe.sub_const_eq(outb, q >> 2)
    return _unbatch(outb, was_scalar)


def eval_decomp(backend: Backend, params: BinFHEParams, keys: dict[int, BTKey],
                ct: lwe.LWECiphertext, beta: int) -> list[lwe.LWECiphertext]:
    """Digit decomposition of a large-precision ciphertext
    (binfhe-base-scheme.cpp:375-433)."""
    ctb, was_scalar = _as_batch(ct)
    q = params.lwe.q
    mod = ctb.modulus
    if mod <= q:
        raise ValueError("EvalDecomp is only for large precision")
    rgsw_p = params.rgsw
    cur_base = rgsw_p.base_g
    cur_key = keys[cur_base]

    if _chain_mods_ok(backend, params, keys, _mod_schedule(mod, q, beta), q):
        dct = backend.lwe_upload(ctb)
        digits = []
        try:
            while mod > q:
                digits.append(backend.dev_retag(dct, q))
                dct = _eval_floor_dev(backend, params, cur_key, dct, beta, q)
                mod = mod // q * 2 * beta
                dct = backend.dev_mod_switch(dct, mod)
                cur_key = _dyn_base_switch(rgsw_p, keys, mod, cur_key)
        finally:
            rgsw_p.change_base_g(cur_base)
        digits.append(dct)
        return [_unbatch(backend.lwe_download(d), was_scalar)
                for d in digits]

    cttmp = ctb.copy()
    ret: list[lwe.LWECiphertext] = []
    try:
        while mod > q:
            ctq = cttmp.copy()
            ctq.set_modulus(q)
            ret.append(_unbatch(ctq, was_scalar))
            cttmp = eval_floor(backend, params, cur_key, cttmp, beta)
            cttmp, _ = _as_batch(cttmp)
            mod = mod // q * 2 * beta
            cttmp = lwe.mod_switch(mod, cttmp)
            cur_key = _dyn_base_switch(rgsw_p, keys, mod, cur_key)
    finally:
        rgsw_p.change_base_g(cur_base)
    ret.append(_unbatch(cttmp, was_scalar))
    return ret
