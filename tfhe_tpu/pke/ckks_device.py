"""Device-resident RNS-CKKS: the full homomorphic hot loop on the accelerator.

The round-2 device slice (pke/dcrt_device.py) offloaded tower primitives but
every composite operation still round-tripped through the host. This module
closes the loop — the capability the reference's pke stack never had on an
accelerator (its rns-leveledshe.cpp / keyswitch-hybrid.cpp are CPU-only):

- `eval_mult`: tensor product -> hybrid key-switch relinearization (per-group
  HPS fast base conversion, inner product with the key towers, ModDown by P)
  -> RNS rescale, all inside ONE jit per level chain; the ciphertext tower
  never leaves the device between operations.
- `eval_rotate`: coefficient-domain automorphism + hybrid key switch of the
  automorphed c1, one jit per (level, rotation step).
- `eval_add/sub`: pointwise residue arithmetic.

Everything is exact u32 arithmetic (limb moduli < 2^31 — the TPU's native
integer width; u64 multiplies silently truncate on this target), and the FBC
alpha correction uses the SAME integer fixed point as the host
(ckks_rns.alpha_fixed_tables), so device towers are bit-identical to the host
CKKSRnsContext on every input — tested in tests/test_ckks_device.py.

Reference parity anchors: rns-leveledshe.cpp (EvalMultCore/ModReduce),
keyswitch-hybrid.cpp:1-484 (KeySwitchCore/EvalKeySwitchPrecomputeCore),
ckksrns-leveledshe.cpp (EvalRotate).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import modmath32 as mm
from ..ops.ntt32 import NTT32
from .ckks_rns import (CKKSRnsContext, RnsHybridKey, _fbc_tables,
                       alpha_fixed_tables)
from .dcrt import DCRTParams, DCRTPoly
from .encoding import rotation_automorphism_index


def _u32(x) -> np.uint32:
    return np.uint32(x)


def _shoup_c(b: int, m: int) -> np.uint32:
    return np.uint32((int(b) << 32) // m)


# -- traced building blocks --------------------------------------------------

def _make_fbc(src: tuple, dst: tuple):
    """Device HPS fast base conversion: list of [N] u32 rows over `src` ->
    list over `dst`. Bit-identical to ckks_rns.fast_base_convert (shared
    integer fixed-point alpha)."""
    assert all(q < (1 << 31) for q in src + dst)
    F, shifts, t = alpha_fixed_tables(tuple(src))
    assert all(s == 0 for s in shifts) and 33 <= F <= 63
    inv, dhat, d_dst = _fbc_tables(tuple(src), tuple(dst))
    s_len = len(src)
    inv_c = [(_u32(inv[i]), _shoup_c(inv[i], src[i])) for i in range(s_len)]
    t_c = [_u32(ti) for ti in t]
    dhat_c = [[(_u32(dhat[j, i]), _shoup_c(dhat[j, i], m))
               for i in range(s_len)] for j, m in enumerate(dst)]
    d_c = [(_u32(d_dst[j]), _shoup_c(d_dst[j], m))
           for j, m in enumerate(dst)]

    def fbc(rows):
        y = [mm.mulmod_shoup(rows[i], inv_c[i][0], inv_c[i][1], src[i])
             for i in range(s_len)]
        # alpha = round(sum y_i/q_i): u32-pair fixed-point accumulation,
        # identical to the host's u64 computation (ckks_rns._fbc_alpha)
        lo = jnp.zeros_like(y[0])
        hi = jnp.zeros_like(y[0])
        for i in range(s_len):
            pl = y[i] * t_c[i]                     # wrapping low half
            ph = mm.mulhi32(y[i], t_c[i])
            lo2 = lo + pl
            hi = hi + ph + (lo2 < lo).astype(jnp.uint32)
            lo = lo2
        hi = hi + _u32(1 << (F - 33))              # + 2^(F-1), zero low word
        alpha = hi >> _u32(F - 32)                 # exact floor (see notes)
        out = []
        for j, m in enumerate(dst):
            acc = None
            for i in range(s_len):
                term = mm.mulmod_shoup(mm.mod_u32(y[i], m),
                                       dhat_c[j][i][0], dhat_c[j][i][1], m)
                acc = term if acc is None else mm.addmod(acc, term, m)
            corr = mm.mulmod_shoup(alpha, d_c[j][0], d_c[j][1], m)
            out.append(mm.submod(acc, corr, m))
        return out

    return fbc


def _make_keyswitch(N: int, lvl: tuple, p_moduli: tuple, groups: tuple,
                    t: int = 1):
    """Hybrid key switch: coeff-form [L, N] rows of the switched poly ->
    (delta0, delta1) coeff-form rows over `lvl`. The key towers arrive as
    traced arguments [G, L_pq, N] with Shoup companions. `t` > 1 selects the
    BGV t-exact ModDown (subtract t*FBC([x*t^-1]_P), see
    ckks_rns.rns_hybrid_key_switch)."""
    pq = lvl + p_moduli
    n_q = len(lvl)
    ntts = [NTT32(N, m) for m in pq]
    fbcs = [_make_fbc(lvl[g0:g1], pq) for (g0, g1) in groups]
    fbc_p = _make_fbc(p_moduli, lvl)
    P = 1
    for m in p_moduli:
        P *= m
    pinv_c = [(_u32(pow(P % m, -1, m)), _shoup_c(pow(P % m, -1, m), m))
              for m in lvl]
    if t > 1:
        tinv_c = [(_u32(pow(t % p, -1, p)), _shoup_c(pow(t % p, -1, p), p))
                  for p in p_moduli]
        t_c = [(_u32(t % m), _shoup_c(t % m, m)) for m in lvl]

    def moddown(rows):                      # coeff [L_pq] rows -> [L] rows
        if t > 1:
            x_p = [mm.mulmod_shoup(rows[n_q + j], tinv_c[j][0],
                                   tinv_c[j][1], p)
                   for j, p in enumerate(p_moduli)]
        else:
            x_p = rows[n_q:]
        conv = fbc_p(x_p)
        out = []
        for i, m in enumerate(lvl):
            corr = conv[i] if t == 1 else mm.mulmod_shoup(
                conv[i], t_c[i][0], t_c[i][1], m)
            diff = mm.submod(rows[i], corr, m)
            out.append(mm.mulmod_shoup(diff, pinv_c[i][0], pinv_c[i][1], m))
        return out

    def ks(c2c, kb, kb_sh, ka, ka_sh):
        acc0 = [None] * len(pq)
        acc1 = [None] * len(pq)
        for g, (g0, g1) in enumerate(groups):
            ext = fbcs[g]([c2c[i] for i in range(g0, g1)])
            for i, m in enumerate(pq):
                dp = ntts[i].forward(ext[i])
                t0 = mm.mulmod_shoup(dp, kb[g, i], kb_sh[g, i], m)
                t1 = mm.mulmod_shoup(dp, ka[g, i], ka_sh[g, i], m)
                acc0[i] = t0 if acc0[i] is None else mm.addmod(acc0[i], t0, m)
                acc1[i] = t1 if acc1[i] is None else mm.addmod(acc1[i], t1, m)
        d0 = moddown([ntts[i].inverse(acc0[i]) for i in range(len(pq))])
        d1 = moddown([ntts[i].inverse(acc1[i]) for i in range(len(pq))])
        return d0, d1

    return ks


def _make_rescale(lvl: tuple, t: int = 1):
    """Coeff-form [L] rows -> [L-1] rows, scaling by 1/q_last (RNS ModReduce
    with the centered correction; same math as ckks_rns.rescale_rns). With
    `t` > 1 this is the BGV ModReduce instead: add the centered correction
    t*[-c*t^-1]_{q_last} before the exact division so the message mod t is
    preserved (bgv_rns.mod_reduce_rns)."""
    q_last = lvl[-1]
    keep = lvl[:-1]
    half = _u32(q_last // 2)
    inv_c = [(_u32(pow(q_last, -1, m)), _shoup_c(pow(q_last, -1, m), m))
             for m in keep]
    ql_mod = [_u32(q_last % m) for m in keep]

    if t == 1:
        def rescale(rows):
            c_last = rows[-1]
            out = []
            for i, m in enumerate(keep):
                cl_m = mm.mod_u32(c_last, m)
                cl = jnp.where(c_last > half,
                               mm.submod(cl_m, ql_mod[i], m), cl_m)
                diff = mm.submod(rows[i], cl, m)
                out.append(mm.mulmod_shoup(diff, inv_c[i][0], inv_c[i][1], m))
            return out

        return rescale

    tinv = pow(t % q_last, -1, q_last)
    tinv_c = (_u32(tinv), _shoup_c(tinv, q_last))
    t_c = [(_u32(t % m), _shoup_c(t % m, m)) for m in keep]
    uql = _u32(q_last)

    def modreduce(rows):
        c_last = rows[-1]
        v = jnp.where(c_last == 0, c_last, uql - c_last)     # -c mod q_last
        u = mm.mulmod_shoup(v, tinv_c[0], tinv_c[1], q_last)
        out = []
        for i, m in enumerate(keep):
            u_m = mm.mod_u32(u, m)
            u_c = jnp.where(u > half, mm.submod(u_m, ql_mod[i], m), u_m)
            w = mm.mulmod_shoup(u_c, t_c[i][0], t_c[i][1], m)
            s = mm.addmod(rows[i], w, m)
            out.append(mm.mulmod_shoup(s, inv_c[i][0], inv_c[i][1], m))
        return out

    return modreduce


@functools.lru_cache(maxsize=None)
def build_mult_relin_rescale(N: int, lvl: tuple, p_moduli: tuple,
                             groups: tuple, t: int = 1):
    """One jit: (a0,a1,b0,b1) eval [L,N] + relin key towers -> (c0,c1) eval
    [L-1,N]. Tensor product, relinearization, rescale — no host round trip
    (rns-leveledshe.cpp EvalMultCore + keyswitch-hybrid.cpp + ModReduce).
    `t` > 1 selects the BGV variants of the ModDown and ModReduce steps."""
    ntts = [NTT32(N, m) for m in lvl]
    ks = _make_keyswitch(N, lvl, p_moduli, groups, t)
    rescale = _make_rescale(lvl, t)
    out_ntts = ntts[:-1]

    @jax.jit
    def mult(a0, a1, b0, b1, kb, kb_sh, ka, ka_sh):
        d0r, d1r, d2r = [], [], []
        for i, m in enumerate(lvl):
            d0r.append(mm.barrett_mulmod(a0[i], b0[i], m))
            d1r.append(mm.addmod(mm.barrett_mulmod(a0[i], b1[i], m),
                                 mm.barrett_mulmod(a1[i], b0[i], m), m))
            d2r.append(mm.barrett_mulmod(a1[i], b1[i], m))
        d2c = [ntts[i].inverse(d2r[i]) for i in range(len(lvl))]
        s0, s1 = ks(d2c, kb, kb_sh, ka, ka_sh)
        c0c = [mm.addmod(ntts[i].inverse(d0r[i]), s0[i], lvl[i])
               for i in range(len(lvl))]
        c1c = [mm.addmod(ntts[i].inverse(d1r[i]), s1[i], lvl[i])
               for i in range(len(lvl))]
        c0 = rescale(c0c)
        c1 = rescale(c1c)
        return (jnp.stack([out_ntts[i].forward(c0[i])
                           for i in range(len(lvl) - 1)]),
                jnp.stack([out_ntts[i].forward(c1[i])
                           for i in range(len(lvl) - 1)]))

    return mult


@functools.lru_cache(maxsize=None)
def build_rotate(N: int, lvl: tuple, p_moduli: tuple, groups: tuple, k: int,
                 t: int = 1):
    """One jit per (level chain, Galois element): (c0,c1) eval [L,N] + galois
    key towers -> rotated (o0,o1) eval [L,N]."""
    ntts = [NTT32(N, m) for m in lvl]
    ks = _make_keyswitch(N, lvl, p_moduli, groups, t)
    # a(X) -> a(X^k): out[(i*k) mod 2N] = +-a[i]; precompute the inverse
    # gather (src index per output slot) and the sign-flip mask
    idx = (np.arange(N) * k) % (2 * N)
    tgt = idx % N
    flip_at_tgt = np.zeros(N, dtype=bool)
    src = np.zeros(N, dtype=np.int32)
    src[tgt] = np.arange(N)
    flip_at_tgt[tgt] = idx >= N
    flip = jnp.asarray(flip_at_tgt)
    srcj = jnp.asarray(src)

    def auto(row, m):
        taken = jnp.take(row, srcj, axis=-1)
        return jnp.where(flip & (taken != 0), _u32(m) - taken, taken)

    @jax.jit
    def rot(c0, c1, kb, kb_sh, ka, ka_sh):
        c0a = [auto(ntts[i].inverse(c0[i]), m) for i, m in enumerate(lvl)]
        c1a = [auto(ntts[i].inverse(c1[i]), m) for i, m in enumerate(lvl)]
        d0, d1 = ks(c1a, kb, kb_sh, ka, ka_sh)
        o0 = [mm.addmod(c0a[i], d0[i], m) for i, m in enumerate(lvl)]
        return (jnp.stack([ntts[i].forward(o0[i]) for i in range(len(lvl))]),
                jnp.stack([ntts[i].forward(d1[i]) for i in range(len(lvl))]))

    return rot


@functools.lru_cache(maxsize=None)
def build_add(lvl: tuple, sub: bool = False):
    op = mm.submod if sub else mm.addmod

    @jax.jit
    def add(a0, a1, b0, b1):
        return (jnp.stack([op(a0[i], b0[i], m) for i, m in enumerate(lvl)]),
                jnp.stack([op(a1[i], b1[i], m) for i, m in enumerate(lvl)]))

    return add


# -- context -----------------------------------------------------------------

@dataclass
class DeviceCKKSCiphertext:
    """Ciphertext resident on device: two [L, N] u32 eval-form towers."""
    c0: jax.Array
    c1: jax.Array
    scale: float
    moduli: tuple

    @property
    def level_len(self) -> int:
        return len(self.moduli)


class _PackedKey:
    """Device form of an RnsHybridKey: [G, L_pq, N] u32 towers with per-limb
    Shoup companions (the GPUSetup analogue for the pke stack)."""

    __slots__ = ("kb", "kb_sh", "ka", "ka_sh", "p_moduli", "groups")

    def __init__(self, key: RnsHybridKey):
        pq = key.pq_params.moduli
        assert all(m < (1 << 31) for m in pq), \
            "device keyswitch needs all PQ limbs < 2^31 " \
            "(build the context with ks_limb_bits <= 30)"
        G, L_pq, N = len(key.bs), len(pq), key.pq_params.N
        kb = np.zeros((G, L_pq, N), dtype=np.uint32)
        ka = np.zeros((G, L_pq, N), dtype=np.uint32)
        kb_sh = np.zeros((G, L_pq, N), dtype=np.uint32)
        ka_sh = np.zeros((G, L_pq, N), dtype=np.uint32)
        for g in range(G):
            for i, m in enumerate(pq):
                b_row = np.asarray(key.bs[g].rns[i], dtype=np.uint64)
                a_row = np.asarray(key.as_[g].rns[i], dtype=np.uint64)
                kb[g, i] = b_row.astype(np.uint32)
                ka[g, i] = a_row.astype(np.uint32)
                kb_sh[g, i] = ((b_row << np.uint64(32)) // np.uint64(m)).astype(np.uint32)
                ka_sh[g, i] = ((a_row << np.uint64(32)) // np.uint64(m)).astype(np.uint32)
        self.kb = jax.device_put(kb)
        self.kb_sh = jax.device_put(kb_sh)
        self.ka = jax.device_put(ka)
        self.ka_sh = jax.device_put(ka_sh)
        self.p_moduli = key.p_moduli
        self.groups = tuple(tuple(g) for g in key.groups)


class CKKSDeviceContext:
    """Front door for the device offload: wraps a CKKSRnsContext (which must
    carry a sub-2^31-limb chain and ks_limb_bits <= 30), keeps relin/galois
    keys device-resident, and runs mult/rotate/add chains without the towers
    ever visiting the host."""

    def __init__(self, rns_ctx: CKKSRnsContext):
        assert all(m < (1 << 31) for m in rns_ctx.params.dcrt.moduli), \
            "device chain needs limb moduli < 2^31 (use limb_bits <= 30)"
        self.rns = rns_ctx
        self.params = rns_ctx.params
        self._rlk: dict[int, _PackedKey] = {}
        self._gk: dict[tuple[int, int], _PackedKey] = {}

    # -- key management ----------------------------------------------------

    def load_relin_keys(self, keys: dict) -> None:
        for lvl_len, key in keys.items():
            self._rlk[lvl_len] = _PackedKey(key)

    def load_galois_keys(self, steps: int, keys: dict) -> None:
        for lvl_len, key in keys.items():
            self._gk[(steps, lvl_len)] = _PackedKey(key)

    # -- transfers ----------------------------------------------------------

    def upload(self, ct) -> DeviceCKKSCiphertext:
        lp = ct.polys[0].params
        return DeviceCKKSCiphertext(
            jax.device_put(np.asarray(ct.polys[0].to_eval().rns,
                                      dtype=np.uint64).astype(np.uint32)),
            jax.device_put(np.asarray(ct.polys[1].to_eval().rns,
                                      dtype=np.uint64).astype(np.uint32)),
            ct.scale, lp.moduli)

    def download(self, dct: DeviceCKKSCiphertext):
        from .ckks import CKKSCiphertext
        lp = DCRTParams(N=self.params.N, moduli=dct.moduli)
        c0 = np.asarray(jax.device_get(dct.c0)).astype(np.uint64)
        c1 = np.asarray(jax.device_get(dct.c1)).astype(np.uint64)
        return CKKSCiphertext([DCRTPoly(lp, c0, True), DCRTPoly(lp, c1, True)],
                              dct.scale, self.params)

    def upload_batch(self, cts) -> DeviceCKKSCiphertext:
        """Batch-first residency: towers stacked to [L, B, N]. Every kernel
        in this module is written on the last axis (NTT32 takes any leading
        batch shape), so the same jits amortize one compile across the whole
        batch — the binfhe backend's batching discipline applied to pke,
        where the reference launches one CPU op per ciphertext."""
        lp = cts[0].polys[0].params
        assert all(c.polys[0].params.moduli == lp.moduli for c in cts)
        assert all(abs(c.scale - cts[0].scale) < 1e-6 * cts[0].scale
                   for c in cts)

        def stack(k):
            return jax.device_put(np.stack(
                [np.asarray(c.polys[k].to_eval().rns,
                            dtype=np.uint64).astype(np.uint32) for c in cts],
                axis=1))

        return DeviceCKKSCiphertext(stack(0), stack(1), cts[0].scale,
                                    lp.moduli)

    def download_batch(self, dct: DeviceCKKSCiphertext) -> list:
        from .ckks import CKKSCiphertext
        lp = DCRTParams(N=self.params.N, moduli=dct.moduli)
        c0 = np.asarray(jax.device_get(dct.c0)).astype(np.uint64)
        c1 = np.asarray(jax.device_get(dct.c1)).astype(np.uint64)
        return [CKKSCiphertext([DCRTPoly(lp, c0[:, b], True),
                                DCRTPoly(lp, c1[:, b], True)],
                               dct.scale, self.params)
                for b in range(c0.shape[1])]

    # -- homomorphic ops ----------------------------------------------------

    def eval_mult(self, a: DeviceCKKSCiphertext,
                  b: DeviceCKKSCiphertext) -> DeviceCKKSCiphertext:
        assert a.moduli == b.moduli
        key = self._rlk[a.level_len]
        fn = build_mult_relin_rescale(self.params.N, a.moduli, key.p_moduli,
                                      key.groups)
        c0, c1 = fn(a.c0, a.c1, b.c0, b.c1,
                    key.kb, key.kb_sh, key.ka, key.ka_sh)
        return DeviceCKKSCiphertext(c0, c1,
                                    a.scale * b.scale / a.moduli[-1],
                                    a.moduli[:-1])

    def eval_rotate(self, dct: DeviceCKKSCiphertext,
                    steps: int) -> DeviceCKKSCiphertext:
        key = self._gk[(steps, dct.level_len)]
        k = rotation_automorphism_index(self.params.N, steps)
        fn = build_rotate(self.params.N, dct.moduli, key.p_moduli,
                          key.groups, k)
        c0, c1 = fn(dct.c0, dct.c1, key.kb, key.kb_sh, key.ka, key.ka_sh)
        return DeviceCKKSCiphertext(c0, c1, dct.scale, dct.moduli)

    def eval_add(self, a: DeviceCKKSCiphertext,
                 b: DeviceCKKSCiphertext) -> DeviceCKKSCiphertext:
        assert a.moduli == b.moduli
        c0, c1 = build_add(a.moduli)(a.c0, a.c1, b.c0, b.c1)
        return DeviceCKKSCiphertext(c0, c1, a.scale, a.moduli)

    def eval_sub(self, a: DeviceCKKSCiphertext,
                 b: DeviceCKKSCiphertext) -> DeviceCKKSCiphertext:
        assert a.moduli == b.moduli
        c0, c1 = build_add(a.moduli, sub=True)(a.c0, a.c1, b.c0, b.c1)
        return DeviceCKKSCiphertext(c0, c1, a.scale, a.moduli)
