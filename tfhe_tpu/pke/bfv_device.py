"""Device-resident RNS-BFV: the HPS multiplication pipeline on the
accelerator.

The BFV counterpart of pke/ckks_device.py — one jit runs the whole
EvalMult: exact centered expansion Q -> QR, tensor product over the
extended basis, t/Q scale-and-round into R, exact switch back to Q, and
hybrid relinearization; rotations and adds reuse the shared tower kernels.

Every rounding step (the expansion alpha, the fractional nu) is the SAME
u32-word integer fixed point as the host (bfv_rns._fp_round_dot: F=80 for
alpha, F=64 for nu), evaluated here with mulhi32 word products and
carry-propagated word sums — so device towers are bit-identical to the
host BFVRnsContext on every input (tests/test_bfv_device.py). The
reference's bfvrns stack (bfvrns-leveledshe.cpp ExpandCRTBasis /
ScaleAndRound) is CPU-only.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import modmath32 as mm
from ..ops.ntt32 import NTT32
from .bfv import BFVCiphertext
from .bfv_rns import (BFVRnsContext, _EXPAND_F, _NU_F, _expand_tables,
                      _fp_split, _scale_round_tables)
from .ckks_device import (_PackedKey, _make_keyswitch, _shoup_c, _u32,
                          build_add, build_rotate)
from .dcrt import DCRTParams, DCRTPoly
from .encoding import rotation_automorphism_index


def _pair_add(pair, x):
    """(lo, hi) u32 pair += u32 x, with carry."""
    lo = pair[0] + x
    return (lo, pair[1] + (lo < x).astype(jnp.uint32))


def _fp_dot_words(ys, words):
    """Word sums of sum_i y_i * t_i (t_i as three 32-bit words): returns the
    four folded 32-bit words of S — the device half of
    bfv_rns._fp_round_dot (both compute the exact integer S, so the folded
    words agree bit-for-bit)."""
    zero = jnp.zeros_like(ys[0])
    acc = [(zero, zero) for _ in range(4)]
    w0, w1, w2 = words
    for i, y in enumerate(ys):
        c0 = _u32(w0[i])
        p0l = y * c0
        acc[0] = _pair_add(acc[0], p0l)
        acc[1] = _pair_add(acc[1], mm.mulhi32(y, c0))
        if int(w1[i]):
            c1 = _u32(w1[i])
            acc[1] = _pair_add(acc[1], y * c1)
            acc[2] = _pair_add(acc[2], mm.mulhi32(y, c1))
        if int(w2[i]):
            c2 = _u32(w2[i])
            acc[2] = _pair_add(acc[2], y * c2)
            acc[3] = _pair_add(acc[3], mm.mulhi32(y, c2))
    ws = []
    carry = zero
    for k in range(4):
        lo = acc[k][0] + carry
        wrapped = (lo < carry).astype(jnp.uint32)
        ws.append(lo)
        carry = acc[k][1] + wrapped
    return ws


def _fp_round_shift(ws, F: int):
    """+ 2^(F-1) then >> F on the folded words: returns (lo, hi) u32 pair of
    the rounded value (hi is zero for every table in this module except
    nu's overflow word)."""
    k, r = divmod(F - 1, 32)
    inc = _u32(1 << r)
    for i in range(k, 3):
        ws[i] = ws[i] + inc
        inc = (ws[i] < inc).astype(jnp.uint32)
    ws[3] = ws[3] + inc
    kq, rq = divmod(F, 32)
    if rq == 0:
        lo, hi = ws[kq], ws[kq + 1] if kq + 1 <= 3 else jnp.zeros_like(ws[0])
    else:
        lo = (ws[kq] >> _u32(rq)) | (ws[kq + 1] << _u32(32 - rq))
        hi = (ws[kq + 1] >> _u32(rq)) if kq + 2 > 3 else \
            (ws[kq + 1] >> _u32(rq)) | (ws[kq + 2] << _u32(32 - rq))
    return lo, hi


def _pair_mod(lo, hi, m: int):
    """(hi*2^32 + lo) mod m for a u32 pair."""
    two32 = (1 << 32) % m
    c = (_u32(two32), _shoup_c(two32, m))
    return mm.addmod(mm.mulmod_shoup(mm.mod_u32(hi, m), c[0], c[1], m),
                     mm.mod_u32(lo, m), m)


def _make_expand(src: tuple, dst: tuple):
    """Device exact-centered basis extension: coeff [len(src)] u32 rows ->
    [len(dst)] rows (bfv_rns.expand_crt_basis, bit-identical)."""
    inv, alpha_words, dhat, d_dst = _expand_tables(tuple(src), tuple(dst))
    s_len = len(src)
    inv_c = [(_u32(inv[i]), _shoup_c(int(inv[i]), src[i]))
             for i in range(s_len)]
    dhat_c = [[(_u32(dhat[j, i]), _shoup_c(int(dhat[j, i]), m))
               for i in range(s_len)] for j, m in enumerate(dst)]
    d_c = [(_u32(d_dst[j]), _shoup_c(int(d_dst[j]), m))
           for j, m in enumerate(dst)]

    def expand(rows):
        y = [mm.mulmod_shoup(rows[i], inv_c[i][0], inv_c[i][1], src[i])
             for i in range(s_len)]
        ws = _fp_dot_words(y, alpha_words)
        a_lo, a_hi = _fp_round_shift(ws, _EXPAND_F)
        out = []
        for j, m in enumerate(dst):
            acc = None
            for i in range(s_len):
                term = mm.mulmod_shoup(mm.mod_u32(y[i], m),
                                       dhat_c[j][i][0], dhat_c[j][i][1], m)
                acc = term if acc is None else mm.addmod(acc, term, m)
            alpha_m = _pair_mod(a_lo, a_hi, m)
            corr = mm.mulmod_shoup(alpha_m, d_c[j][0], d_c[j][1], m)
            out.append(mm.submod(acc, corr, m))
        return out

    return expand


def _make_scale_round(q_mods: tuple, r_mods: tuple, t: int):
    """Device t/Q scale-and-round: coeff rows over QR -> rows over R
    (bfv_rns.scale_and_round, bit-identical)."""
    inv, omega, theta_words, t_rhat, t_r, alpha_words = _scale_round_tables(
        tuple(q_mods), tuple(r_mods), t)
    all_mods = tuple(q_mods) + tuple(r_mods)
    n_q = len(q_mods)
    inv_c = [(_u32(inv[k]), _shoup_c(int(inv[k]), all_mods[k]))
             for k in range(len(all_mods))]
    omega_c = [[(_u32(omega[j][i]), _shoup_c(int(omega[j][i]), r))
                for i in range(n_q)] for j, r in enumerate(r_mods)]
    rhat_c = [[(_u32(t_rhat[j][jj]), _shoup_c(int(t_rhat[j][jj]), r))
               for jj in range(len(r_mods))] for j, r in enumerate(r_mods)]
    tr_c = [(_u32(t_r[j]), _shoup_c(int(t_r[j]), r))
            for j, r in enumerate(r_mods)]

    def scale_round(rows):
        y = [mm.mulmod_shoup(rows[k], inv_c[k][0], inv_c[k][1], all_mods[k])
             for k in range(len(all_mods))]
        a_lo, a_hi = _fp_round_shift(_fp_dot_words(y, alpha_words), _EXPAND_F)
        n_lo, n_hi = _fp_round_shift(_fp_dot_words(y[:n_q], theta_words),
                                     _NU_F)
        out = []
        for j, r in enumerate(r_mods):
            acc = None
            for i in range(n_q):
                term = mm.mulmod_shoup(mm.mod_u32(y[i], r),
                                       omega_c[j][i][0], omega_c[j][i][1], r)
                acc = term if acc is None else mm.addmod(acc, term, r)
            for jj in range(len(r_mods)):
                term = mm.mulmod_shoup(mm.mod_u32(y[n_q + jj], r),
                                       rhat_c[j][jj][0], rhat_c[j][jj][1], r)
                acc = mm.addmod(acc, term, r)
            corr = mm.mulmod_shoup(_pair_mod(a_lo, a_hi, r),
                                   tr_c[j][0], tr_c[j][1], r)
            acc = mm.submod(acc, corr, r)
            out.append(mm.addmod(acc, _pair_mod(n_lo, n_hi, r), r))
        return out

    return scale_round


@functools.lru_cache(maxsize=None)
def build_bfv_mult(N: int, q_mods: tuple, r_mods: tuple, p_moduli: tuple,
                   groups: tuple, t: int):
    """One jit: (a0,a1,b0,b1) eval [L,N] over Q + relin key towers ->
    (c0,c1) eval [L,N]. Expansion to QR, tensor product, t/Q scale-round,
    switch back to Q, relinearize (bfvrns-leveledshe.cpp EvalMult +
    keyswitch-hybrid.cpp, fused on device)."""
    ntts_q = [NTT32(N, m) for m in q_mods]
    ntts_r = [NTT32(N, m) for m in r_mods]
    lift = _make_expand(q_mods, r_mods)
    scale_round = _make_scale_round(q_mods, r_mods, t)
    back = _make_expand(r_mods, q_mods)
    ks = _make_keyswitch(N, q_mods, p_moduli, groups)
    n_q, n_r = len(q_mods), len(r_mods)

    @jax.jit
    def mult(a0, a1, b0, b1, kb, kb_sh, ka, ka_sh):
        def extend(ev):
            """eval rows over Q -> eval rows over Q + R."""
            coeff = [ntts_q[i].inverse(ev[i]) for i in range(n_q)]
            ext = lift(coeff)
            return [ev[i] for i in range(n_q)] + \
                [ntts_r[j].forward(ext[j]) for j in range(n_r)]

        ea0, ea1 = extend(a0), extend(a1)
        eb0, eb1 = extend(b0), extend(b1)
        all_mods = q_mods + r_mods

        def tensor(x, y, z, w):
            # x*y + z*w per limb (z/w None -> plain product)
            rows = []
            for k, m in enumerate(all_mods):
                p = mm.barrett_mulmod(x[k], y[k], m)
                if z is not None:
                    p = mm.addmod(p, mm.barrett_mulmod(z[k], w[k], m), m)
                rows.append(p)
            return rows

        def scale_back(rows_ev):
            coeff = [ntts_q[i].inverse(rows_ev[i]) for i in range(n_q)] + \
                [ntts_r[j].inverse(rows_ev[n_q + j]) for j in range(n_r)]
            rows_r = scale_round(coeff)
            return back(rows_r)                       # coeff rows over Q

        d0c = scale_back(tensor(ea0, eb0, None, None))
        d1c = scale_back(tensor(ea0, eb1, ea1, eb0))
        d2c = scale_back(tensor(ea1, eb1, None, None))
        # the shared keyswitch is limb-stacked (one op across limbs)
        s0, s1 = ks(jnp.stack(d2c), kb, kb_sh, ka, ka_sh)
        c0 = [mm.addmod(d0c[i], s0[i], m) for i, m in enumerate(q_mods)]
        c1 = [mm.addmod(d1c[i], s1[i], m) for i, m in enumerate(q_mods)]
        return (jnp.stack([ntts_q[i].forward(c0[i]) for i in range(n_q)]),
                jnp.stack([ntts_q[i].forward(c1[i]) for i in range(n_q)]))

    return mult


@dataclass
class DeviceBFVCiphertext:
    """Ciphertext resident on device: two [L, N] u32 eval-form towers."""
    c0: jax.Array
    c1: jax.Array
    moduli: tuple


class BFVDeviceContext:
    """Front door for the BFV device offload: wraps a BFVRnsContext (which
    must carry a sub-2^31-limb chain and ks_limb_bits <= 30), keeps
    relin/galois keys device-resident, and runs mult/rotate/add chains
    without the towers ever visiting the host."""

    def __init__(self, rns_ctx: BFVRnsContext):
        self.rns = rns_ctx
        self.params = rns_ctx.params
        assert all(m < (1 << 31)
                   for m in self.params.dcrt.moduli + tuple(rns_ctx.r_moduli))
        self._rlk: _PackedKey | None = None
        self._gk: dict[int, _PackedKey] = {}

    def load_relin_key(self, key) -> None:
        self._rlk = _PackedKey(key)

    def load_galois_key(self, steps: int, key) -> None:
        self._gk[steps] = _PackedKey(key)

    def upload(self, ct: BFVCiphertext) -> DeviceBFVCiphertext:
        lp = ct.polys[0].params
        return DeviceBFVCiphertext(
            jax.device_put(np.asarray(ct.polys[0].to_eval().rns,
                                      dtype=np.uint64).astype(np.uint32)),
            jax.device_put(np.asarray(ct.polys[1].to_eval().rns,
                                      dtype=np.uint64).astype(np.uint32)),
            lp.moduli)

    def download(self, dct: DeviceBFVCiphertext) -> BFVCiphertext:
        lp = DCRTParams(N=self.params.N, moduli=dct.moduli)
        c0 = np.asarray(jax.device_get(dct.c0)).astype(np.uint64)
        c1 = np.asarray(jax.device_get(dct.c1)).astype(np.uint64)
        return BFVCiphertext([DCRTPoly(lp, c0, True), DCRTPoly(lp, c1, True)],
                             self.params)

    def upload_batch(self, cts) -> DeviceBFVCiphertext:
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

        return DeviceBFVCiphertext(stack(0), stack(1), lp.moduli)

    def download_batch(self, dct: DeviceBFVCiphertext) -> list:
        lp = DCRTParams(N=self.params.N, moduli=dct.moduli)
        c0 = np.asarray(jax.device_get(dct.c0)).astype(np.uint64)
        c1 = np.asarray(jax.device_get(dct.c1)).astype(np.uint64)
        return [BFVCiphertext([DCRTPoly(lp, c0[:, b], True),
                               DCRTPoly(lp, c1[:, b], True)], self.params)
                for b in range(c0.shape[1])]

    def eval_mult(self, a: DeviceBFVCiphertext,
                  b: DeviceBFVCiphertext) -> DeviceBFVCiphertext:
        assert a.moduli == b.moduli and self._rlk is not None
        key = self._rlk
        fn = build_bfv_mult(self.params.N, a.moduli,
                            tuple(self.rns.r_moduli), key.p_moduli,
                            key.groups, self.params.t)
        c0, c1 = fn(a.c0, a.c1, b.c0, b.c1,
                    key.kb, key.kb_sh, key.ka, key.ka_sh)
        return DeviceBFVCiphertext(c0, c1, a.moduli)

    def eval_rotate(self, dct: DeviceBFVCiphertext,
                    steps: int) -> DeviceBFVCiphertext:
        key = self._gk[steps]
        k = rotation_automorphism_index(self.params.N, steps)
        fn = build_rotate(self.params.N, dct.moduli, key.p_moduli,
                          key.groups, k)
        c0, c1 = fn(dct.c0, dct.c1, key.kb, key.kb_sh, key.ka, key.ka_sh)
        return DeviceBFVCiphertext(c0, c1, dct.moduli)

    def eval_add(self, a: DeviceBFVCiphertext,
                 b: DeviceBFVCiphertext) -> DeviceBFVCiphertext:
        assert a.moduli == b.moduli
        c0, c1 = build_add(a.moduli)(a.c0, a.c1, b.c0, b.c1)
        return DeviceBFVCiphertext(c0, c1, a.moduli)

    def eval_sub(self, a: DeviceBFVCiphertext,
                 b: DeviceBFVCiphertext) -> DeviceBFVCiphertext:
        assert a.moduli == b.moduli
        c0, c1 = build_add(a.moduli, sub=True)(a.c0, a.c1, b.c0, b.c1)
        return DeviceBFVCiphertext(c0, c1, a.moduli)
