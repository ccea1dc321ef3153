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
from ..ops import modmath32v as mv
from ..ops.nttl import NTTL
from .bfv import BFVCiphertext
from .bfv_rns import (BFVRnsContext, _EXPAND_F, _NU_F, _expand_tables,
                      _fp_split, _scale_round_tables)
from .ckks_device import (_PackedKey, _make_keyswitch, _u32, build_add,
                          build_rotate)
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


def _make_pair_mod(lm: mv.LimbModuli):
    """(hi*2^32 + lo) mod q per limb: a limb-axis-free u32 pair broadcast
    into the stacked dst basis."""
    two32 = np.array([(1 << 32) % m for m in lm.moduli], dtype=np.uint32)
    two32_sh = lm.shoup(two32)

    def pair_mod(lo, hi, nd):
        h = mv.mulmod_shoup_v(mv.mod_u32_v(hi[None], lm),
                              lm.bc(two32, nd), lm.bc(two32_sh, nd), lm)
        return mv.addmod_v(h, mv.mod_u32_v(lo[None], lm), lm)

    return pair_mod


def _make_expand(src: tuple, dst: tuple):
    """Device exact-centered basis extension: stacked coeff [s, ..., N] u32
    rows -> [d, ..., N] (bfv_rns.expand_crt_basis, bit-identical;
    limb-stacked like the ckks_device builders)."""
    inv, alpha_words, dhat, d_dst = _expand_tables(tuple(src), tuple(dst))
    s_len = len(src)
    lm_s = mv.LimbModuli(tuple(src))
    lm_d = mv.LimbModuli(tuple(dst))
    inv32 = inv.astype(np.uint32)
    inv_sh = lm_s.shoup(inv32)
    dhat32 = dhat.astype(np.uint32)                     # [d, s]
    dhat_sh = lm_d.shoup(dhat32)
    d32 = d_dst.astype(np.uint32)
    d_sh = lm_d.shoup(d32)
    pair_mod = _make_pair_mod(lm_d)

    def expand(rows):
        nd = rows.ndim
        y = mv.mulmod_shoup_v(rows, lm_s.bc(inv32, nd),
                              lm_s.bc(inv_sh, nd), lm_s)
        ws = _fp_dot_words([y[i] for i in range(s_len)], alpha_words)
        a_lo, a_hi = _fp_round_shift(ws, _EXPAND_F)
        acc = None
        for i in range(s_len):
            term = mv.mulmod_shoup_v(mv.mod_u32_v(y[i][None], lm_d),
                                     lm_d.bc(dhat32[:, i], nd),
                                     lm_d.bc(dhat_sh[:, i], nd), lm_d)
            acc = term if acc is None else mv.addmod_v(acc, term, lm_d)
        corr = mv.mulmod_shoup_v(pair_mod(a_lo, a_hi, nd),
                                 lm_d.bc(d32, nd), lm_d.bc(d_sh, nd), lm_d)
        return mv.submod_v(acc, corr, lm_d)

    return expand


def _make_scale_round(q_mods: tuple, r_mods: tuple, t: int):
    """Device t/Q scale-and-round: coeff rows over QR -> rows over R
    (bfv_rns.scale_and_round, bit-identical)."""
    inv, omega, theta_words, t_rhat, t_r, alpha_words = _scale_round_tables(
        tuple(q_mods), tuple(r_mods), t)
    all_mods = tuple(q_mods) + tuple(r_mods)
    n_q, n_r = len(q_mods), len(r_mods)
    lm_all = mv.LimbModuli(all_mods)
    lm_r = mv.LimbModuli(tuple(r_mods))
    inv32 = inv.astype(np.uint32)
    inv_sh = lm_all.shoup(inv32)
    omega32 = np.array(omega, dtype=np.uint32)          # [r, q]
    omega_sh = lm_r.shoup(omega32)
    rhat32 = np.array(t_rhat, dtype=np.uint32)          # [r, r]
    rhat_sh = lm_r.shoup(rhat32)
    tr32 = np.array(t_r, dtype=np.uint32)
    tr_sh = lm_r.shoup(tr32)
    pair_mod = _make_pair_mod(lm_r)

    def scale_round(rows):
        nd = rows.ndim
        y = mv.mulmod_shoup_v(rows, lm_all.bc(inv32, nd),
                              lm_all.bc(inv_sh, nd), lm_all)
        a_lo, a_hi = _fp_round_shift(
            _fp_dot_words([y[k] for k in range(n_q + n_r)], alpha_words),
            _EXPAND_F)
        n_lo, n_hi = _fp_round_shift(
            _fp_dot_words([y[i] for i in range(n_q)], theta_words), _NU_F)
        acc = None
        for i in range(n_q):
            term = mv.mulmod_shoup_v(mv.mod_u32_v(y[i][None], lm_r),
                                     lm_r.bc(omega32[:, i], nd),
                                     lm_r.bc(omega_sh[:, i], nd), lm_r)
            acc = term if acc is None else mv.addmod_v(acc, term, lm_r)
        for jj in range(n_r):
            term = mv.mulmod_shoup_v(mv.mod_u32_v(y[n_q + jj][None], lm_r),
                                     lm_r.bc(rhat32[:, jj], nd),
                                     lm_r.bc(rhat_sh[:, jj], nd), lm_r)
            acc = mv.addmod_v(acc, term, lm_r)
        corr = mv.mulmod_shoup_v(pair_mod(a_lo, a_hi, nd),
                                 lm_r.bc(tr32, nd), lm_r.bc(tr_sh, nd), lm_r)
        acc = mv.submod_v(acc, corr, lm_r)
        return mv.addmod_v(acc, pair_mod(n_lo, n_hi, nd), lm_r)

    return scale_round


@functools.lru_cache(maxsize=None)
def build_bfv_mult(N: int, q_mods: tuple, r_mods: tuple, p_moduli: tuple,
                   groups: tuple, t: int):
    """One jit: (a0,a1,b0,b1) eval [L,N] over Q + relin key towers ->
    (c0,c1) eval [L,N]. Expansion to QR, tensor product, t/Q scale-round,
    switch back to Q, relinearize (bfvrns-leveledshe.cpp EvalMult +
    keyswitch-hybrid.cpp, fused on device)."""
    all_mods = tuple(q_mods) + tuple(r_mods)
    lm_q = mv.LimbModuli(tuple(q_mods))
    lm_qr = mv.LimbModuli(all_mods)
    ntt_q = NTTL(N, tuple(q_mods))
    ntt_r = NTTL(N, tuple(r_mods))
    ntt_qr = NTTL(N, all_mods)
    lift = _make_expand(q_mods, r_mods)
    scale_round = _make_scale_round(q_mods, r_mods, t)
    back = _make_expand(r_mods, q_mods)
    ks = _make_keyswitch(N, q_mods, p_moduli, groups)

    @jax.jit
    def mult(a0, a1, b0, b1, kb, kb_sh, ka, ka_sh):
        def extend(ev):
            """eval towers over Q -> eval towers over Q + R."""
            ext = lift(ntt_q.inverse(ev))
            return jnp.concatenate([ev, ntt_r.forward(ext)], axis=0)

        ea0, ea1 = extend(a0), extend(a1)
        eb0, eb1 = extend(b0), extend(b1)

        def tensor(x, y, z, w):
            # x*y (+ z*w) over the stacked QR towers
            p = mv.barrett_mulmod_v(x, y, lm_qr)
            if z is not None:
                p = mv.addmod_v(p, mv.barrett_mulmod_v(z, w, lm_qr), lm_qr)
            return p

        def scale_back(d_ev):
            return back(scale_round(ntt_qr.inverse(d_ev)))

        d0c = scale_back(tensor(ea0, eb0, None, None))
        d1c = scale_back(tensor(ea0, eb1, ea1, eb0))
        d2c = scale_back(tensor(ea1, eb1, None, None))
        s0, s1 = ks(d2c, kb, kb_sh, ka, ka_sh)
        c0 = mv.addmod_v(d0c, s0, lm_q)
        c1 = mv.addmod_v(d1c, s1, lm_q)
        return ntt_q.forward(c0), ntt_q.forward(c1)

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
