"""Device-resident BEHZ BFV multiplication.

The BEHZ pipeline (pke/bfv_behz.py) is the all-integer RNS variant — every
step is a per-limb modular multiply, a cross-basis dot product, or a
centered select, with NO multi-word fixed-point rounding. That makes it the
most direct fit for the u32 tower kernels: this module runs the whole
EvalMult (Montgomery lift into Bsk, tensor product in both bases,
FastRNSFloor by t/Q, Shenoy-Kumaresan back-conversion, hybrid
relinearization) in ONE jit over limb-stacked [L, ..., N] towers,
bit-identical to the host BFVBehzContext on every input
(tests/test_bfv_behz_device.py). The reference's BEHZ path
(bfvrns-leveledshe.cpp EvalMult BEHZ branch + dcrtpoly.cpp
FastBaseConvqToBskMontgomery / FastRNSFloorq / FastBaseConvSK) is CPU-only.

The m̃ = 2^16 channel needs no modular magic at all: u32 products wrap mod
2^32, which is consistent mod 2^16 — one mask recovers the residue (the
same trick the reference gets from uint16_t overflow arithmetic).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import modmath32v as mv
from ..ops.nttl import NTTL
from .bfv_behz import MTILDE, _behz_tables, BFVBehzContext
from .bfv_device import BFVDeviceContext, DeviceBFVCiphertext
from .ckks_device import _make_keyswitch


def _make_lift_bsk(q_mods: tuple, bsk_mods: tuple, t: int):
    """Device FastBaseConvqToBskMontgomery: coeff [L, ..., N] over Q ->
    [numb+1, ..., N] over Bsk (representative in (-Q, Q), like the host)."""
    tabs = _behz_tables(tuple(q_mods), tuple(bsk_mods), t)
    (mqi, qhat_bsk, qhat_mt, neg_qinv_mt, q_bsk, mt_inv) = tabs[:6]
    lm_q = mv.LimbModuli(tuple(q_mods))
    lm_bsk = mv.LimbModuli(tuple(bsk_mods))
    assert all(m > MTILDE for m in bsk_mods)
    L = len(q_mods)
    mqi32 = mqi.astype(np.uint32)
    mqi_sh = lm_q.shoup(mqi32)
    qhat_bsk32 = qhat_bsk.astype(np.uint32)               # [bsk, L]
    qhat_bsk_sh = lm_bsk.shoup(qhat_bsk32)
    qhat_mt32 = (qhat_mt & np.uint64(MTILDE - 1)).astype(np.uint32)
    negq32 = np.uint32(neg_qinv_mt)
    q_bsk32 = q_bsk.astype(np.uint32)
    q_bsk_sh = lm_bsk.shoup(q_bsk32)
    mt_inv32 = mt_inv.astype(np.uint32)
    mt_inv_sh = lm_bsk.shoup(mt_inv32)
    m_minus_mt = (lm_bsk.q - np.uint32(MTILDE))           # centering offset
    mask = jnp.uint32(MTILDE - 1)

    def lift(rows):
        nd = rows.ndim
        y = mv.mulmod_shoup_v(rows, lm_q.bc(mqi32, nd),
                              lm_q.bc(mqi_sh, nd), lm_q)
        # r = -conv * Q^{-1} mod mtilde: u32 wrap is consistent mod 2^16
        r_m = jnp.sum((y & mask) * lm_q.bc(qhat_mt32, nd),
                      axis=0, dtype=jnp.uint32)
        r_m = (r_m * negq32) & mask                       # [..., N]
        high = r_m >= jnp.uint32(MTILDE // 2)
        acc = None
        for i in range(L):
            term = mv.mulmod_shoup_v(mv.mod_u32_v(y[i][None], lm_bsk),
                                     lm_bsk.bc(qhat_bsk32[:, i], nd),
                                     lm_bsk.bc(qhat_bsk_sh[:, i], nd), lm_bsk)
            acc = term if acc is None else mv.addmod_v(acc, term, lm_bsk)
        r_c = jnp.where(high[None], r_m[None] + lm_bsk.bc(m_minus_mt, nd),
                        r_m[None])                        # centered, < m
        acc = mv.addmod_v(acc, mv.mulmod_shoup_v(
            r_c, lm_bsk.bc(q_bsk32, nd), lm_bsk.bc(q_bsk_sh, nd), lm_bsk),
            lm_bsk)
        return mv.mulmod_shoup_v(acc, lm_bsk.bc(mt_inv32, nd),
                                 lm_bsk.bc(mt_inv_sh, nd), lm_bsk)

    return lift


def _make_floor(q_mods: tuple, bsk_mods: tuple, t: int):
    """Device FastRNSFloorq: coeff towers over Q and Bsk ->
    floor(t*x/Q) - u (u in [0, L)) over Bsk."""
    tabs = _behz_tables(tuple(q_mods), tuple(bsk_mods), t)
    t_qhatinv_q, qinv_bsk, t_qinv_bsk = tabs[6], tabs[7], tabs[8]
    lm_q = mv.LimbModuli(tuple(q_mods))
    lm_bsk = mv.LimbModuli(tuple(bsk_mods))
    L = len(q_mods)
    tq32 = t_qhatinv_q.astype(np.uint32)
    tq_sh = lm_q.shoup(tq32)
    qi32 = qinv_bsk.astype(np.uint32)                     # [bsk, L]
    qi_sh = lm_bsk.shoup(qi32)
    tqi32 = t_qinv_bsk.astype(np.uint32)
    tqi_sh = lm_bsk.shoup(tqi32)

    def floor(rows_q, rows_bsk):
        nd = rows_q.ndim
        y = mv.mulmod_shoup_v(rows_q, lm_q.bc(tq32, nd),
                              lm_q.bc(tq_sh, nd), lm_q)
        f = None
        for i in range(L):
            term = mv.mulmod_shoup_v(mv.mod_u32_v(y[i][None], lm_bsk),
                                     lm_bsk.bc(qi32[:, i], nd),
                                     lm_bsk.bc(qi_sh[:, i], nd), lm_bsk)
            f = term if f is None else mv.addmod_v(f, term, lm_bsk)
        tx = mv.mulmod_shoup_v(rows_bsk, lm_bsk.bc(tqi32, nd),
                               lm_bsk.bc(tqi_sh, nd), lm_bsk)
        return mv.submod_v(tx, f, lm_bsk)

    return floor


def _make_conv_sk(q_mods: tuple, bsk_mods: tuple, t: int):
    """Device FastBaseConvSK: coeff towers over Bsk -> over Q (exact for
    centered values in (-B*msk/2, B*msk/2))."""
    tabs = _behz_tables(tuple(q_mods), tuple(bsk_mods), t)
    bhatinv_b, bhat_q, bhat_msk, binv_msk, b_mod_q = tabs[9:14]
    b_mods = bsk_mods[:-1]
    msk = bsk_mods[-1]
    numb = len(b_mods)
    lm_q = mv.LimbModuli(tuple(q_mods))
    lm_b = mv.LimbModuli(tuple(b_mods))
    lm_m = mv.LimbModuli((msk,))
    bi32 = bhatinv_b.astype(np.uint32)
    bi_sh = lm_b.shoup(bi32)
    bq32 = bhat_q.astype(np.uint32)                       # [Lq, numb]
    bq_sh = lm_q.shoup(bq32)
    bm32 = bhat_msk.astype(np.uint32)
    bm_sh = lm_m.shoup(bm32[:, None])[:, 0]               # per-j scalars
    binv32 = np.uint32(binv_msk)
    binv_sh = np.uint32((int(binv_msk) << 32) // msk)
    msk_mod_q = np.array([msk % q for q in q_mods], dtype=np.uint32)
    bmodq32 = b_mod_q.astype(np.uint32)
    bmodq_sh = lm_q.shoup(bmodq32)
    half = np.uint32(msk // 2)

    def conv(rows_bsk):
        nd = rows_bsk.ndim
        z = mv.mulmod_shoup_v(rows_bsk[:numb], lm_b.bc(bi32, nd),
                              lm_b.bc(bi_sh, nd), lm_b)
        xq = None
        w = None
        for j in range(numb):
            zq = mv.mulmod_shoup_v(mv.mod_u32_v(z[j][None], lm_q),
                                   lm_q.bc(bq32[:, j], nd),
                                   lm_q.bc(bq_sh[:, j], nd), lm_q)
            xq = zq if xq is None else mv.addmod_v(xq, zq, lm_q)
            zm = mv.mulmod_shoup_v(mv.mod_u32_v(z[j][None], lm_m),
                                   jnp.uint32(bm32[j]),
                                   jnp.uint32(bm_sh[j]), lm_m)
            w = zm if w is None else mv.addmod_v(w, zm, lm_m)
        alpha = mv.mulmod_shoup_v(
            mv.submod_v(w, rows_bsk[numb:numb + 1], lm_m),
            jnp.uint32(binv32), jnp.uint32(binv_sh), lm_m)  # [1, ..., N]
        high = alpha[0] > half
        a_q = mv.mod_u32_v(jnp.broadcast_to(alpha, xq.shape), lm_q)
        a_c = jnp.where(high[None],
                        mv.submod_v(a_q, lm_q.bc(msk_mod_q, nd), lm_q), a_q)
        corr = mv.mulmod_shoup_v(a_c, lm_q.bc(bmodq32, nd),
                                 lm_q.bc(bmodq_sh, nd), lm_q)
        return mv.submod_v(xq, corr, lm_q)

    return conv


@functools.lru_cache(maxsize=None)
def build_bfv_behz_mult(N: int, q_mods: tuple, bsk_mods: tuple,
                        p_moduli: tuple, groups: tuple, t: int):
    """One jit: (a0,a1,b0,b1) eval [L,(B,)N] over Q + relin key towers ->
    (c0,c1). Lift into Bsk, tensor in Q and Bsk, t/Q floor, SK back to Q,
    relinearize (bfvrns-leveledshe.cpp EvalMult BEHZ branch, fused)."""
    lm_q = mv.LimbModuli(tuple(q_mods))
    lm_bsk = mv.LimbModuli(tuple(bsk_mods))
    ntt_q = NTTL(N, tuple(q_mods))
    ntt_bsk = NTTL(N, tuple(bsk_mods))
    lift = _make_lift_bsk(q_mods, bsk_mods, t)
    floor = _make_floor(q_mods, bsk_mods, t)
    conv_sk = _make_conv_sk(q_mods, bsk_mods, t)
    ks = _make_keyswitch(N, q_mods, p_moduli, groups)

    @jax.jit
    def mult(a0, a1, b0, b1, kb, kb_sh, ka, ka_sh):
        def extend(ev):
            """eval towers over Q -> (eval over Q, eval over Bsk)."""
            return ev, ntt_bsk.forward(lift(ntt_q.inverse(ev)))

        ea0, ea1 = extend(a0), extend(a1)
        eb0, eb1 = extend(b0), extend(b1)

        def tensor(x, y, z=None, w=None):
            pq = mv.barrett_mulmod_v(x[0], y[0], lm_q)
            pb = mv.barrett_mulmod_v(x[1], y[1], lm_bsk)
            if z is not None:
                pq = mv.addmod_v(pq, mv.barrett_mulmod_v(z[0], w[0], lm_q),
                                 lm_q)
                pb = mv.addmod_v(pb, mv.barrett_mulmod_v(z[1], w[1], lm_bsk),
                                 lm_bsk)
            return pq, pb

        def scale_back(pq, pb):
            fl = floor(ntt_q.inverse(pq), ntt_bsk.inverse(pb))
            return conv_sk(fl)

        d0c = scale_back(*tensor(ea0, eb0))
        d1c = scale_back(*tensor(ea0, eb1, ea1, eb0))
        d2c = scale_back(*tensor(ea1, eb1))
        s0, s1 = ks(d2c, kb, kb_sh, ka, ka_sh)
        c0 = mv.addmod_v(d0c, s0, lm_q)
        c1 = mv.addmod_v(d1c, s1, lm_q)
        return ntt_q.forward(c0), ntt_q.forward(c1)

    return mult


class BFVBehzDeviceContext(BFVDeviceContext):
    """BFV device offload with the BEHZ multiplication technique: wraps a
    BFVBehzContext; rotations, adds, and key residency are shared with the
    HPS device context (technique only reroutes EvalMult, like the
    reference)."""

    def __init__(self, behz_ctx: BFVBehzContext):
        assert isinstance(behz_ctx, BFVBehzContext)
        super().__init__(behz_ctx)
        assert all(m < (1 << 31) for m in behz_ctx.bsk_moduli)

    def eval_mult(self, a: DeviceBFVCiphertext,
                  b: DeviceBFVCiphertext) -> DeviceBFVCiphertext:
        assert a.moduli == b.moduli and self._rlk is not None
        key = self._rlk
        fn = build_bfv_behz_mult(self.params.N, a.moduli,
                                 tuple(self.rns.bsk_moduli), key.p_moduli,
                                 key.groups, self.params.t)
        c0, c1 = fn(a.c0, a.c1, b.c0, b.c1,
                    key.kb, key.kb_sh, key.ka, key.ka_sh)
        return DeviceBFVCiphertext(c0, c1, a.moduli)
