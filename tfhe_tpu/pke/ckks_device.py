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
from ..ops import modmath32v as mv
from ..ops.nttl import NTTL
from .ckks_rns import (CKKSRnsContext, RnsHybridKey, _fbc_tables,
                       alpha_fixed_tables)
from .dcrt import DCRTParams, DCRTPoly
from .encoding import rotation_automorphism_index


def _u32(x) -> np.uint32:
    return np.uint32(x)


def _shoup_c(b: int, m: int) -> np.uint32:
    return np.uint32((int(b) << 32) // m)


def _bc_traced(x, ndim: int):
    """Broadcast a traced per-limb [L, N] (or [L]) constant against a
    stacked [L, ..., N] operand."""
    if x.ndim == 1:
        return x.reshape((x.shape[0],) + (1,) * (ndim - 1))
    return x.reshape((x.shape[0],) + (1,) * (ndim - 2) + (x.shape[-1],))


# -- traced building blocks --------------------------------------------------
#
# Every builder operates on LIMB-STACKED towers [L, ..., N] with
# vector-modulus arithmetic (ops/modmath32v) and the limb-stacked NTT
# (ops/nttl): the jit graph is O(log N + dnum * group) ops regardless of
# chain length L. The original per-limb Python loops emitted O(L)-times
# larger graphs, which put XLA compile time at minutes per level for
# bootstrap-depth chains.

def _make_fbc(src: tuple, dst: tuple):
    """Device HPS fast base conversion: stacked [s, ..., N] u32 rows over
    `src` -> [d, ..., N] over `dst`. Bit-identical to
    ckks_rns.fast_base_convert (shared integer fixed-point alpha)."""
    assert all(q < (1 << 31) for q in src + dst)
    F, shifts, t = alpha_fixed_tables(tuple(src))
    assert all(s == 0 for s in shifts) and 33 <= F <= 63
    inv, dhat, d_dst = _fbc_tables(tuple(src), tuple(dst))
    s_len = len(src)
    lm_s = mv.LimbModuli(tuple(src))
    lm_d = mv.LimbModuli(tuple(dst))
    inv32 = inv.astype(np.uint32)
    inv_sh = lm_s.shoup(inv32)
    t_c = [_u32(ti) for ti in t]
    dhat32 = dhat.astype(np.uint32)                     # [d, s]
    dhat_sh = lm_d.shoup(dhat32)
    d32 = d_dst.astype(np.uint32)
    d_sh = lm_d.shoup(d32)

    def fbc(rows):
        nd = rows.ndim
        y = mv.mulmod_shoup_v(rows, lm_s.bc(inv32, nd),
                              lm_s.bc(inv_sh, nd), lm_s)
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
        acc = None
        for i in range(s_len):
            term = mv.mulmod_shoup_v(mv.mod_u32_v(y[i][None], lm_d),
                                     lm_d.bc(dhat32[:, i], nd),
                                     lm_d.bc(dhat_sh[:, i], nd), lm_d)
            acc = term if acc is None else mv.addmod_v(acc, term, lm_d)
        corr = mv.mulmod_shoup_v(jnp.broadcast_to(alpha[None], acc.shape),
                                 lm_d.bc(d32, nd), lm_d.bc(d_sh, nd), lm_d)
        return mv.submod_v(acc, corr, lm_d)

    return fbc


def _make_keyswitch(N: int, lvl: tuple, p_moduli: tuple, groups: tuple,
                    t: int = 1, key_rows: tuple | None = None):
    """Hybrid key switch: coeff-form [L, N] rows of the switched poly ->
    (delta0, delta1) coeff-form rows over `lvl`. The key towers arrive as
    traced arguments [G, L_pq, N] with Shoup companions. `t` > 1 selects the
    BGV t-exact ModDown (subtract t*FBC([x*t^-1]_P), see
    ckks_rns.rns_hybrid_key_switch). `key_rows` selects the level's limb
    rows out of a FULL-chain key tower (the level-aware single-key scheme:
    the full key restricted to the level's limbs is the level key)."""
    pq = lvl + p_moduli
    n_q = len(lvl)
    lm_pq = mv.LimbModuli(tuple(pq))
    lm_lvl = mv.LimbModuli(tuple(lvl))
    lm_p = mv.LimbModuli(tuple(p_moduli))
    ntt_pq = NTTL(N, tuple(pq))
    fbcs = [_make_fbc(lvl[g0:g1], pq) for (g0, g1) in groups]
    fbc_p = _make_fbc(p_moduli, lvl)
    P = 1
    for m in p_moduli:
        P *= m
    pinv = np.array([pow(P % m, -1, m) for m in lvl], dtype=np.uint32)
    pinv_sh = lm_lvl.shoup(pinv)
    if t > 1:
        tinv = np.array([pow(t % p, -1, p) for p in p_moduli],
                        dtype=np.uint32)
        tinv_sh = lm_p.shoup(tinv)
        t_l = np.array([t % m for m in lvl], dtype=np.uint32)
        t_l_sh = lm_lvl.shoup(t_l)

    def moddown(rows):          # coeff [L_pq, ..., N] -> [L, ..., N]
        nd = rows.ndim
        x_p = rows[n_q:]
        if t > 1:
            x_p = mv.mulmod_shoup_v(x_p, lm_p.bc(tinv, nd),
                                    lm_p.bc(tinv_sh, nd), lm_p)
        conv = fbc_p(x_p)
        corr = conv if t == 1 else mv.mulmod_shoup_v(
            conv, lm_lvl.bc(t_l, nd), lm_lvl.bc(t_l_sh, nd), lm_lvl)
        diff = mv.submod_v(rows[:n_q], corr, lm_lvl)
        return mv.mulmod_shoup_v(diff, lm_lvl.bc(pinv, nd),
                                 lm_lvl.bc(pinv_sh, nd), lm_lvl)

    sel = None if key_rows is None else np.asarray(key_rows, dtype=np.int32)

    def precompute(c2c):
        """Digit groups of coeff rows [L, ..., N], FBC-extended to PQ and
        NTT'd — the key-independent (hoistable) half of the switch."""
        return [ntt_pq.forward(fbcs[g](c2c[g0:g1]))
                for g, (g0, g1) in enumerate(groups)]

    def ip(dps, kb, kb_sh, ka, ka_sh):
        """Inner product of precomputed eval digits with the key towers —
        result stays in the PQ basis, EVAL form (no ModDown): the lazy
        half that makes double-hoisted accumulation possible."""
        acc0 = acc1 = None
        for g in range(len(groups)):
            dp = dps[g]
            kbg, kbshg, kag, kashg = (
                (kb[g], kb_sh[g], ka[g], ka_sh[g]) if sel is None
                else (kb[g][sel], kb_sh[g][sel], ka[g][sel], ka_sh[g][sel]))
            t0 = mv.mulmod_shoup_v(dp, _bc_traced(kbg, dp.ndim),
                                   _bc_traced(kbshg, dp.ndim), lm_pq)
            t1 = mv.mulmod_shoup_v(dp, _bc_traced(kag, dp.ndim),
                                   _bc_traced(kashg, dp.ndim), lm_pq)
            acc0 = t0 if acc0 is None else mv.addmod_v(acc0, t0, lm_pq)
            acc1 = t1 if acc1 is None else mv.addmod_v(acc1, t1, lm_pq)
        return acc0, acc1

    def finish(acc0, acc1):
        """PQ eval accumulators -> ModDown'd coeff rows over `lvl`."""
        return (moddown(ntt_pq.inverse(acc0)),
                moddown(ntt_pq.inverse(acc1)))

    def inner(dps, kb, kb_sh, ka, ka_sh):
        """Inner product + ModDown — the per-key half."""
        return finish(*ip(dps, kb, kb_sh, ka, ka_sh))

    def ks(c2c, kb, kb_sh, ka, ka_sh):
        return inner(precompute(c2c), kb, kb_sh, ka, ka_sh)

    ks.precompute = precompute
    ks.inner = inner
    ks.ip = ip
    ks.finish = finish
    ks.lm_pq = lm_pq
    return ks


def _make_rescale(lvl: tuple, t: int = 1):
    """Coeff-form [L] rows -> [L-1] rows, scaling by 1/q_last (RNS ModReduce
    with the centered correction; same math as ckks_rns.rescale_rns). With
    `t` > 1 this is the BGV ModReduce instead: add the centered correction
    t*[-c*t^-1]_{q_last} before the exact division so the message mod t is
    preserved (bgv_rns.mod_reduce_rns)."""
    q_last = lvl[-1]
    keep = lvl[:-1]
    lm_k = mv.LimbModuli(tuple(keep))
    half = _u32(q_last // 2)
    inv = np.array([pow(q_last, -1, m) for m in keep], dtype=np.uint32)
    inv_sh = lm_k.shoup(inv)
    ql_mod = np.array([q_last % m for m in keep], dtype=np.uint32)

    if t == 1:
        def rescale(rows):
            nd = rows.ndim
            c_last = rows[-1][None]
            cl_m = mv.mod_u32_v(c_last, lm_k)
            cl = jnp.where(c_last > half,
                           mv.submod_v(cl_m, lm_k.bc(ql_mod, nd), lm_k), cl_m)
            diff = mv.submod_v(rows[:-1], cl, lm_k)
            return mv.mulmod_shoup_v(diff, lm_k.bc(inv, nd),
                                     lm_k.bc(inv_sh, nd), lm_k)

        return rescale

    tinv = pow(t % q_last, -1, q_last)
    tinv_c = (_u32(tinv), _shoup_c(tinv, q_last))
    t_k = np.array([t % m for m in keep], dtype=np.uint32)
    t_k_sh = lm_k.shoup(t_k)
    uql = _u32(q_last)

    def modreduce(rows):
        nd = rows.ndim
        c_last = rows[-1]
        v = jnp.where(c_last == 0, c_last, uql - c_last)     # -c mod q_last
        u = mm.mulmod_shoup(v, tinv_c[0], tinv_c[1], q_last)[None]
        u_m = mv.mod_u32_v(u, lm_k)
        u_c = jnp.where(u > half,
                        mv.submod_v(u_m, lm_k.bc(ql_mod, nd), lm_k), u_m)
        w = mv.mulmod_shoup_v(u_c, lm_k.bc(t_k, nd), lm_k.bc(t_k_sh, nd),
                              lm_k)
        s = mv.addmod_v(rows[:-1], w, lm_k)
        return mv.mulmod_shoup_v(s, lm_k.bc(inv, nd), lm_k.bc(inv_sh, nd),
                                 lm_k)

    return modreduce


@functools.lru_cache(maxsize=None)
def build_mult_relin_rescale(N: int, lvl: tuple, p_moduli: tuple,
                             groups: tuple, t: int = 1,
                             key_rows: tuple | None = None,
                             rescale: bool = True):
    """One jit: (a0,a1,b0,b1) eval [L,N] + relin key towers -> (c0,c1) eval
    [L-1,N]. Tensor product, relinearization, rescale — no host round trip
    (rns-leveledshe.cpp EvalMultCore + keyswitch-hybrid.cpp + ModReduce).
    `t` > 1 selects the BGV variants of the ModDown and ModReduce steps.
    `rescale=False` keeps the product at [L,N] / noise degree 2 — the lazy
    rescale of the automatic scaling techniques (ckks_auto_device.py)."""
    lm = mv.LimbModuli(tuple(lvl))
    ntt = NTTL(N, tuple(lvl))
    ntt_out = NTTL(N, tuple(lvl[:-1])) if rescale else None
    ks = _make_keyswitch(N, lvl, p_moduli, groups, t, key_rows)
    resc = _make_rescale(lvl, t) if rescale else None

    @jax.jit
    def mult(a0, a1, b0, b1, kb, kb_sh, ka, ka_sh):
        d0 = mv.barrett_mulmod_v(a0, b0, lm)
        d1 = mv.addmod_v(mv.barrett_mulmod_v(a0, b1, lm),
                         mv.barrett_mulmod_v(a1, b0, lm), lm)
        d2 = mv.barrett_mulmod_v(a1, b1, lm)
        s0, s1 = ks(ntt.inverse(d2), kb, kb_sh, ka, ka_sh)
        c0 = mv.addmod_v(ntt.inverse(d0), s0, lm)
        c1 = mv.addmod_v(ntt.inverse(d1), s1, lm)
        if rescale:
            return ntt_out.forward(resc(c0)), ntt_out.forward(resc(c1))
        return ntt.forward(c0), ntt.forward(c1)

    return mult


@functools.lru_cache(maxsize=None)
def build_rotate(N: int, lvl: tuple, p_moduli: tuple, groups: tuple, k: int,
                 t: int = 1, key_rows: tuple | None = None):
    """One jit per (level chain, Galois element): (c0,c1) eval [L,N] + galois
    key towers -> rotated (o0,o1) eval [L,N]."""
    lm = mv.LimbModuli(tuple(lvl))
    ntt = NTTL(N, tuple(lvl))
    ks = _make_keyswitch(N, lvl, p_moduli, groups, t, key_rows)
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

    def auto(rows):
        taken = jnp.take(rows, srcj, axis=-1)
        q = lm.bc(lm.q, rows.ndim)
        return jnp.where(flip & (taken != 0), q - taken, taken)

    @jax.jit
    def rot(c0, c1, kb, kb_sh, ka, ka_sh):
        c0a = auto(ntt.inverse(c0))
        c1a = auto(ntt.inverse(c1))
        d0, d1 = ks(c1a, kb, kb_sh, ka, ka_sh)
        o0 = mv.addmod_v(c0a, d0, lm)
        return ntt.forward(o0), ntt.forward(d1)

    return rot


@functools.lru_cache(maxsize=None)
def build_ks_precompute(N: int, lvl: tuple, p_moduli: tuple, groups: tuple):
    """One jit: c1 eval towers [L, ..., N] -> stacked hoisting digits
    [G, L_pq, ..., N] (eval form over PQ) — EvalFastRotationPrecompute on
    the device. Key-independent; reusable by every rotation of the same
    ciphertext."""
    ntt = NTTL(N, tuple(lvl))
    ks = _make_keyswitch(N, lvl, p_moduli, groups)

    @jax.jit
    def f(c1):
        return jnp.stack(ks.precompute(ntt.inverse(c1)))

    return f


@functools.lru_cache(maxsize=None)
def build_rotate_hoisted(N: int, lvl: tuple, p_moduli: tuple, groups: tuple,
                         k: int, t: int = 1, key_rows: tuple | None = None):
    """One jit: (c0, digits [G, L_pq, ..., N], key towers) -> rotated
    (c0', c1') eval towers. The automorphism is applied ENTIRELY in the
    evaluation domain as one static gather (the NTT-point permutation,
    ckks_rns.eval_auto_perm — modulus-independent), so the per-rotation
    cost is gathers + the key inner product + ModDown: no inverse NTT of
    the ciphertext, no digit decompose, no FBC, no forward NTTs of digits
    (EvalFastRotation, HS18 hoisting)."""
    from .ckks_rns import eval_auto_perm
    perm = jnp.asarray(eval_auto_perm(N, k, lvl[0]), dtype=jnp.int32)
    lm = mv.LimbModuli(tuple(lvl))
    ntt = NTTL(N, tuple(lvl))
    ks = _make_keyswitch(N, lvl, p_moduli, groups, t, key_rows)
    G = len(groups)

    @jax.jit
    def f(c0, dps, kb, kb_sh, ka, ka_sh):
        dps_k = [jnp.take(dps[g], perm, axis=-1) for g in range(G)]
        d0, d1 = ks.inner(dps_k, kb, kb_sh, ka, ka_sh)
        c0a = jnp.take(c0, perm, axis=-1)           # eval-domain automorphism
        return mv.addmod_v(c0a, ntt.forward(d0), lm), ntt.forward(d1)

    return f


@functools.lru_cache(maxsize=None)
def build_mult_plain(N: int, lvl: tuple, rescale: bool = True):
    """One jit: (c0, c1) eval towers x plaintext COEFF rows [L, N] ->
    plaintext-multiplied towers, optionally rescaled to [L-1]
    (EvalMultPlain + ModReduce). The plaintext NTT runs IN-GRAPH (stacked),
    so the host only supplies cheap per-limb residues — no host-side NTT
    per operation. Towers may carry a batch axis [L, B, N]; the plaintext
    broadcasts."""
    lm = mv.LimbModuli(tuple(lvl))
    ntt = NTTL(N, tuple(lvl))
    resc = _make_rescale(lvl) if rescale else None
    ntt_out = NTTL(N, tuple(lvl[:-1])) if rescale else None

    @jax.jit
    def f(c0, c1, pt_coeff):
        pt = ntt.forward(pt_coeff)
        out = []
        for c in (c0, c1):
            r = mv.barrett_mulmod_v(c, _bc_traced(pt, c.ndim), lm)
            if rescale:
                r = ntt_out.forward(resc(ntt.inverse(r)))
            out.append(r)
        return out[0], out[1]

    return f


@functools.lru_cache(maxsize=None)
def build_mult_scalar(N: int, lvl: tuple, rescale: bool = True):
    """One jit: towers x a per-limb scalar [L] (a big-integer constant's
    residues) -> scaled towers, optionally rescaled (EvalMultConst)."""
    lm = mv.LimbModuli(tuple(lvl))
    ntt = NTTL(N, tuple(lvl))
    resc = _make_rescale(lvl) if rescale else None
    ntt_out = NTTL(N, tuple(lvl[:-1])) if rescale else None

    @jax.jit
    def f(c0, c1, ks):
        out = []
        for c in (c0, c1):
            r = mv.barrett_mulmod_v(c, _bc_traced(ks, c.ndim), lm)
            if rescale:
                r = ntt_out.forward(resc(ntt.inverse(r)))
            out.append(r)
        return out[0], out[1]

    return f


@functools.lru_cache(maxsize=None)
def build_bsgs_inner(N: int, lvl: tuple, b: int):
    """One jit for a whole BSGS giant row: babies stacked on a new axis
    ([L, b, ..., N]) x their coeff-form diagonal plaintexts ([L, b, N],
    NTT'd in-graph) -> the exact mod-sum over the b terms. Replaces ~2b
    separate plain-mult + add dispatches per giant row with one call —
    the difference between thousands and dozens of kernel launches per
    CoeffsToSlots at production slot counts."""
    lm = mv.LimbModuli(tuple(lvl))
    ntt = NTTL(N, tuple(lvl))

    @jax.jit
    def f(p0, p1, c0, c1, ptP, ptC):
        outs = []
        ptPe = ntt.forward(ptP)
        ptCe = ntt.forward(ptC)
        for x, pt in ((p0, ptPe), (p1, ptPe), (c0, ptCe), (c1, ptCe)):
            pt_b = pt.reshape(pt.shape[:2] + (1,) * (x.ndim - 3)
                              + pt.shape[-1:]) if x.ndim > 3 else pt
            outs.append(mv.barrett_mulmod_v(x, pt_b, lm))
        acc0 = mv.addmod_v(outs[0], outs[2], lm)
        acc1 = mv.addmod_v(outs[1], outs[3], lm)
        r0 = acc0[:, 0]
        r1 = acc1[:, 0]
        for k in range(1, b):
            r0 = mv.addmod_v(r0, acc0[:, k], lm)
            r1 = mv.addmod_v(r1, acc1[:, k], lm)
        return r0, r1

    return f


@functools.lru_cache(maxsize=None)
def build_diag_inner(N: int, lvl: tuple, nb: int):
    """C-linear variant of build_bsgs_inner for the FFT-factored transforms
    (ckks_boot_fft.py): the grouped butterfly factors act on z alone — no
    conjugated half — so one jit mod-sums baby stacks [L, nb, ..., N]
    against their coeff-form diagonal plaintexts [L, nb, N]."""
    lm = mv.LimbModuli(tuple(lvl))
    ntt = NTTL(N, tuple(lvl))

    @jax.jit
    def f(p0, p1, pt):
        pte = ntt.forward(pt)
        pt_b = pte.reshape(pte.shape[:2] + (1,) * (p0.ndim - 3)
                           + pte.shape[-1:]) if p0.ndim > 3 else pte
        a0 = mv.barrett_mulmod_v(p0, pt_b, lm)
        a1 = mv.barrett_mulmod_v(p1, pt_b, lm)
        r0 = a0[:, 0]
        r1 = a1[:, 0]
        for k in range(1, nb):
            r0 = mv.addmod_v(r0, a0[:, k], lm)
            r1 = mv.addmod_v(r1, a1[:, k], lm)
        return r0, r1

    return f


@functools.lru_cache(maxsize=None)
def build_diag_factor_lazy(N: int, lvl: tuple, p_moduli: tuple,
                           groups: tuple, nb: int, elements: tuple,
                           key_rows: tuple | None = None):
    """One jit for a WHOLE grouped FFT-transform factor with double-hoisted
    giant steps (lazy ModDown — the BSGS-accumulation idea of the
    double/triple-hoisting line of work, cf. DM21/Lattigo): per giant row —
    fused diagonal sum over the `nb` baby stacks, rescale, coeff-domain
    automorphism, digit decompose/FBC and key inner product — with every
    row's keyed result ACCUMULATED IN THE EXTENDED PQ BASIS. One shared
    inverse PQ NTT + ModDown closes the factor, so the per-row cost drops
    to digits + inner products + gathers (the eager path pays a full
    ModDown and output NTT pair per giant).

    `elements`: the Galois element per giant row (1 = no rotation).
    `groups`/`key_rows` describe the POST-rescale level chain lvl[:-1].
    Args: baby stacks p0/p1 [L, nb, (B,) N] EVAL over lvl; plaintext
    stacks pt [Gg, L, nb, N] COEFF; per-giant key towers (4 lists).
    Returns (c0, c1) EVAL towers over lvl[:-1]."""
    lvl2 = lvl[:-1]
    lm = mv.LimbModuli(tuple(lvl))
    lm2 = mv.LimbModuli(tuple(lvl2))
    ntt = NTTL(N, tuple(lvl))
    ntt2 = NTTL(N, tuple(lvl2))
    resc = _make_rescale(lvl)
    ks = _make_keyswitch(N, lvl2, p_moduli, groups, 1, key_rows)

    def _auto(k):
        idx = (np.arange(N) * k) % (2 * N)
        tgt = idx % N
        src = np.zeros(N, dtype=np.int32)
        src[tgt] = np.arange(N)
        flip_at_tgt = np.zeros(N, dtype=bool)
        flip_at_tgt[tgt] = idx >= N
        return jnp.asarray(src), jnp.asarray(flip_at_tgt)

    autos = {k: _auto(k) for k in set(elements) if k != 1}

    @jax.jit
    def f(p0, p1, pt, kbs, kbshs, kas, kashs):
        # [Gg, L, nb, N] -> [L, Gg, nb, N]: the stacked NTT wants the limb
        # axis leading (twiddles broadcast over the trailing dims)
        pte = ntt.forward(jnp.moveaxis(pt, 0, 1))
        acc_c0 = acc_c1 = None                      # lvl2 coeff (unkeyed)
        acc_q0 = acc_q1 = None                      # PQ eval (keyed)
        for gi, k in enumerate(elements):
            ptg = pte[:, gi]
            ptg_b = ptg.reshape(ptg.shape[:2] + (1,) * (p0.ndim - 3)
                                + ptg.shape[-1:]) if p0.ndim > 3 else ptg
            a0 = mv.barrett_mulmod_v(p0, ptg_b, lm)
            a1 = mv.barrett_mulmod_v(p1, ptg_b, lm)
            r0 = a0[:, 0]
            r1 = a1[:, 0]
            for b in range(1, nb):
                r0 = mv.addmod_v(r0, a0[:, b], lm)
                r1 = mv.addmod_v(r1, a1[:, b], lm)
            r0c = resc(ntt.inverse(r0))             # coeff over lvl2
            r1c = resc(ntt.inverse(r1))
            if k == 1:
                acc_c0 = r0c if acc_c0 is None else \
                    mv.addmod_v(acc_c0, r0c, lm2)
                acc_c1 = r1c if acc_c1 is None else \
                    mv.addmod_v(acc_c1, r1c, lm2)
                continue
            srcj, flip = autos[k]
            q2 = lm2.bc(lm2.q, r0c.ndim)
            t0 = jnp.take(r0c, srcj, axis=-1)
            t0 = jnp.where(flip & (t0 != 0), q2 - t0, t0)
            t1 = jnp.take(r1c, srcj, axis=-1)
            t1 = jnp.where(flip & (t1 != 0), q2 - t1, t1)
            acc_c0 = t0 if acc_c0 is None else mv.addmod_v(acc_c0, t0, lm2)
            i0, i1 = ks.ip(ks.precompute(t1),
                           kbs[gi], kbshs[gi], kas[gi], kashs[gi])
            acc_q0 = i0 if acc_q0 is None else \
                mv.addmod_v(acc_q0, i0, ks.lm_pq)
            acc_q1 = i1 if acc_q1 is None else \
                mv.addmod_v(acc_q1, i1, ks.lm_pq)
        if acc_q0 is not None:
            d0, d1 = ks.finish(acc_q0, acc_q1)
            acc_c0 = mv.addmod_v(acc_c0, d0, lm2)
            acc_c1 = d1 if acc_c1 is None else mv.addmod_v(acc_c1, d1, lm2)
        return ntt2.forward(acc_c0), ntt2.forward(acc_c1)

    return f


@functools.lru_cache(maxsize=None)
def build_rescale_only(N: int, lvl: tuple):
    """One jit: towers [L, ..., N] -> [L-1, ..., N], RNS rescale by 1/q_last
    (standalone ModReduce)."""
    ntt = NTTL(N, tuple(lvl))
    ntt_out = NTTL(N, tuple(lvl[:-1]))
    resc = _make_rescale(lvl)

    @jax.jit
    def f(c0, c1):
        return (ntt_out.forward(resc(ntt.inverse(c0))),
                ntt_out.forward(resc(ntt.inverse(c1))))

    return f


@functools.lru_cache(maxsize=None)
def build_add_plain(N: int, lvl: tuple, sub: bool = False):
    """One jit: c0 + plaintext COEFF rows [L, N] (NTT'd in-graph) —
    EvalAddPlain for vector plaintexts; c1 passes through untouched."""
    lm = mv.LimbModuli(tuple(lvl))
    ntt = NTTL(N, tuple(lvl))
    op = mv.submod_v if sub else mv.addmod_v

    @jax.jit
    def f(c0, pt_coeff):
        pt = ntt.forward(pt_coeff)
        return op(c0, _bc_traced(pt, c0.ndim), lm)

    return f


@functools.lru_cache(maxsize=None)
def build_add_scalar(lvl: tuple):
    """One jit: c0 + per-limb scalar [L] (constant polynomial is constant in
    the evaluation domain) — EvalAddConst; c1 unchanged by the caller."""
    lm = mv.LimbModuli(tuple(lvl))

    @jax.jit
    def f(c0, ks):
        return mv.addmod_v(c0, _bc_traced(ks, c0.ndim), lm)

    return f


@functools.lru_cache(maxsize=None)
def build_add(lvl: tuple, sub: bool = False):
    op = mv.submod_v if sub else mv.addmod_v
    lm = mv.LimbModuli(tuple(lvl))

    @jax.jit
    def add(a0, a1, b0, b1):
        return op(a0, b0, lm), op(a1, b1, lm)

    return add


# -- context -----------------------------------------------------------------

@dataclass
class DeviceCKKSCiphertext:
    """Ciphertext resident on device: two [L, N] u32 eval-form towers."""
    c0: jax.Array
    c1: jax.Array
    scale: float
    moduli: tuple
    noise_deg: int = 1          # NoiseScaleDeg for the auto-scaling layer

    @property
    def level_len(self) -> int:
        return len(self.moduli)


class _PackedKey:
    """Device form of an RnsHybridKey: [G, L_pq, N] u32 towers with per-limb
    Shoup companions (the GPUSetup analogue for the pke stack). A FULL-chain
    key serves every level via `level_view` (static row slicing inside the
    jit; the level-aware single-key scheme of rns_hybrid_key_switch)."""

    __slots__ = ("kb", "kb_sh", "ka", "ka_sh", "p_moduli", "groups", "q_len")

    def level_view(self, n_l: int):
        """(clipped groups, key row indices) for a length-n_l level chain."""
        if n_l == self.q_len:
            return self.groups, None
        assert n_l < self.q_len
        groups = tuple((g0, min(g1, n_l))
                       for (g0, g1) in self.groups if g0 < n_l)
        rows = tuple(range(n_l)) + tuple(
            range(self.q_len, self.q_len + len(self.p_moduli)))
        return groups, rows

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
        self.q_len = len(key.q_moduli)


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

    def _load(self, store: dict, keyfn, keys) -> None:
        if isinstance(keys, dict):
            for lvl_len, key in keys.items():
                store[keyfn(lvl_len)] = _PackedKey(key)
        else:
            pk = _PackedKey(keys)       # ONE full-chain key, every level
            for lvl_len in range(2, pk.q_len + 1):
                store[keyfn(lvl_len)] = pk

    def load_relin_keys(self, keys) -> None:
        """Accepts the per-level dict OR a single full-chain RnsHybridKey
        (served to every level by static row slicing — L x less key
        material and keygen)."""
        self._load(self._rlk, lambda lv: lv, keys)

    def load_galois_keys(self, steps: int, keys) -> None:
        self._load(self._gk, lambda lv: (steps, lv), keys)

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
        groups, rows = key.level_view(a.level_len)
        fn = build_mult_relin_rescale(self.params.N, a.moduli, key.p_moduli,
                                      groups, 1, rows)
        c0, c1 = fn(a.c0, a.c1, b.c0, b.c1,
                    key.kb, key.kb_sh, key.ka, key.ka_sh)
        return DeviceCKKSCiphertext(c0, c1,
                                    a.scale * b.scale / a.moduli[-1],
                                    a.moduli[:-1])

    def eval_rotate(self, dct: DeviceCKKSCiphertext,
                    steps: int) -> DeviceCKKSCiphertext:
        key = self._gk[(steps, dct.level_len)]
        groups, rows = key.level_view(dct.level_len)
        k = rotation_automorphism_index(self.params.N, steps)
        fn = build_rotate(self.params.N, dct.moduli, key.p_moduli,
                          groups, k, 1, rows)
        c0, c1 = fn(dct.c0, dct.c1, key.kb, key.kb_sh, key.ka, key.ka_sh)
        return DeviceCKKSCiphertext(c0, c1, dct.scale, dct.moduli)

    def rotation_precompute(self, dct: DeviceCKKSCiphertext):
        """EvalFastRotationPrecompute: hoisting digits of dct's c1, device-
        resident [G, L_pq, ..., N]; serves every eval_rotate_hoisted of this
        ciphertext (keys must share the context's group layout — they do)."""
        some_key = next(iter(self._gk.values())) if self._gk else \
            self._rlk[dct.level_len]
        groups, _ = some_key.level_view(dct.level_len)
        fn = build_ks_precompute(self.params.N, dct.moduli,
                                 some_key.p_moduli, groups)
        return fn(dct.c1)

    def eval_rotate_hoisted(self, dct: DeviceCKKSCiphertext, steps: int,
                            precomp) -> DeviceCKKSCiphertext:
        """EvalFastRotation: rotation from a rotation_precompute — the
        whole per-rotation graph is gathers + key inner product + ModDown
        (bit-identical to eval_rotate; tests/test_fast_rotation_device.py)."""
        key = self._gk[(steps, dct.level_len)]
        groups, rows = key.level_view(dct.level_len)
        k = rotation_automorphism_index(self.params.N, steps)
        fn = build_rotate_hoisted(self.params.N, dct.moduli, key.p_moduli,
                                  groups, k, 1, rows)
        c0, c1 = fn(dct.c0, precomp, key.kb, key.kb_sh, key.ka, key.ka_sh)
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
