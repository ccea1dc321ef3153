"""Fused Pallas TPU kernel for the RNS (two-prime) CGGI blind rotation.

TPU-native fast path for the accelerated 54-bit parameter sets (the fork's
EvalFunc/EvalSign/EvalFloor/EvalDecomp workloads, binfhecontext.cpp:70,95):
instead of emulating a single 54-bit prime with uint32-pair arithmetic
(ops/pallas_rotate64.py, ~46 VPU ops per modular multiply), the ring modulus
is the composite Q = q1*q2 of two ~27-bit NTT primes (params.from_gpu_style),
and the whole hot path — forward NTT, keyed external product, inverse NTT,
monomial rotation, accumulation — runs as two independent single-limb u32
lanes (~6 VPU ops per multiply, the same primitives as ops/pallas_rotate.py).

The only step that needs the positional (mod Q) value is the signed digit
decomposition at the top of each round; the two lanes are CRT-combined there
(Garner: x = r2 + q2 * ((r1 - r2) * q2^{-1} mod q1), one Shoup multiply and
one 32x32 product per coefficient) and the extracted signed digits are mapped
straight back into both lanes. Everything else stays lane-local because digit
decomposition is the *only* non-ring operation in the blind rotation
(rgsw-acc.cpp:57-111); NTT/rotation/accumulation commute with CRT.

Kernel structure mirrors ops/pallas_rotate.py: accumulator batch tile VMEM-
resident for all n rounds (grid = (batch_tiles, rounds)), per-round key slice
streamed by the Pallas pipeline, permutation-free DIF/DIT NTT, Harvey lazy
reduction with one Barrett reduce per external product. The streamed key
stores ONLY per-lane Shoup companions b' = floor(b*2^32/qi); values are
reconstructed in-kernel from b = hi32(b'*qi) + (lo32(b'*qi) != 0) — same
bandwidth trick (and the same bytes per round) as the two-limb kernel.

Bit-exact (after CRT) against ops/blindrotate64.py and the host oracle
running at the same composite Q.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import modmath32 as mm
from .ntt_sched import schedule
from .pallas_rotate import (_interpret_mode, _mulmod_lazy, _mulmod_lazy_tab, _roll, _cond_sub)

_Z = np.uint32(0)


def _pack_lane_tab(tab: np.ndarray, qi: int) -> np.ndarray:
    """[rows, N] uint64 -> [3, rows, N] uint32 (value, Shoup companion lo/hi
    16-bit halves — pre-split so the kernel's table multiplies skip two VPU
    ops each, see pallas_rotate._mulhi_presplit)."""
    t = np.asarray(tab, dtype=np.uint64)
    sh = mm.shoup(t, qi)
    return np.ascontiguousarray(np.stack(
        [t.astype(np.uint32), sh & np.uint32(0xFFFF), sh >> np.uint32(16)]))


def default_tiles() -> tuple[int, int]:
    """Kernel tiling (batch tile BT, inner sub-tile bt), overridable via
    TFHE_TPU_RNS_BT / TFHE_TPU_RNS_BTI for hardware retuning
    (scripts/tune_rns.py sweeps these on the TPU)."""
    import os
    return (int(os.environ.get("TFHE_TPU_RNS_BT", 256)),
            int(os.environ.get("TFHE_TPU_RNS_BTI", 32)))


@functools.lru_cache(maxsize=None)
def build_pallas_rotate_rns(N: int, q1: int, q2: int, base_g: int,
                            digits_g_eff: int, throw: int, n: int,
                            BT: int = 256, bt: int = 32):
    """Returns fn(acc1, acc2 [B,2,N] u32 (lanes mod q1, q2), a_idx [B,n] i32,
    bsk_sh [n, 8*d2, N] u32) -> (acc1, acc2).

    bsk_sh rows: lane-major — lane L (0 -> q1, 1 -> q2) occupies rows
    [L*4*d2, (L+1)*4*d2), row within a lane = ((key*2 + out)*d2 + 2*digit + j)
    of per-lane Shoup companions, DIF bit-reversed evaluation order.
    See pack_bsk_rns()."""
    assert q2 < q1 < (1 << 28)
    Q = q1 * q2
    d2 = 2 * digits_g_eff
    for qi in (q1, q2):
        assert (2 * qi - 1) * d2 < (1 << 32), "lazy external product overflow"
    logn = N.bit_length() - 1
    g_bits = base_g.bit_length() - 1
    g_mask = np.uint32(base_g - 1)
    g_half = np.int32(base_g >> 1)
    assert base_g <= (1 << 27) and (base_g >> 1) < q2
    hq = (np.uint32((Q >> 1) & 0xFFFFFFFF), np.uint32(Q >> 33))
    qp = (np.uint32(Q & 0xFFFFFFFF), np.uint32(Q >> 32))
    two_n_mask = np.int32(2 * N - 1)
    # Garner constant: q2^{-1} mod q1, with Shoup companion
    c12 = pow(q2, -1, q1)
    c12_sh = int((c12 << 32) // q1)
    uq2 = np.uint32(q2)

    tabs = []
    for qi in (q1, q2):
        sch = schedule(N, qi)
        fwd = np.concatenate([sch["twist"][None], sch["fwd_w"]], axis=0)
        inv = np.concatenate([sch["inv_w"], sch["untwist"][None]], axis=0)
        tabs.append((_pack_lane_tab(fwd, qi), _pack_lane_tab(inv, qi)))
    (twf1, twi1), (twf2, twi2) = tabs

    def make_kernel(bT: int, bti: int):
        def kernel(a1_in, a2_in, a_ref, bsk, twf1_r, twi1_r, twf2_r, twi2_r,
                   a1_out, a2_out):
            r = pl.program_id(1)

            @pl.when(r == 0)
            def _():
                a1_out[:] = a1_in[:]
                a2_out[:] = a2_in[:]

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
            odd = [((lane >> k) & 1) == 1 for k in range(logn)]

            def make_lane(qi: int, twf_ref, twi_ref, row_base: int):
                """Single-limb mod-qi helpers over [P, bt, N] u32 tensors —
                the same primitives as ops/pallas_rotate.py's kernel."""
                uq = np.uint32(qi)

                def tab(ref, k):
                    return (ref[0, k:k + 1].reshape(1, 1, N),
                            ref[1, k:k + 1].reshape(1, 1, N),
                            ref[2, k:k + 1].reshape(1, 1, N))

                # reconstruct this lane's key values from Shoup companions,
                # once per (round, tile): b = hi32(b'*qi) + (lo32(b'*qi) != 0)
                sh = bsk[0, row_base:row_base + 4 * d2]          # [4*d2, N]
                ekv = mm.mulhi32(sh, uq) + ((sh * uq) != _Z).astype(jnp.uint32)

                def fwd_ntt(x):
                    w, wlo, whi = tab(twf_ref, 0)
                    x = _mulmod_lazy_tab(x, w, wlo, whi, qi)
                    for k in range(logn):
                        h = N >> (k + 1)
                        m = logn - 1 - k
                        w, wlo, whi = tab(twf_ref, k + 1)
                        d = _roll(x, h, N) + np.uint32(2 * qi) - x
                        t = _mulmod_lazy_tab(d, w, wlo, whi, qi)
                        s = _cond_sub(x + _roll(x, -h, N), 2 * qi)
                        x = jnp.where(odd[m], t, s)
                    return x

                def inv_ntt(x):
                    for k in range(logn):
                        h = 1 << k
                        w, wlo, whi = tab(twi_ref, k)
                        t = _mulmod_lazy_tab(x, w, wlo, whi, qi)
                        y = jnp.where(odd[k],
                                      _roll(x, h, N) + np.uint32(2 * qi) - t,
                                      x + _roll(t, -h, N))
                        x = _cond_sub(y, 2 * qi)
                    w, wlo, whi = tab(twi_ref, logn)
                    x = _mulmod_lazy_tab(x, w, wlo, whi, qi)
                    return _cond_sub(x, qi)

                def neg_wrap(x, s: int):
                    wrap = x[..., N - s:]
                    wrap = jnp.where(wrap == 0, wrap, uq - wrap)
                    return jnp.concatenate([wrap, x[..., :N - s]], axis=-1)

                def rot_sub(c, idx):
                    out = c
                    for k in range(logn):
                        bit = ((idx >> k) & 1) == 1
                        out = jnp.where(bit, neg_wrap(out, 1 << k), out)
                    bit_n = ((idx >> logn) & 1) == 1
                    out = jnp.where(bit_n,
                                    jnp.where(out == 0, out, uq - out), out)
                    return mm.submod(out, c, qi)

                def ext_product(xh, l):
                    """xh [2,bt,N] lazy digit evals; returns [4,bt,N] lazy
                    partial external product for digit l."""
                    terms = []
                    for k2 in range(2):
                        for o in range(2):
                            acc_t = None
                            for j in range(2):
                                row = (k2 * 2 + o) * d2 + 2 * l + j
                                v = ekv[row:row + 1].reshape(1, 1, N)
                                s = sh[row:row + 1].reshape(1, 1, N)
                                p = _mulmod_lazy(xh[j:j + 1], v, s, qi)
                                acc_t = p if acc_t is None else acc_t + p
                            terms.append(acc_t)
                    return jnp.concatenate(terms, axis=0)

                return fwd_ntt, inv_ntt, rot_sub, ext_product

            lane1 = make_lane(q1, twf1_r, twi1_r, 0)
            lane2 = make_lane(q2, twf2_r, twi2_r, 4 * d2)

            # ---- pair (uint32 lo/hi) helpers for the CRT/decompose step ----
            def _addc(a, b):
                s = a + b
                return s, (s < a).astype(jnp.uint32)

            def _sub64(a, b):
                lo = a[0] - b[0]
                return lo, a[1] - b[1] - (a[0] < b[0]).astype(jnp.uint32)

            def _geq(a, b):
                return (a[1] > b[1]) | ((a[1] == b[1]) & (a[0] >= b[0]))

            def _sel(c, a, b):
                return jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1])

            def sra64(d, g: int):
                lo = (d[0] >> np.uint32(g)) | (d[1] << np.uint32(32 - g))
                hi = (d[1].astype(jnp.int32) >> g).astype(jnp.uint32)
                return lo, hi

            def extract(d):
                """Balanced base-G digit of a signed 64-bit pair."""
                rr = (d[0] & g_mask).astype(jnp.int32)
                rr = jnp.where(rr >= g_half, rr - np.int32(base_g), rr)
                rp = (rr.astype(jnp.uint32), (rr >> 31).astype(jnp.uint32))
                return rr, sra64(_sub64(d, rp), g_bits)

            def sub_body(sidx, carry):
                off = pl.multiple_of(sidx * bti, bti)
                r1 = a1_out[:, pl.ds(off, bti)]                 # [2,bt,N] < q1
                r2 = a2_out[:, pl.ds(off, bti)]                 # [2,bt,N] < q2
                # Garner CRT: x = r2 + q2 * ((r1 - r2) * q2^{-1} mod q1)
                diff = mm.submod(r1, r2, q1)                    # r2 < q2 < q1
                t = _cond_sub(_mulmod_lazy(diff, np.uint32(c12),
                                           np.uint32(c12_sh), q1), q1)
                lo, c = _addc(t * uq2, r2)
                x = (lo, mm.mulhi32(t, uq2) + c)                # pair in [0, Q)
                is_neg = _geq(x, hq)
                d = _sel(is_neg, _sub64(x, qp), x)              # centered pair

                for _ in range(throw):
                    _, d = extract(d)

                u1 = u2 = None                                   # [4,bt,N] lazy
                for l in range(digits_g_eff):
                    rr, d = extract(d)
                    neg = rr < 0
                    dl1 = jnp.where(neg, rr + np.int32(q1), rr).astype(jnp.uint32)
                    dl2 = jnp.where(neg, rr + np.int32(q2), rr).astype(jnp.uint32)
                    t1 = lane1[3](lane1[0](dl1), l)
                    t2 = lane2[3](lane2[0](dl2), l)
                    u1 = t1 if u1 is None else u1 + t1
                    u2 = t2 if u2 is None else u2 + t2

                c1 = lane1[1](mm.mod_u32(u1, q1))                # [4,bt,N]
                c2 = lane2[1](mm.mod_u32(u2, q2))
                idx_pos = a_ref[:, pl.ds(off, bti)]              # [1,bt,1]
                idx_neg = (np.int32(2 * N) - idx_pos) & two_n_mask
                upd1 = mm.addmod(lane1[2](c1[0:2], idx_pos),
                                 lane1[2](c1[2:4], idx_neg), q1)
                upd2 = mm.addmod(lane2[2](c2[0:2], idx_pos),
                                 lane2[2](c2[2:4], idx_neg), q2)
                a1_out[:, pl.ds(off, bti)] = mm.addmod(r1, upd1, q1)
                a2_out[:, pl.ds(off, bti)] = mm.addmod(r2, upd2, q2)
                return carry

            jax.lax.fori_loop(0, bT // bti, sub_body, 0)

        return kernel

    def rotate(acc1, acc2, a_idx, bsk_sh):
        B = acc1.shape[0]
        bT = min(BT, B)
        bti = min(bt, bT)
        assert B % bT == 0 and bT % bti == 0
        a1 = jnp.transpose(acc1, (1, 0, 2))
        a2 = jnp.transpose(acc2, (1, 0, 2))
        a_t = a_idx.T.reshape(n, B, 1)
        acc_spec = pl.BlockSpec((2, bT, N), lambda i, r: (0, i, 0),
                                memory_space=pltpu.VMEM)
        tab_spec = pl.BlockSpec((3, logn + 1, N), lambda i, r: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            make_kernel(bT, bti),
            grid=(B // bT, n),
            in_specs=[
                acc_spec, acc_spec,
                pl.BlockSpec((1, bT, 1), lambda i, r: (r, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8 * d2, N), lambda i, r: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                tab_spec, tab_spec, tab_spec, tab_spec,
            ],
            out_specs=(acc_spec, acc_spec),
            out_shape=(jax.ShapeDtypeStruct((2, B, N), jnp.uint32),
                       jax.ShapeDtypeStruct((2, B, N), jnp.uint32)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=_interpret_mode(),
        )(a1, a2, a_t, bsk_sh, twf1, twi1, twf2, twi2)
        return (jnp.transpose(out[0], (1, 0, 2)),
                jnp.transpose(out[1], (1, 0, 2)))

    return jax.jit(rotate)


def pack_bsk_rns(bsk_coeff: np.ndarray, q1: int, q2: int) -> np.ndarray:
    """Canonical coefficient-domain BSkey [n, 2(key), d2, 2(out), N] uint64
    mod Q=q1*q2 -> [n, 8*d2, N] uint32 of per-lane Shoup companions only
    (lane q1 rows then lane q2 rows), row ((key*2 + out)*d2 + 2*digit + j)
    within each lane, DIF bit-reversed evaluation order per lane."""
    from ..ref import ntt as ref_ntt

    n, _, d2, _, N = bsk_coeff.shape
    b = np.asarray(bsk_coeff, dtype=np.uint64)
    lanes = []
    for qi in (q1, q2):
        br = schedule(N, qi)["bitrev"]
        bh = ref_ntt.forward(b % np.uint64(qi), qi)[..., br]
        bh = np.swapaxes(bh, 2, 3)                  # [n, key, out, d2, N]
        lanes.append(mm.shoup(bh, qi).reshape(n, 4 * d2, N))
    return np.ascontiguousarray(np.concatenate(lanes, axis=1))
