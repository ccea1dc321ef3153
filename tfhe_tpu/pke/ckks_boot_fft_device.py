"""FFT-factored (levelBudget) CKKS bootstrapping on the accelerator.

Device run of pke/ckks_boot_fft.py: the grouped radix-2 butterfly factors
of CoeffsToSlots/SlotsToCoeffs evaluated through the device tower kernels,
with the baby rotations of each factor hoisted (one digit decomposition per
input — EvalFastRotation) and each factor's whole diagonal sum fused into
one jit (build_diag_inner). Handles the sparsely packed case (slots < N/2:
PartialSum fold, size-s' factors with tiled diagonals) exactly as the host
path does.

Beyond the reference twice over: its CKKS bootstrapping (ckksrns-fhe.cpp)
is CPU-only, and its levelBudget machinery was never ported to the GPU
fork either.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .ckks import encode
from .ckks_boot import galois_element, mod_raise
from .ckks_boot_fft import BootstrapFFTPrecom, DiagMatrix, fft_key_indices
from .ckks_boot_device import CKKSDeviceEvaluator
from .ckks_device import DeviceCKKSCiphertext, build_diag_inner
from .ckks_rns import CKKSRnsContext


class CKKSBootstrapFFTDevice(CKKSDeviceEvaluator):
    """Device bootstrap driver over the FFT-factored transforms."""

    def __init__(self, rns_ctx: CKKSRnsContext, pre: BootstrapFFTPrecom):
        super().__init__(rns_ctx)
        self.pre = pre

    def keygen(self, sk) -> None:
        """Relin + Galois keys for the factored rotation plan
        (FindBootstrapRotationIndices ∪ conjugation ∪ PartialSum)."""
        self.dctx.load_relin_keys(self.rns.relin_key_gen_single(sk))
        self.load_galois_elements(sk, fft_key_indices(self.ctx, self.pre))

    # -- one grouped factor --------------------------------------------------

    def _diag_row_pt(self, tag, g: DiagMatrix, gg: int, n_l: int,
                     scale_mul: float, plain_scale: float | None = None):
        """Stacked coeff-form plaintexts [L, nb, N] for giant row gg:
        row k holds roll(tile(diag), gg) for the plan entries whose baby is
        g.babies[k]; zeros elsewhere. Cached per (tag, giant, level).
        `plain_scale` overrides the canonical sf encoding — the exact-scale
        landing lever (see diag_transform)."""
        ck = None if tag is None else (tag, gg, n_l)
        if ck is not None and ck in self._pt_cache:
            return self._pt_cache[ck]
        reps = self.params.slots // g.s
        nb = len(g.babies)
        bpos = {r: k for k, r in enumerate(g.babies)}
        s_c = self.sf[n_l] if plain_scale is None else plain_scale
        moduli = self.params.dcrt.moduli[:n_l]
        pt = np.zeros((n_l, nb, self.params.N), dtype=np.uint32)
        for off, gi, r in g.plan:
            if gi != gg:
                continue
            d = np.roll(np.tile(g.diags[off], reps) * scale_mul, gg)
            m = encode(self.params, d, s_c)
            for li, mod in enumerate(moduli):
                pt[li, bpos[r]] = (m % np.int64(mod)).astype(np.uint64) \
                    .astype(np.uint32)
        pt = jax.device_put(pt)
        if ck is not None:
            self._pt_cache[ck] = pt
        return pt

    def diag_transform(self, ct, g: DiagMatrix, tag=None,
                       scale_mul: float = 1.0,
                       target_scale: float | None = None,
                       lazy: bool = True) -> DeviceCKKSCiphertext:
        """out = M ct for one grouped factor (one rescale level): hoisted
        baby rotations; the giant rows run DOUBLE-HOISTED by default —
        every row's keyed result accumulates in the extended PQ basis and
        one shared ModDown closes the factor (build_diag_factor_lazy;
        `lazy=False` keeps the eager one-ModDown-per-giant path for
        comparison). With `target_scale`, the plaintexts encode at
        q_last*target/ct.scale so the output lands on EXACTLY that scale
        (instead of the canonical sf) — required by the iterative
        bootstrap's residual subtraction."""
        N = self.params.N
        bab = {}
        nontrivial = [r for r in g.babies if r % self.params.slots]
        if nontrivial:
            pre_h = self._hoist_pre(ct)
        for r in g.babies:
            bab[r] = ct if r % self.params.slots == 0 else \
                self.auto_hoisted(ct, galois_element(r, N), pre_h)
        p0 = jnp.stack([bab[r].c0 for r in g.babies], axis=1)
        p1 = jnp.stack([bab[r].c1 for r in g.babies], axis=1)
        n_l = len(ct.moduli)
        ps = None if target_scale is None else \
            float(ct.moduli[-1]) * target_scale / ct.scale
        s_c = self.sf[n_l] if ps is None else ps
        giants = sorted({p[1] for p in g.plan})

        if lazy:
            from .ckks_device import build_diag_factor_lazy
            elements = tuple(
                galois_element(gg, N) if gg % self.params.slots else 1
                for gg in giants)
            pt = jnp.stack([self._diag_row_pt(tag, g, gg, n_l, scale_mul,
                                              plain_scale=ps)
                            for gg in giants])
            key0 = next(iter(self._gk.values()))
            groups, rows = key0.level_view(n_l - 1)
            kbs, kbshs, kas, kashs = [], [], [], []
            for k in elements:
                key = key0 if k == 1 else self._gk[(k, n_l)]
                kbs.append(key.kb)
                kbshs.append(key.kb_sh)
                kas.append(key.ka)
                kashs.append(key.ka_sh)
            fn = build_diag_factor_lazy(N, ct.moduli, key0.p_moduli,
                                        groups, len(g.babies), elements,
                                        rows)
            c0, c1 = fn(p0, p1, pt, kbs, kbshs, kas, kashs)
            return DeviceCKKSCiphertext(
                c0, c1, ct.scale * s_c / ct.moduli[-1], ct.moduli[:-1])

        fused = build_diag_inner(N, ct.moduli, len(g.babies))
        acc = None
        for gg in giants:
            pt = self._diag_row_pt(tag, g, gg, n_l, scale_mul,
                                   plain_scale=ps)
            r0, r1 = fused(p0, p1, pt)
            inner = DeviceCKKSCiphertext(r0, r1, ct.scale * s_c, ct.moduli)
            inner = self.rescale(inner)
            if gg % self.params.slots:
                inner = self.auto(inner, galois_element(gg, N))
            acc = inner if acc is None else self.add(acc, inner)
        return acc

    # -- EvalMod (same cosine/double-angle core as the BSGS driver) ----------

    def eval_mod(self, t) -> DeviceCKKSCiphertext:
        pre = self.pre.base
        w = self.chebyshev_ps(t, pre.cheb_coeffs)
        for _ in range(pre.double_angles):
            w = self.add_const(self.scale_int(self.mult(w, w), 2), -1.0)
        return self.mult_const(w, pre.r / (2 * np.pi))

    # -- the bootstrap --------------------------------------------------------

    def bootstrap(self, ct) -> "CKKSCiphertext":
        return self.bootstrap_batch([ct])[0]

    def bootstrap_iterative_batch(self, cts, precision: int = 4) -> list:
        """Iterative (2-iteration) bootstrapping with both bootstraps on
        device (EvalBootstrap(ct, numIterations=2, precision) — neither the
        iteration nor the base bootstrap ever ran off-CPU in the reference).
        Both runs land on EXACTLY the input scale (target_scale), so the
        residual subtraction is drift-free."""
        from .ckks_boot import _drop_to, mult_const, scale_int, sub_ct
        if not 1 <= precision <= 8:
            raise ValueError(f"precision {precision} out of the supported "
                             "range [1, 8]")
        target = float(cts[0].scale)
        b1s = self.bootstrap_batch(cts, target_scale=target)
        P = 1 << precision
        errs = [sub_ct(_drop_to(scale_int(b1, P), ct.level_params),
                       scale_int(ct, P)) for b1, ct in zip(b1s, cts)]
        b2s = self.bootstrap_batch(errs, target_scale=target)
        out = []
        for b1, b2 in zip(b1s, b2s):
            q_last = b2.level_params.moduli[-1]
            ps = float(q_last) * b1.scale / b2.scale
            out.append(sub_ct(b1, mult_const(self.ctx, b2, 1.0 / P,
                                             plain_scale=ps)))
        return out

    def bootstrap_batch(self, cts, target_scale: float | None = None) -> list:
        """Host ModRaise, then PartialSum (sparse) -> factored CoeffsToSlots
        -> EvalMod -> factored SlotsToCoeffs on device, batched [L, B, N]."""
        from .ckks import CKKSCiphertext
        p = self.params
        pre = self.pre
        full = p.dcrt
        assert all(c.polys[0].params.L == 1 and len(c.polys) == 2
                   for c in cts)
        assert all(abs(c.scale - cts[0].scale) < 1e-6 * cts[0].scale
                   for c in cts)
        raised_cts = []
        for ct in cts:
            r = mod_raise(self.ctx, ct)
            # claim the canonical top scale; the true (drifted) input scale
            # is folded into the final factor (see the BSGS driver's note)
            raised_cts.append(CKKSCiphertext(r.polys, self.sf[full.L], p))
        corr = cts[0].scale / self.sf[full.L]
        dct = self.dctx.upload_batch(raised_cts)

        sp = pre.sparse_slots
        F = p.slots // sp
        if F > 1:
            j = 1
            while j < F:
                dct = self.add(dct, self.rotate(dct, j * sp))
                j <<= 1

        ct_w = dct
        for i, g in enumerate(pre.cts_groups):
            ct_w = self.diag_transform(ct_w, g, tag=("cts", i))

        w_c = self.conjugate(ct_w)
        ct_re = self.mult_const(self.add(ct_w, w_c), 0.5)
        ct_im = self.mult_plain(self.sub(ct_w, w_c),
                                np.full(p.slots, -0.5j), pt_key="im_half")
        # ONE EvalMod traversal for both halves: re/im ride the batch axis
        # ([L, 2B, N]), halving the Paterson-Stockmeyer dispatch count —
        # a batch-first trick the reference's per-ct streaming cannot do
        assert ct_re.scale == ct_im.scale and ct_re.moduli == ct_im.moduli
        B = ct_re.c0.shape[1]
        both = DeviceCKKSCiphertext(
            jnp.concatenate([ct_re.c0, ct_im.c0], axis=1),
            jnp.concatenate([ct_re.c1, ct_im.c1], axis=1),
            ct_re.scale, ct_re.moduli)
        m2 = self.eval_mod(both)
        m_re = DeviceCKKSCiphertext(m2.c0[:, :B], m2.c1[:, :B],
                                    m2.scale, m2.moduli)
        m_im = DeviceCKKSCiphertext(m2.c0[:, B:], m2.c1[:, B:],
                                    m2.scale, m2.moduli)
        recomb = self.add(m_re, self.mult_plain(m_im, np.full(p.slots, 1j),
                                                pt_key="im_one"))

        out = recomb
        last = len(pre.stc_groups) - 1
        for i, g in enumerate(pre.stc_groups):
            sm = 1.0 / float(corr) if i == last else 1.0
            ts = target_scale if i == last else None
            tg = ("stc", i) if i != last else \
                ("stc", i, round(float(corr) * (1 << 48)),
                 None if ts is None else round(ts))
            out = self.diag_transform(out, g, tag=tg, scale_mul=sm,
                                      target_scale=ts)
        return self.dctx.download_batch(out)
