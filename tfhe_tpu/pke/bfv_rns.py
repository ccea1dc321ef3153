"""Pure-RNS BFV multiplication (HPS): no big-integer hot path.

The exactness-first host BFV (pke/bfv.py) computes the tensor product by
exact CRT interpolation over python ints — correct, but every mult leaves
the RNS domain. This module is the production-form counterpart of the
reference's `bfvrns-leveledshe.cpp` HPS multiplication pipeline
(Halevi-Polyakov-Shoup '19, the scheme OpenFHE selects by default):

  1. `expand_crt_basis` — EXACT extension of the centered representative
     from basis Q to the auxiliary basis R: y_i = [x*(Q/q_i)^-1]_{q_i},
     alpha = round(sum y_i/q_i) in float64, x_r = sum y_i*(Q/q_i) - alpha*Q
     mod r. Unlike the approximate FBC in ckks_rns.py (whose +-Q slack is
     harmless inside key switching), BFV's tensor product would turn a +-Q
     representative error into t*(huge) ciphertext corruption, so the alpha
     rounding must be correct: float64 gives a ~2^-49 tie band around
     |x| = Q/2, the same guarantee the reference gets from its double /
     long-double `ApproxSwitchCRTBasis` path.
  2. Tensor product limb-wise over the QR basis (NTT per limb); the product
     magnitude is < N*Q^2/2 < QR/2, so the QR residues carry it exactly.
  3. `scale_and_round` — round(t*x/Q) into basis R:
     t*x/Q = sum_{i in Q} y_i*(tR/q_i) + t*sum_{j in R} y_j*(R/r_j) - alpha*tR;
     integer parts are accumulated mod r, the fractional sum
     sum y_i*frac(tR/q_i) in float64 (error O(L) ulps = O(L) extra noise
     units, far under the Delta/2 decryption margin).
  4. `expand_crt_basis` again (R -> Q) to land the rounded product back in
     the working basis — exact, since |round(t*x/Q)| <= t*N*Q/2 << R/2
     keeps the rounding far from the tie band.
  5. Relinearization of d2 by the shared pure-RNS hybrid key switch
     (ckks_rns.rns_hybrid_ks_gen / rns_hybrid_key_switch with plain noise
     t=1 — BFV relin keys are CKKS-shaped).

Also pure-RNS encrypt (Delta mod q_i precomputed) and decrypt
(round(t*x/Q) mod t = round(sum y_i * t/q_i) mod t — the alpha term
vanishes mod t), so the whole BFV lifecycle stays in [L, N] residue
towers. Validated against the exact big-int BFV in tests/test_bfv_rns.py.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..ref import modmath
from .bfv import BFVCiphertext, BFVContext, BFVParams
from .ckks_rns import RnsHybridKey, rns_hybrid_ks_gen, rns_hybrid_key_switch
from .dcrt import DCRTParams, DCRTPoly, _moduli_chain


# -- exact centered base extension -------------------------------------------

@lru_cache(maxsize=None)
def _expand_tables(src: tuple, dst: tuple):
    D = 1
    for q in src:
        D *= q
    inv = np.array([pow((D // q) % q, -1, q) for q in src], dtype=np.uint64)
    inv_q = np.array([1.0 / q for q in src])
    dhat_dst = np.array([[(D // q) % m for q in src] for m in dst],
                        dtype=np.uint64)
    d_dst = np.array([D % m for m in dst], dtype=np.uint64)
    return inv, inv_q, dhat_dst, d_dst


def expand_crt_basis(rns_src: np.ndarray, src: tuple, dst: tuple) -> np.ndarray:
    """Residues over `dst` of the CENTERED representative of `rns_src`
    (value in (-D/2, D/2], D = prod(src)). Exact whenever the float64
    alpha = round(sum y_i/q_i) rounds on the correct side — guaranteed
    except in a ~2^-49-wide band around |x| = D/2 (the reference's
    double-precision guarantee, bfvrns-leveledshe.cpp ExpandCRTBasis)."""
    inv, inv_q, dhat_dst, d_dst = _expand_tables(tuple(src), tuple(dst))
    y = np.stack([modmath.mul(rns_src[i], inv[i], src[i])
                  for i in range(len(src))])             # [s, N]
    alpha = np.rint(y.astype(np.float64).T @ inv_q).astype(np.int64)  # [N]
    out = []
    for j, m in enumerate(dst):
        acc = np.zeros(rns_src.shape[-1], dtype=np.uint64)
        for i in range(len(src)):
            acc = (acc + modmath.mul(y[i] % np.uint64(m), dhat_dst[j, i], m)) \
                % np.uint64(m)
        corr = modmath.mul((alpha % np.int64(m)).astype(np.uint64), d_dst[j], m)
        out.append((acc + np.uint64(m) - corr) % np.uint64(m))
    return np.stack(out)


# -- t/Q scale-and-round -----------------------------------------------------

@lru_cache(maxsize=None)
def _scale_round_tables(q_mods: tuple, r_mods: tuple, t: int):
    D = 1
    for d in q_mods + r_mods:
        D *= d
    R = 1
    for r in r_mods:
        R *= r
    inv = np.array([pow((D // d) % d, -1, d) for d in q_mods + r_mods],
                   dtype=np.uint64)
    # integer/fractional split of t*R/q_i
    omega = [[(t * R // q) % r for q in q_mods] for r in r_mods]
    theta = np.array([float(t * R % q) / q for q in q_mods])
    # t*(R/r_j) mod r, and t*R mod r (the -alpha*tR correction)
    t_rhat = [[(t * (R // rj)) % r for rj in r_mods] for r in r_mods]
    t_r = [(t * R) % r for r in r_mods]
    inv_d = np.array([1.0 / d for d in q_mods + r_mods])
    return inv, omega, theta, t_rhat, t_r, inv_d


def scale_and_round(rns_qr: np.ndarray, q_mods: tuple, r_mods: tuple,
                    t: int) -> np.ndarray:
    """[L_q + L_r, N] residues of x over the QR basis (centered value,
    |x| < QR/2) -> [L_r, N] residues of round(t*x/Q) over R
    (bfvrns-leveledshe.cpp ScaleAndRound). The fractional accumulation
    error is O(L) units of extra noise, matching the reference."""
    q_mods, r_mods = tuple(q_mods), tuple(r_mods)
    inv, omega, theta, t_rhat, t_r, inv_d = _scale_round_tables(
        q_mods, r_mods, t)
    all_mods = q_mods + r_mods
    n_q = len(q_mods)
    y = np.stack([modmath.mul(rns_qr[k], inv[k], all_mods[k])
                  for k in range(len(all_mods))])
    alpha = np.rint(y.astype(np.float64).T @ inv_d).astype(np.int64)   # [N]
    nu = np.rint(y[:n_q].astype(np.float64).T @ theta).astype(np.int64)
    out = []
    for j, r in enumerate(r_mods):
        ur = np.uint64(r)
        acc = np.zeros(rns_qr.shape[-1], dtype=np.uint64)
        for i in range(n_q):
            acc = (acc + modmath.mul(y[i] % ur,
                                     np.uint64(omega[j][i]), r)) % ur
        for jj in range(len(r_mods)):
            acc = (acc + modmath.mul(y[n_q + jj] % ur,
                                     np.uint64(t_rhat[j][jj]), r)) % ur
        corr = modmath.mul((alpha % np.int64(r)).astype(np.uint64),
                           np.uint64(t_r[j]), r)
        acc = (acc + ur - corr) % ur
        acc = (acc + (nu % np.int64(r)).astype(np.uint64)) % ur
        out.append(acc)
    return np.stack(out)


# -- context -----------------------------------------------------------------

class BFVRnsContext:
    """BFV with the HPS pure-RNS multiplication pipeline. Key generation
    and sampling reuse pke/bfv.py's context (already RNS-native); encrypt,
    decrypt, mult, and relinearization here never leave the residue
    domain."""

    def __init__(self, base_ctx: BFVContext, dnum: int = 2,
                 ks_limb_bits: int = 40):
        assert isinstance(base_ctx, BFVContext)
        self.ctx = base_ctx
        self.params: BFVParams = base_ctx.params
        self.dnum = dnum
        self.ks_limb_bits = ks_limb_bits
        p = self.params
        lp = p.dcrt
        bits = max(m.bit_length() for m in lp.moduli)
        # R must hold the tensor product (R > 2NQ for alpha safety) AND the
        # scaled product (|round(t*x/Q)| <= t*N*Q/2 < R/4)
        import math
        need = math.log2(4 * p.t * p.N)
        extra = max(1, int(math.ceil(need / bits)))
        self.r_moduli = _moduli_chain(lp.N, lp.L + extra, bits, skip=lp.L)
        self.qr_params = DCRTParams(N=lp.N,
                                    moduli=lp.moduli + tuple(self.r_moduli))
        self._delta_mod = tuple(int(p.delta % m) for m in lp.moduli)

    # -- RNS encrypt / decrypt ------------------------------------------------

    def encrypt(self, pk, m) -> BFVCiphertext:
        """Delta*m computed per limb with the precomputed [Delta]_{q_i} —
        no big-int coefficient products (bfvrns encrypt)."""
        p = self.params
        lp = p.dcrt
        m_arr = np.zeros(p.N, dtype=np.int64)
        m_in = np.asarray(m, dtype=np.int64)
        m_arr[:m_in.size] = m_in % p.t
        rows = np.stack([
            modmath.mul((m_arr % np.int64(mod)).astype(np.uint64),
                        np.uint64(self._delta_mod[i]), mod)
            for i, mod in enumerate(lp.moduli)])
        dm = DCRTPoly(lp, rows, eval_form=False).to_eval()
        u, _ = self.ctx._ternary()
        e1, e2 = self.ctx._gaussian(), self.ctx._gaussian()
        return BFVCiphertext([pk.b * u + e1 + dm, pk.a * u + e2], p)

    def encrypt_packed(self, pk, values) -> BFVCiphertext:
        from . import encoding
        return self.encrypt(pk, encoding.pack(values, self.params.t,
                                              self.params.N))

    def decrypt(self, sk, ct: BFVCiphertext) -> np.ndarray:
        """round(t*x/Q) mod t = round(sum_i y_i*t/q_i) mod t: the alpha*t
        term vanishes mod t, so no alpha at all (bfvrns decrypt's
        ScaleAndRound to the single modulus t)."""
        p = self.params
        acc = ct.polys[0]
        s_pow = sk.s
        for c in ct.polys[1:]:
            acc = acc + c * s_pow
            s_pow = s_pow * sk.s
        x = acc.to_coeff()
        lp = p.dcrt
        inv, _, _, _ = _expand_tables(tuple(lp.moduli), (int(p.t),))
        y = np.stack([modmath.mul(x.rns[i], inv[i], m)
                      for i, m in enumerate(lp.moduli)])
        w = np.array([float(p.t) / m for m in lp.moduli])
        f = np.rint(y.astype(np.float64).T @ w).astype(np.int64)
        return f % p.t

    def decrypt_packed(self, sk, ct) -> np.ndarray:
        from . import encoding
        return encoding.unpack(self.decrypt(sk, ct), self.params.t,
                               self.params.N)

    # -- keys -----------------------------------------------------------------

    def relin_key_gen(self, sk) -> RnsHybridKey:
        from .keyswitch import negacyclic_square_signed
        return rns_hybrid_ks_gen(
            self.ctx.rng, self.params.dcrt,
            negacyclic_square_signed(sk.s_signed), sk.s_signed,
            self.dnum, limb_bits=self.ks_limb_bits)

    def galois_key_gen(self, sk, steps: int) -> RnsHybridKey:
        from .encoding import rotation_automorphism_index
        from .keyswitch import automorph_signed
        k = rotation_automorphism_index(self.params.N, steps)
        key = rns_hybrid_ks_gen(
            self.ctx.rng, self.params.dcrt,
            automorph_signed(sk.s_signed, k), sk.s_signed,
            self.dnum, limb_bits=self.ks_limb_bits)
        key.galois_k = k
        return key

    # -- homomorphic ops -------------------------------------------------------

    def eval_add(self, a: BFVCiphertext, b: BFVCiphertext) -> BFVCiphertext:
        return BFVCiphertext([x + y for x, y in zip(a.polys, b.polys)],
                             a.params)

    def eval_mult(self, a: BFVCiphertext, b: BFVCiphertext,
                  rlk: RnsHybridKey | None = None) -> BFVCiphertext:
        """HPS tensor product: expand to QR, multiply, t/Q-scale-round into
        R, switch back to Q, relinearize — all in RNS."""
        p = self.params
        lp = p.dcrt
        q_mods = tuple(lp.moduli)
        r_mods = tuple(self.r_moduli)
        qr = self.qr_params
        assert len(a.polys) == 2 and len(b.polys) == 2

        def lift(poly: DCRTPoly) -> DCRTPoly:
            c = poly.to_coeff()
            ext = expand_crt_basis(c.rns, q_mods, r_mods)
            return DCRTPoly(qr, np.concatenate([c.rns, ext]),
                            eval_form=False).to_eval()

        a0, a1 = lift(a.polys[0]), lift(a.polys[1])
        b0, b1 = lift(b.polys[0]), lift(b.polys[1])
        d0 = a0 * b0
        d1 = a0 * b1 + a1 * b0
        d2 = a1 * b1

        def scale_back(d: DCRTPoly) -> DCRTPoly:
            rows_r = scale_and_round(d.to_coeff().rns, q_mods, r_mods, p.t)
            back = expand_crt_basis(rows_r, r_mods, q_mods)
            return DCRTPoly(lp, back, eval_form=False).to_eval()

        polys = [scale_back(d0), scale_back(d1), scale_back(d2)]
        if rlk is None:
            return BFVCiphertext(polys, p)
        s0, s1 = rns_hybrid_key_switch(rlk, polys[2], q_mods)
        return BFVCiphertext([polys[0] + s0, polys[1] + s1], p)

    def eval_rotate(self, ct: BFVCiphertext, steps: int,
                    gk: RnsHybridKey) -> BFVCiphertext:
        """Packed slot rotation: automorphism + pure-RNS hybrid key switch
        (vs pke/bfv.py's big-int gadget digits)."""
        from .encoding import (apply_automorphism_coeff,
                               rotation_automorphism_index)
        k = rotation_automorphism_index(self.params.N, steps)
        lp = ct.polys[0].params

        def auto(poly: DCRTPoly) -> DCRTPoly:
            c = poly.to_coeff()
            rows = np.stack([apply_automorphism_coeff(c.rns[i], k, m)
                             for i, m in enumerate(lp.moduli)])
            return DCRTPoly(lp, rows, eval_form=False).to_eval()

        c0a, c1a = auto(ct.polys[0]), auto(ct.polys[1])
        d0, d1 = rns_hybrid_key_switch(gk, c1a, lp.moduli)
        return BFVCiphertext([c0a + d0, d1], ct.params)
