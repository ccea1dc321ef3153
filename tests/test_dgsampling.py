"""Field2n algebra + lattice Gaussian sampling subroutines
(utils/field2n.py, utils/dgsampling.py) — counterparts of field2n.cpp and
dgsampling.cpp."""

import numpy as np
import pytest

from tfhe_tpu.utils.dgsampling import (SIGMA, gauss_samp_gq, spectral_bound,
                                       zsample_f)
from tfhe_tpu.utils.field2n import COEFF, EVAL, Field2n


def _negacyclic(a, b):
    n = len(a)
    out = np.zeros(n)
    for i in range(n):
        for j in range(n):
            k = i + j
            if k < n:
                out[k] += a[i] * b[j]
            else:
                out[k - n] -= a[i] * b[j]
    return out


def test_field2n_roundtrip_and_times():
    rng = np.random.default_rng(0)
    n = 16
    a = rng.normal(size=n)
    b = rng.normal(size=n)
    fa, fb = Field2n(a), Field2n(b)
    # format round trip
    np.testing.assert_allclose(fa.to_eval().to_coeff().v.real, a, atol=1e-10)
    # eval-domain product == negacyclic convolution
    prod = (fa.to_eval() * fb.to_eval()).to_coeff()
    np.testing.assert_allclose(prod.v.real, _negacyclic(a, b), atol=1e-8)
    np.testing.assert_allclose(prod.v.imag, 0, atol=1e-8)


def test_field2n_inverse_shift_transpose():
    rng = np.random.default_rng(1)
    n = 16
    a = rng.normal(size=n)
    fa = Field2n(a).to_eval()
    one = (fa * fa.inverse()).to_coeff().v
    np.testing.assert_allclose(one[0].real, 1.0, atol=1e-9)
    np.testing.assert_allclose(one[1:], 0, atol=1e-9)
    # shift_right == multiply by X
    x_poly = np.zeros(n)
    x_poly[1] = 1.0
    via_mul = (Field2n(a).to_eval() * Field2n(x_poly).to_eval()).to_coeff()
    np.testing.assert_allclose(Field2n(a).shift_right().v, via_mul.v,
                               atol=1e-9)
    # transpose: coeff-domain rule == eval-domain conjugate automorphism
    t1 = Field2n(a).transpose().to_eval()
    t2 = Field2n(a).to_eval().transpose()
    np.testing.assert_allclose(t1.v, t2.v, atol=1e-9)
    # and the eval-domain transpose of a real poly is the conjugate
    np.testing.assert_allclose(t2.v, np.conj(Field2n(a).to_eval().v),
                               atol=1e-9)


def test_field2n_automorphism_matches_coeff_map():
    """automorphism(i) moves the value at root zeta^j to the slot of
    zeta^(j*i) (field2n.cpp:209-230), which as a polynomial map is
    X -> X^(i^-1 mod 2n) with negacyclic sign reduction."""
    rng = np.random.default_rng(2)
    n = 8
    a = rng.normal(size=n)
    for i in (3, 5, 2 * n - 1):
        via_eval = Field2n(a).to_eval().automorphism(i).to_coeff().v.real
        e = pow(i, -1, 2 * n)
        coeff = np.zeros(n)
        for j in range(n):   # X^j -> X^(j*e), negacyclic reduction
            k = (j * e) % (2 * n)
            s = 1.0 if k < n else -1.0
            coeff[k % n] += s * a[j]
        np.testing.assert_allclose(via_eval, coeff, atol=1e-9)


def test_field2n_permute_roundtrip():
    rng = np.random.default_rng(3)
    a = Field2n(rng.normal(size=16))
    np.testing.assert_allclose(a.permute().inverse_permute().v, a.v)
    np.testing.assert_allclose(
        np.concatenate([a.extract_even().v, a.extract_odd().v]),
        a.permute().v)


def test_gauss_samp_gq_identity_and_shortness():
    """G z == v (mod q) exactly, entries Gaussian-short (GaussSampGq,
    dgsampling.cpp:50-118)."""
    rng = np.random.default_rng(4)
    q, base = 1019 * 1021, 4
    k = int(np.ceil(np.log(q) / np.log(base)))
    n = 64
    v = rng.integers(0, q, n)
    z = gauss_samp_gq(v, (base + 1) * SIGMA, k, q, base, rng)
    recon = np.zeros(n, dtype=object)
    for t in range(k):
        recon += (base ** t) * z[t].astype(object)
    assert all((int(r) - int(x)) % q == 0 for r, x in zip(recon, v))
    # entries are short relative to q (width ~ base*SIGMA)
    assert np.abs(z).max() < 40 * base * SIGMA


def test_gauss_samp_gq_zero_mean():
    rng = np.random.default_rng(5)
    q, base, n = 12289, 2, 256
    k = int(np.ceil(np.log2(q)))
    v = rng.integers(0, q, n)
    zs = np.concatenate([gauss_samp_gq(v, (base + 1) * SIGMA, k, q, base,
                                       rng).ravel() for _ in range(8)])
    assert abs(zs.mean()) < zs.std() / 5


def test_zsample_f_diagonal_covariance():
    """With f = c0 (DC only) the covariance is c0*I: per-coordinate variance
    matches and cross-correlation vanishes."""
    rng = np.random.default_rng(6)
    n, var = 8, 900.0
    f = np.zeros(n)
    f[0] = var
    c = Field2n(np.zeros(n))
    xs = np.stack([zsample_f(Field2n(f), c, rng) for _ in range(1500)])
    sd = xs.std(axis=0)
    se = np.sqrt(var) / np.sqrt(2 * len(xs))
    assert np.all(np.abs(sd - np.sqrt(var)) < 8 * se), sd
    corr = np.corrcoef(xs.T)
    off = corr[~np.eye(n, dtype=bool)]
    assert np.abs(off).max() < 0.12, off


def test_spectral_bound_positive():
    s = spectral_bound(512, 10, 2)
    assert s > (2 + 1) * SIGMA  # wide enough for the Schur complement


def test_gauss_samp_gq_continuous_variant():
    """The GaussSampGqArbBase (continuous perturbation) form keeps the exact
    G z == v identity."""
    rng = np.random.default_rng(7)
    q, base, n = 786433, 2, 32
    k = int(np.ceil(np.log2(q)))
    v = rng.integers(0, q, n)
    z = gauss_samp_gq(v, (base + 1) * SIGMA, k, q, base, rng, continuous=True)
    recon = np.zeros(n, dtype=object)
    for t in range(k):
        recon += (base ** t) * z[t].astype(object)
    assert all((int(r) - int(x)) % q == 0 for r, x in zip(recon, v))
    assert np.abs(z).max() < 40 * base * SIGMA
