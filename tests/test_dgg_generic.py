"""Arbitrary-center discrete Gaussian samplers (generic UCSD + Karney).

Statistical validation in the style of the reference's sampler unit tests
(UnitTestDistrGen): empirical moments against the analytic target within
multiple standard errors, exact-pmf agreement at small sigma, and the
constructor-contract checks (smoothing bound, sigma floor).
"""

import numpy as np
import pytest

from tfhe_tpu.utils.dgg_generic import BaseSampler, GenericSampler, karney


def _check_moments(x, center, sigma, nse=6.0):
    n = len(x)
    se_mean = sigma / np.sqrt(n)
    se_std = sigma / np.sqrt(2 * n)
    assert abs(x.mean() - center) < nse * se_mean, (x.mean(), center)
    assert abs(x.std() - sigma) < nse * se_std, (x.std(), sigma)


def test_base_sampler_moments():
    rng = np.random.default_rng(1)
    for center, sigma in [(0.0, 34.0), (5.37, 34.0), (-2.25, 50.0)]:
        x = BaseSampler(center, sigma).sample(rng, 40000)
        _check_moments(x, center, sigma)


def test_base_sampler_small_sigma_pmf():
    """Exact pmf agreement at sigma=2 (chi-square style, tolerance 6 se)."""
    rng = np.random.default_rng(2)
    center, sigma, n = 0.4, 2.0, 80000
    x = BaseSampler(center, sigma).sample(rng, n)
    lo, hi = -12, 13
    xs = np.arange(lo, hi)
    p = np.exp(-((xs - center) ** 2) / (2 * sigma * sigma))
    p /= p.sum()
    for v, pv in zip(xs, p):
        if pv < 1e-5:
            continue
        emp = (x == v).mean()
        se = np.sqrt(pv * (1 - pv) / n)
        assert abs(emp - pv) < 6 * se, (v, emp, pv)


def test_generic_sampler_moments():
    g = GenericSampler()
    rng = np.random.default_rng(3)
    for center, sigma in [(0.0, 40.0), (1.75, 64.0), (-123.4, 200.0)]:
        x = g.sample(rng, center, sigma, 30000)
        _check_moments(x, center, sigma)


def test_generic_sampler_vector_centers():
    """Per-sample centers/sigmas — the trapdoor perturbation use case."""
    g = GenericSampler()
    rng = np.random.default_rng(4)
    centers = np.linspace(-3.0, 3.0, 20000)
    x = g.sample(rng, centers, 48.0)
    assert x.shape == centers.shape
    resid = x - centers
    _check_moments(resid, 0.0, 48.0)


def test_generic_sampler_contracts():
    with pytest.raises(ValueError):
        GenericSampler(sigma_b=10.0, eta=6.0)  # < 4*sqrt(2)*eta
    g = GenericSampler()
    with pytest.raises(ValueError):
        g.sample(np.random.default_rng(0), 0.0, g.min_sigma * 0.5, 16)


def test_karney_moments():
    rng = np.random.default_rng(5)
    for center, sigma in [(0.0, 7.5), (1.3, 3.19), (-41.7, 119.0)]:
        x = karney(rng, center, sigma, 60000)
        _check_moments(x, center, sigma)


def test_karney_small_sigma_pmf():
    rng = np.random.default_rng(6)
    center, sigma, n = 0.4, 2.0, 80000
    x = karney(rng, center, sigma, n)
    xs = np.arange(-12, 13)
    p = np.exp(-((xs - center) ** 2) / (2 * sigma * sigma))
    p /= p.sum()
    for v, pv in zip(xs, p):
        if pv < 1e-5:
            continue
        emp = (x == v).mean()
        se = np.sqrt(pv * (1 - pv) / n)
        assert abs(emp - pv) < 6 * se, (v, emp, pv)
