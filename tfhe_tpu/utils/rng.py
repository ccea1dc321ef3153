"""Randomness for key generation and encryption (host side, numpy PCG64).

Replaces the reference's Blake2XB-seeded generators
(`src/core/include/utils/prng/blake2engine.h`,
`src/core/lib/math/discretegaussiangenerator.cpp`,
`ternaryuniformgenerator.cpp`, `discreteuniformgenerator.cpp`).

We intentionally do NOT reproduce the reference's PRNG byte stream: parity with
OpenFHE is defined as "same keys -> bit-identical homomorphic evaluation", not
"same seed -> identical ciphertexts" (the reference itself never relies on
cross-library RNG parity). The distributions match:

- ``discrete_gaussian``: integer Gaussian with std sigma (3.19), sampled by
  exact CDF inversion over a +-ceil(10*sigma) support (beyond the reference's
  Peikert-table tail; per-sample probability mass outside is < 2^-140).
- ``discrete_uniform``: uniform over [0, modulus).
- ``ternary_uniform``: uniform over {-1, 0, 1}, returned as residues mod modulus
  like `TernaryUniformGeneratorImpl::GenerateVector`.
"""

from __future__ import annotations

import numpy as np


class BinFHERng:
    """All randomness used by keygen/encryption, seeded once."""

    def __init__(self, seed: int | None = None):
        self._rng = np.random.default_rng(seed)
        self._dgg_tables: dict[float, tuple[np.ndarray, np.ndarray]] = {}

    def _dgg_table(self, sigma: float) -> tuple[np.ndarray, np.ndarray]:
        if sigma not in self._dgg_tables:
            tail = int(np.ceil(10 * sigma))
            xs = np.arange(-tail, tail + 1)
            # exact-enough CDF in float64; probabilities below ~1e-300 underflow to 0,
            # which only truncates a tail that is unreachable anyway.
            logp = -(xs.astype(np.float64) ** 2) / (2.0 * sigma * sigma)
            p = np.exp(logp - logp.max())
            cdf = np.cumsum(p)
            cdf /= cdf[-1]
            self._dgg_tables[sigma] = (xs, cdf)
        return self._dgg_tables[sigma]

    def discrete_gaussian(self, size: int, sigma: float, modulus: int) -> np.ndarray:
        """Integer Gaussian errors as residues mod `modulus` (object dtype if large)."""
        xs, cdf = self._dgg_table(sigma)
        u = self._rng.random(size)
        idx = np.searchsorted(cdf, u, side="right")
        vals = xs[np.minimum(idx, len(xs) - 1)]
        return _to_residues(vals, modulus)

    def discrete_gaussian_signed(self, size: int, sigma: float) -> np.ndarray:
        xs, cdf = self._dgg_table(sigma)
        u = self._rng.random(size)
        idx = np.searchsorted(cdf, u, side="right")
        return xs[np.minimum(idx, len(xs) - 1)].astype(np.int64)

    def discrete_uniform(self, size: int, modulus: int) -> np.ndarray:
        if modulus <= (1 << 63):
            return self._rng.integers(0, modulus, size=size, dtype=np.uint64)
        # arbitrary-width rejection-free sampling via 128-bit assembly
        hi = self._rng.integers(0, 1 << 32, size=size, dtype=np.uint64)
        lo = self._rng.integers(0, 1 << 64, size=size, dtype=np.uint64)
        out = np.empty(size, dtype=object)
        for i in range(size):
            out[i] = ((int(hi[i]) << 64) | int(lo[i])) % modulus
        return out

    def ternary_uniform_signed(self, size: int) -> np.ndarray:
        """Ternary secret in {-1, 0, 1} (stored signed; embed mod m on demand)."""
        return self._rng.integers(-1, 2, size=size).astype(np.int64)


def _to_residues(signed_vals: np.ndarray, modulus: int) -> np.ndarray:
    """Map signed integers to residues in [0, modulus)."""
    if modulus < (1 << 63):
        m = np.int64(modulus)
        v = signed_vals.astype(np.int64) % m
        return v.astype(np.uint64)
    out = np.empty(len(signed_vals), dtype=object)
    for i, v in enumerate(signed_vals):
        out[i] = int(v) % modulus
    return out
