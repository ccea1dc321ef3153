"""Ring trapdoor + GPV preimage sampling (utils/trapdoor.py) — the
counterpart of trapdoor.cpp / dgsampling.cpp."""

import numpy as np
import pytest

from tfhe_tpu.utils import dgsampling as tds
from tfhe_tpu.utils import trapdoor as tdm
from tfhe_tpu.utils.numtheory import ntt_prime
from tfhe_tpu.utils.rng import BinFHERng


@pytest.fixture(scope="module")
def td():
    rng = BinFHERng(77)
    N, Q = 64, ntt_prime(20, 128)
    return rng, tdm.trapdoor_gen(rng, N, Q, base=4)


def test_preimage_identity_and_shortness(td):
    rng, trap = td
    Q = trap.Q
    for _ in range(3):
        u = rng.discrete_uniform(trap.N, Q)
        x = tdm.gauss_samp(rng, trap, u)
        assert np.array_equal(tdm.apply_A(trap, x),
                              np.asarray(u, dtype=np.uint64))
        # short relative to Q: the exact sampler draws at the spectral-bound
        # width s (the GPV-correct width), so |x| ~ a few * s << Q
        s = tds.spectral_bound(trap.N, trap.k, trap.base)
        assert np.abs(x).max() < 8 * s
        assert 8 * s < Q // 8


def test_preimage_spherical_variant(td):
    rng, trap = td
    u = rng.discrete_uniform(trap.N, trap.Q)
    x = tdm.gauss_samp(rng, trap, u, spherical=True)
    assert np.array_equal(tdm.apply_A(trap, x),
                          np.asarray(u, dtype=np.uint64))
    assert np.abs(x).max() < trap.Q // 64


def test_preimage_zero_centered(td):
    """Preimage coordinates are (roughly) zero-mean — a constant-offset bug
    would leak the trapdoor."""
    rng, trap = td
    u = rng.discrete_uniform(trap.N, trap.Q)
    xs = np.concatenate([tdm.gauss_samp(rng, trap, u).ravel()
                         for _ in range(4)])
    assert abs(xs.mean()) < xs.std() / 10


def test_gpv_signature_flow(td):
    """GPV hash-and-sign: sign = preimage of H(msg); verify = <A, x> == H."""
    rng, trap = td
    h = np.array([hash(("msg", i)) % trap.Q for i in range(trap.N)],
                 dtype=np.uint64)
    sig = tdm.gauss_samp(rng, trap, h)
    assert np.array_equal(tdm.apply_A(trap, sig), h)   # verifies
    h2 = (h + 1) % np.uint64(trap.Q)
    assert not np.array_equal(tdm.apply_A(trap, sig), h2)
