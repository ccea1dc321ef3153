"""Limb-partitioned NTT over a ('limb',) mesh (SURVEY section 5.7): the
cross-shard DIF stages exchange shards with ppermute exactly where the
reference's multi-block GPU kernel pays grid.sync (bootstrapping.cu:120-401).
Bit-identical to the host reference NTT."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from tfhe_tpu.ops.ntt_sched import apply_forward_np
from tfhe_tpu.parallel.limb_ntt import build_limb_ntt
from tfhe_tpu.utils.numtheory import ntt_prime


@pytest.mark.parametrize("N", [1 << 10, 1 << 13])
def test_limb_ntt_matches_reference(N):
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devs[:8]), ("limb",))
    Q = ntt_prime(27, 2 * N)
    rng = np.random.default_rng(4)
    x = rng.integers(0, Q, N).astype(np.uint32)
    got = np.asarray(build_limb_ntt(N, Q, mesh)(x)).astype(np.uint64)
    want = apply_forward_np(x.astype(np.uint64), N, Q)
    np.testing.assert_array_equal(got, want)
