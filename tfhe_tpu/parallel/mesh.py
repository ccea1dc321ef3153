"""Device meshes and batch sharding.

The reference scales by round-robining ciphertexts over CUDA streams and GPUs
with fully replicated key material (bootstrapping.cu:1616-1638, 1005-1069).
The TPU-native equivalent: one `jax.sharding.Mesh` with a `batch` axis;
ciphertext batches are sharded over it, bootstrapping/switching keys are
replicated per chip, and XLA partitions the (embarrassingly parallel) batched
bootstrap automatically. Multi-host pods extend the same mesh over DCN via
`jax.distributed.initialize` — no hand-written communication backend.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0) -> Mesh:
    """1-D ('batch',) mesh over the first `num_devices` devices (all if 0)."""
    devs = jax.devices()
    n = num_devices if num_devices > 0 else len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, only {len(devs)} available")
    return Mesh(np.array(devs[:n]), ("batch",))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis, replicate the rest."""
    return NamedSharding(mesh, P("batch", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def distributed_initialize(**kwargs) -> None:
    """Multi-host entry: wraps jax.distributed.initialize so pods join one
    mesh (coordinator discovery via standard JAX env vars)."""
    jax.distributed.initialize(**kwargs)
