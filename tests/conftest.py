"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and __graft_entry__.py; unit tests
must be hermetic and mesh-capable without hardware.

Note: the JAX_PLATFORMS env var is overridden by remote-TPU plugins in some
environments, so the platform is forced through jax.config instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from tfhe_tpu.utils.jaxcfg import enable_compile_cache  # noqa: E402

enable_compile_cache()
