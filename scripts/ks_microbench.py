"""Microbenchmark the one-hot MXU key switch at the EvalSign config.

Times build_mkm_switch64 (N=2048, qKS=2^35, baseKS=32, dc=7, n=1305,
key ~3 GB int8) standalone on hardware to size the sign pipeline's
key-switch tail before optimizing it.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
from tfhe_tpu.ops.keyswitch64 import build_mkm_switch64, n_limbs64

N, Q, q_ks, base_ks, dc, n, fmod = 2048, 1 << 54, 1 << 35, 32, 7, 1305, 2048
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
L = n_limbs64(q_ks)
R = N * base_ks * dc
C = L * (n + 1)
print(f"R={R} C={C} key={R*C/2**30:.2f} GiB B={B}")

rng = np.random.default_rng(0)
key = jnp.asarray(rng.integers(0, 128, size=(R, C), dtype=np.int8))
a_lo = jnp.asarray(rng.integers(0, 1 << 32, size=(B, N), dtype=np.uint32))
a_hi = jnp.asarray(rng.integers(0, 1 << 22, size=(B, N), dtype=np.uint32))
b_lo = jnp.asarray(rng.integers(0, 1 << 32, size=(B,), dtype=np.uint32))
b_hi = jnp.asarray(rng.integers(0, 1 << 22, size=(B,), dtype=np.uint32))

mkm = build_mkm_switch64(N, Q, q_ks, base_ks, dc, n, fmod)


def run():
    out = mkm(a_lo, a_hi, b_lo, b_hi, key)
    # axon's block_until_ready does not actually block; force a host pull
    return np.asarray(out[1])


t0 = time.time()
run()
print(f"compile+first: {time.time()-t0:.1f}s")
ts = []
for _ in range(5):
    t0 = time.time()
    run()
    ts.append(time.time() - t0)
med = sorted(ts)[len(ts) // 2]
print(f"times: {['%.3f' % t for t in ts]} median {med*1e3:.1f} ms "
      f"({med/B*1e6:.1f} us/ct)")
