"""Worker for the 2-process jax.distributed test (test_multiprocess.py).

Each process owns 2 virtual CPU devices; the two processes join one 4-device
('batch',) mesh over the distributed runtime — the same topology a multi-host
TPU pod presents (SURVEY.md section 2.4 DCN row). The full gate-bootstrap
pipeline runs sharded across both processes through the production JaxBackend
(global batch arrays assembled per-process, results allgathered over the
process barrier), and every process checks the result bit-exactly against the
host oracle.
"""

import os
import sys

proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=proc_id)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.local_devices()) == 2
assert jax.device_count() == 2 * nproc

import numpy as np  # noqa: E402

from tfhe_tpu import BinFHEContext, Gate, scheme  # noqa: E402
from tfhe_tpu.ops.backend import JaxBackend  # noqa: E402
from tfhe_tpu.parallel.mesh import make_mesh  # noqa: E402
from tfhe_tpu.ref.backend import RefBackend  # noqa: E402
from tfhe_tpu.utils.numtheory import ntt_prime  # noqa: E402

# deterministic context: same seed on every process -> identical keys
cc = BinFHEContext(seed=7)
Q = ntt_prime(20, 512)
cc.generate_binfhe_context_custom(n=16, N=256, q=512, Q=Q, std=3.19,
                                  base_ks=32, base_g=1 << 5, base_r=23)
sk = cc.key_gen()
cc.bt_key_gen(sk)

B = 2 * jax.device_count()
m1 = np.arange(B) % 2
m2 = (np.arange(B) // 2) % 2
ct1 = cc.encrypt(sk, m1)
ct2 = cc.encrypt(sk, m2)

ref = scheme.eval_bin_gate(RefBackend(), cc.params, Gate.NAND, cc.bt_key,
                           ct1, ct2)

mesh = make_mesh()  # all 4 global devices
be = JaxBackend(mesh=mesh)
assert be.supports(cc.params)
dev = scheme.eval_bin_gate(be, cc.params, Gate.NAND, cc.bt_key, ct1, ct2)

assert np.array_equal(np.asarray(ref.a), np.asarray(dev.a)), "a mismatch"
assert np.array_equal(np.asarray(ref.b), np.asarray(dev.b)), "b mismatch"
dec = np.asarray(cc.decrypt(sk, dev), dtype=np.int64)
assert np.array_equal(dec, 1 - (m1 & m2)), f"decrypt mismatch: {dec}"

# -- RNS two-prime functional bootstrap across both processes ---------------
# (interpret-mode Pallas under shard_map over the distributed mesh; the
# composite-Q pipeline the accelerated 54-bit sets use)
os.environ["TFHE_TPU_PALLAS"] = "1"
from tfhe_tpu import lwe as lwe_mod  # noqa: E402
from tfhe_tpu.params import (BinFHEParams, LWEParams, Method,  # noqa: E402
                             RGSWParams)
from tfhe_tpu.utils.numtheory import previous_prime  # noqa: E402
from tfhe_tpu.utils.rng import BinFHERng  # noqa: E402

N = 256
q1 = ntt_prime(17, 2 * N)
q2 = previous_prime(q1, 2 * N)
params_rns = BinFHEParams(
    lwe=LWEParams(n=8, N=N, q=512, Q=q1 * q2, q_ks=1 << 35, std=3.19,
                  base_ks=32),
    rgsw=RGSWParams(N=N, Q=q1 * q2, q=512, base_g=1 << 7, base_r=23,
                    method=Method.GINX, std=3.19))
rng = BinFHERng(31)
sk_r = lwe_mod.key_gen(rng, params_rns.lwe.n, params_rns.lwe.q_ks)
key_r = scheme.key_gen(rng, params_rns, sk_r)
be_r = JaxBackend(mesh=mesh)
assert be_r.supports(params_rns)
npr = np.random.default_rng(37)
a_r = npr.integers(0, 512, (B, params_rns.lwe.n)).astype(np.uint64)
b_r = npr.integers(0, 512, B).astype(np.uint64)
ct_r = lwe_mod.LWECiphertext(a_r, b_r, 512)


def _f(x, q, fmod):
    return (np.asarray(x, dtype=np.uint64) * 3) % np.uint64(fmod)


ref_f = scheme.bootstrap_func(RefBackend(), params_rns, key_r, ct_r, _f, 512)
dev_f = scheme.bootstrap_func(be_r, params_rns, key_r, ct_r, _f, 512)
assert np.array_equal(np.asarray(ref_f.a), np.asarray(dev_f.a)), "rns func a"
assert np.array_equal(np.asarray(ref_f.b), np.asarray(dev_f.b)), "rns func b"

print(f"proc {proc_id}: ok", flush=True)
jax.distributed.shutdown()
