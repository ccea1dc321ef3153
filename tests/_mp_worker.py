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
print(f"proc {proc_id}: ok", flush=True)
jax.distributed.shutdown()
