"""Real 2-process jax.distributed execution of the sharded gate pipeline.

The reference has no multi-node path at all (SURVEY.md section 2.4: no
NCCL/MPI); this is the DCN half of the TPU-native design — two OS processes,
each with 2 virtual CPU devices, joined into one 4-device ('batch',) mesh via
`jax.distributed.initialize`, running the production JaxBackend end-to-end
(global-array inputs, allgathered outputs) bit-exactly against the host
oracle. The same code path drives multi-host pod slices (the coordinator
address comes from the cluster environment there).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_gate_pipeline():
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, worker, str(i), "2", str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multiprocess workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: ok" in out, f"proc {i} output:\n{out}"
