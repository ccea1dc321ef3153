"""bench.py --smoke --devices 8 on the virtual CPU mesh (VERDICT r4 #7):
the sharded gate pipeline must survive CI, not just the driver's dryrun —
a TOY gate batch runs sharded over an 8-device ('batch',) mesh through the
same bench entry the driver executes, and its JSON line must carry a
nonzero verified throughput."""

import json
import os
import subprocess
import sys


def test_bench_smoke_on_virtual_mesh():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    out = subprocess.run(
        [sys.executable, "bench.py", "--smoke", "--devices", "8"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)
    assert out.returncode == 0, f"bench smoke failed:\n{out.stderr[-2000:]}"
    line = json.loads(out.stdout.strip().splitlines()[-1])
    gate = line["ops"]["gate"]
    assert gate.get("verified") is True
    assert float(gate["value"]) > 0
