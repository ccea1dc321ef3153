"""Phase breakdown of the EvalSign pipeline on hardware.

Runs the bench's sign config (STD128 accelerated ctor, logQ=17, throw=1)
once cold then once hot with TFHE_TPU_PROFILE=1, so the per-bootstrap device
phases (acc build / rotate / tail / host pull, backend.py func_bootstrap) and
the host glue between bootstraps (scheme.py eval_floor/eval_sign) print to
stderr. Use to attribute the gap between the measured ms/ctx and the sum of
the raw bootstraps before optimizing anything.

    python scripts/profile_sign.py [batch=2048]
"""
import os
import sys
import time

os.environ.setdefault("TFHE_TPU_PROFILE", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tfhe_tpu.utils.jaxcfg import enable_compile_cache

enable_compile_cache()

from tfhe_tpu import BinFHEContext, ParamSet

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

cc = BinFHEContext(seed=20260816)
cc.generate_binfhe_context(ParamSet.STD128, arb_func=False, log_q=17,
                           num_digits_to_throw=1)
t0 = time.time()
sk = cc.key_gen()
cc.bt_key_gen(sk)
print(f"keygen: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
cc.device_setup()

Q_enc = 1 << 17
q = cc.params.lwe.q
P = cc.get_max_plaintext_space() * (Q_enc // q)
rng = np.random.default_rng(3)
delta = rng.integers(-3, 4, B)
m = (P // 2 + delta) % P
ct = cc.encrypt(sk, m, "FRESH", P, Q_enc)

t0 = time.time()
out = cc.eval_sign(ct)
print(f"first run (compile): {time.time()-t0:.1f}s", file=sys.stderr,
      flush=True)
assert np.array_equal(np.asarray(cc.decrypt(sk, out, 2), dtype=np.int64),
                      (delta >= 0).astype(np.int64)), "wrong sign results"

print("--- hot run with phase breakdown ---", file=sys.stderr, flush=True)
t0 = time.time()
out = cc.eval_sign(ct)
dt = time.time() - t0
print(f"hot run: {dt:.2f}s total = {dt/B*1e3:.2f} ms/ctx at batch {B}",
      file=sys.stderr, flush=True)
