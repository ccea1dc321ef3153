#!/usr/bin/env python
"""Device-vs-oracle comparison tool — the analogue of the reference's
`examples/error-analysis.cpp` (which decrypt-compares dumped NTT-vs-FFT
results). Here the device path is exact, so the check is stricter: the
blind-rotation accumulators and the final ciphertexts must be IDENTICAL.

Runs a batch of gate bootstraps through both the host oracle and the JAX
device backend on identical keys and inputs, and reports the first
divergence (there should be none).

Usage: python scripts/error_analysis.py [--batch N] [--set TOY|STD128]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tfhe_tpu.utils.jaxcfg import enable_compile_cache

enable_compile_cache()

from tfhe_tpu import BinFHEContext, Gate, ParamSet  # noqa: E402
from tfhe_tpu.ops.backend import JaxBackend  # noqa: E402


def main():
    batch, pset = 64, "TOY"
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
        if a.startswith("--set="):
            pset = a.split("=")[1]

    cc = BinFHEContext(seed=99)
    cc.generate_binfhe_context(ParamSet[pset])
    sk = cc.key_gen()
    cc.bt_key_gen(sk)

    rng = np.random.default_rng(0)
    m1, m2 = rng.integers(0, 2, batch), rng.integers(0, 2, batch)
    ct1, ct2 = cc.encrypt(sk, m1), cc.encrypt(sk, m2)

    ref_out = cc.eval_bin_gate(Gate.NAND, ct1, ct2)

    backend = JaxBackend()
    cc.use_backend(backend)
    backend.setup(cc.params, cc.bt_key)
    dev_out = cc.eval_bin_gate(Gate.NAND, ct1, ct2)

    a_eq = np.array_equal(np.asarray(ref_out.a), np.asarray(dev_out.a))
    b_eq = np.array_equal(np.asarray(ref_out.b), np.asarray(dev_out.b))
    dec_ok = np.array_equal(np.asarray(cc.decrypt(sk, dev_out)), 1 - (m1 & m2))
    print(f"set={pset} batch={batch} pallas={backend._use_pallas(cc.params)}")
    print(f"ciphertext a identical: {a_eq}")
    print(f"ciphertext b identical: {b_eq}")
    print(f"decrypt truth table:    {'OK' if dec_ok else 'WRONG'}")
    if not (a_eq and b_eq):
        da = np.argwhere(np.asarray(ref_out.a) != np.asarray(dev_out.a))
        print(f"first a divergence at {da[:3]}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
