#!/usr/bin/env python
"""CKKS noise flooding (IND-CPA^D enhanced security) — two-phase protocol.

Counterpart of the reference's `src/pke/examples/ckks-noise-flooding.cpp`:
phase 1 runs the encrypted computation in EXEC_NOISE_ESTIMATION mode and
measures the result's noise; phase 2 regenerates keys, re-runs the same
computation, and decrypts with NOISE_FLOODING_DECRYPT — Gaussian flooding
noise derived from the phase-1 estimate.

Run: python examples/ckks_noise_flooding.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams  # noqa: E402
from tfhe_tpu.pke.ckks_auto import CKKSAutoContext  # noqa: E402
from tfhe_tpu.pke.ckks_rns import CKKSRnsContext  # noqa: E402
from tfhe_tpu.pke.dcrt import DCRTParams, _moduli_chain_pattern  # noqa: E402
from tfhe_tpu.pke.noise_flooding import (decrypt_flooded,  # noqa: E402
                                         estimate_noise, flooding_sigma)

N = 128
VEC1 = np.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8])
VEC2 = np.array([1.0, 1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 1.0])


def _make_context(seed: int):
    """Same parameters both phases (the reference pins ring dim across
    phases); FRESH KEYS per phase are essential for the security claim."""
    p = CKKSParams(N=N,
                   dcrt=DCRTParams(N=N, moduli=_moduli_chain_pattern(
                       N, (52, 40, 40))),
                   scale=float(1 << 40))
    base = CKKSContext(p, seed=seed)
    actx = CKKSAutoContext(CKKSRnsContext(base, dnum=2),
                           technique="fixedauto")
    sk, pk = actx.key_gen()
    rlk = actx.relin_key_gen(sk)
    return actx, sk, pk, rlk


def encrypted_computation(actx, pk, rlk):
    """v1*v2*v1 + v1 — two multiplications and an addition, like the
    reference's EncryptedComputation."""
    c1, c2 = actx.encrypt(pk, VEC1), actx.encrypt(pk, VEC2)
    prod = actx.eval_mult(actx.eval_mult(c1, c2, rlk), c1, rlk)
    return actx.eval_add(prod, c1)


def main():
    print("---- PHASE 1: NOISE ESTIMATION ----")
    actx1, sk1, pk1, rlk1 = _make_context(seed=1001)
    noise_ct = encrypted_computation(actx1, pk1, rlk1)
    noise = estimate_noise(actx1.ctx, sk1, noise_ct)
    print(f"noise estimate: {noise:.2f} bits")

    print("\n---- PHASE 2: EVALUATION (fresh keys) ----")
    actx2, sk2, pk2, rlk2 = _make_context(seed=2002)
    result_ct = encrypted_computation(actx2, pk2, rlk2)
    sigma = flooding_sigma(noise)
    print(f"flooding sigma: 2^{np.log2(sigma):.1f} "
          f"(statistical security 30, 1 adversarial query)")
    got = decrypt_flooded(actx2.ctx, sk2, result_ct, noise,
                          rng=np.random.default_rng(5)).real[:VEC1.size]
    want = VEC1 * VEC2 * VEC1 + VEC1
    print("final output   :", np.round(got, 4))
    print("expected result:", want)
    print(f"max err: {np.abs(got - want).max():.2e} "
          f"(flooded — precision bounded by the flooding noise, not the "
          f"scheme noise)")


if __name__ == "__main__":
    main()
