#!/usr/bin/env python
"""CKKS function evaluation: polynomials, Chebyshev approximation, wsums.

Counterpart of three reference examples:
  - polynomial-evaluation.cpp  — power-basis EvalPoly (linear + PS)
  - function-evaluation.cpp    — EvalLogistic / EvalChebyshevFunction
    (1/x and exp) with degree-vs-precision notes
  - linearwsum-evaluation.cpp  — EvalLinearWSum over a ciphertext vector

Run: python examples/function_evaluation.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tfhe_tpu.pke.advancedshe as ash  # noqa: E402
from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams  # noqa: E402
from tfhe_tpu.pke.dcrt import DCRTParams  # noqa: E402
from tfhe_tpu.pke.keyswitch import relin_key_gen_hybrid  # noqa: E402


def _context(depth_limbs: int = 30):
    p = CKKSParams(N=32, dcrt=DCRTParams.create(32, depth_limbs, 40),
                   scale=float(1 << 40))
    ctx = CKKSContext(p, seed=20260818)
    sk, pk = ctx.key_gen()
    rlk = relin_key_gen_hybrid(ctx.rng, p.dcrt, sk[1], dnum=3)
    return ctx, sk, pk, rlk


def polynomial_evaluation():
    """EvalPoly of the reference's demo polynomial (polynomial-evaluation.cpp:
    x^16 - x^11 + x^9 + x^5 - x^3 + x + 0.5 over small inputs)."""
    print("===== EvalPoly (power basis, Paterson-Stockmeyer) =====")
    ctx, sk, pk, rlk = _context()
    coeffs = np.zeros(17)
    coeffs[[0, 1, 3, 5, 9, 11, 16]] = [0.5, 1, -1, 1, 1, -1, 1]
    x = np.array([-0.8, -0.5, -0.2, 0.0, 0.2, 0.5, 0.8, 1.0])
    ct = ctx.encrypt(pk, x)
    t0 = time.time()
    out = ash.eval_poly(ctx, ct, coeffs, rlk)
    dt = time.time() - t0
    got = ctx.decrypt(sk, out).real[:x.size]
    want = np.polyval(coeffs[::-1], x)
    print("inputs :", x)
    print("P(x)   :", np.round(got, 6))
    print(f"max err: {np.abs(got - want).max():.2e}  ({dt:.1f}s, degree 16 "
          f"-> Paterson-Stockmeyer with ~2*sqrt(deg) multiplications)")


def logistic_and_division():
    """EvalLogistic + EvalDivide via Chebyshev interpolation
    (function-evaluation.cpp's two demos, with its degree sweep note)."""
    print("\n===== EvalChebyshevFunction: logistic and 1/x =====")
    ctx, sk, pk, rlk = _context()
    x = np.linspace(-4.0, 4.0, 16)
    ct = ctx.encrypt(pk, x)
    for degree in (9, 27):
        out = ash.eval_logistic(ctx, ct, -4.0, 4.0, degree, rlk)
        got = ctx.decrypt(sk, out).real[:x.size]
        want = 1.0 / (1.0 + np.exp(-x))
        print(f"logistic degree {degree:2d}: max err "
              f"{np.abs(got - want).max():.2e} "
              f"(higher degree = more precision, more levels)")
    y = np.linspace(1.0, 5.0, 16)
    cty = ctx.encrypt(pk, y)
    out = ash.eval_divide(ctx, cty, 1.0, 5.0, 27, rlk)
    got = ctx.decrypt(sk, out).real[:y.size]
    print(f"1/x on [1,5], degree 27: max err "
          f"{np.abs(got - 1.0 / y).max():.2e}")


def linear_weighted_sum():
    """EvalLinearWSum (linearwsum-evaluation.cpp)."""
    print("\n===== EvalLinearWSum =====")
    ctx, sk, pk, rlk = _context(depth_limbs=4)
    rng = np.random.default_rng(5)
    vs = [rng.normal(size=ctx.params.slots) for _ in range(4)]
    weights = [0.25, -1.5, 3.0, 0.125]
    cts = [ctx.encrypt(pk, v) for v in vs]
    out = ash.eval_linear_wsum(ctx, cts, weights)
    got = ctx.decrypt(sk, out).real
    want = sum(w * v for w, v in zip(weights, vs))
    print("weights:", weights)
    print(f"max err: {np.abs(got - want).max():.2e}")


if __name__ == "__main__":
    polynomial_evaluation()
    logistic_and_division()
    linear_weighted_sum()
