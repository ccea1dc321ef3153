"""Production-n noise validation: 1305-round bootstraps in CI.

The STD128-class accelerated configs use n = 1305 LWE rounds
(binfhecontext.cpp:96); every fast CI fixture elsewhere shrinks n, so noise
accumulated across the full 1305-round rotation (and across chained gates
reusing bootstrapped outputs — UnitTestFHEWDeep.cpp's stress pattern) was
only visible on hardware. This module runs the real device pipeline (XLA on
the CPU test mesh) at n = 1305 with a CI-sized ring (N = 1024, 27-bit Q), so
a mis-scaled sampler sigma or a lost bit of precision in the rotation path
fails here rather than on a TPU.

Runtime: ~35 s keygen (module fixture) + ~6 s per chained gate.
"""

import numpy as np
import pytest

from tfhe_tpu import BinFHEContext, Gate
from tfhe_tpu.utils.numtheory import ntt_prime


@pytest.fixture(scope="module")
def ctx1305():
    from tfhe_tpu.params import BinFHEParams, LWEParams, Method, RGSWParams

    N, q = 512, 1024
    Q = ntt_prime(27, 2 * N)
    cc = BinFHEContext(seed=20260817)
    # STD128-shaped: full n = 1305 rounds, qKS = 2^14 / baseKS = 32 key switch
    cc.params = BinFHEParams(
        lwe=LWEParams(n=1305, N=N, q=q, Q=Q, q_ks=1 << 14, std=3.19,
                      base_ks=32),
        rgsw=RGSWParams(N=N, Q=Q, q=q, base_g=1 << 9, base_r=32,
                        method=Method.GINX, std=3.19))
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    cc.device_setup()
    yield cc, sk
    cc.device_clean()


def test_chained_gates_production_n(ctx1305):
    """Chained gate evaluations reusing bootstrapped outputs, decrypted and
    checked at every step (the FHEWDeep stress pattern at full n)."""
    cc, sk = ctx1305
    m1 = np.array([0, 1, 0, 1])
    m2 = np.array([0, 0, 1, 1])
    ct_a = cc.encrypt(sk, m1)
    ct_b = cc.encrypt(sk, m2)
    val_a, val_b = m1, m2
    gates = [Gate.NAND, Gate.AND, Gate.OR, Gate.NOR, Gate.XOR_FAST,
             Gate.NAND, Gate.OR, Gate.AND, Gate.XNOR_FAST, Gate.NAND,
             Gate.NOR, Gate.OR, Gate.AND, Gate.NAND, Gate.OR, Gate.AND]
    ops = {Gate.NAND: lambda a, b: 1 - (a & b), Gate.AND: lambda a, b: a & b,
           Gate.OR: lambda a, b: a | b, Gate.NOR: lambda a, b: 1 - (a | b),
           Gate.XOR_FAST: lambda a, b: a ^ b,
           Gate.XNOR_FAST: lambda a, b: 1 - (a ^ b)}
    for i, g in enumerate(gates):
        out = cc.eval_bin_gate(g, ct_a, ct_b)
        want = ops[g](val_a, val_b)
        got = np.asarray(cc.decrypt(sk, out), dtype=np.int64)
        assert np.array_equal(got, want), f"step {i} ({g}): {got} vs {want}"
        # feed the bootstrapped output back in (the deep-chain reuse pattern)
        ct_b, val_b = ct_a, val_a
        ct_a, val_a = out, want


def test_eval_floor_production_n(ctx1305):
    """Functional bootstrapping (EvalFloor, 2 bootstraps/round) at n=1305."""
    cc, sk = ctx1305
    p = cc.get_max_plaintext_space()
    m = np.array([1, p // 3, p // 2, p - 1])
    ct = cc.encrypt(sk, m, "FRESH", p)
    out = cc.eval_floor(ct, 1)
    got = np.asarray(cc.decrypt(sk, out, p // 2), dtype=np.int64)
    np.testing.assert_array_equal(got, m // 2)
