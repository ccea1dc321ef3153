"""Chained-gate noise-growth stress (UnitTestFHEWDeep.cpp:42-249, shrunk):
long sequences of gates reusing bootstrapped outputs must stay correct."""

import numpy as np
import pytest

from tfhe_tpu import BinFHEContext, Gate, Method, ParamSet


@pytest.fixture(scope="module", params=[Method.GINX, Method.AP])
def ctx(request):
    cc = BinFHEContext(seed=1234)
    cc.generate_binfhe_context(ParamSet.TOY, request.param)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    return cc, sk


def test_deep_gate_chain(ctx):
    """60 sequential NAND/AND/OR gates, each consuming the previous output."""
    cc, sk = ctx
    rng = np.random.default_rng(0)
    cur_bit = 1
    cur = cc.encrypt(sk, cur_bit)
    gates = [Gate.NAND, Gate.AND, Gate.OR]
    for i in range(60):
        g = gates[i % 3]
        other_bit = int(rng.integers(0, 2))
        other = cc.encrypt(sk, other_bit)
        cur2 = cc.eval_bin_gate(g, cur, other)
        if g == Gate.NAND:
            cur_bit = 1 - (cur_bit & other_bit)
        elif g == Gate.AND:
            cur_bit = cur_bit & other_bit
        else:
            cur_bit = cur_bit | other_bit
        cur = cur2
        assert int(cc.decrypt(sk, cur)) == cur_bit, f"diverged at gate {i}"


def test_deep_not_and_bootstrap(ctx):
    """NOT chains interleaved with explicit Bootstrap refreshes."""
    cc, sk = ctx
    ct = cc.encrypt(sk, 0)
    bit = 0
    for i in range(10):
        ct = cc.eval_not(ct)
        bit = 1 - bit
        if i % 3 == 2:
            ct = cc.bootstrap(ct)
        assert int(cc.decrypt(sk, ct)) == bit
