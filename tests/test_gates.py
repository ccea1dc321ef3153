"""Gate/bootstrap truth-table tests at TOY, for GINX and AP.

Port of `src/binfhe/unittest/UnitTestFHEW.cpp`: KeySwitch, ModSwitch, NOT,
Bootstrap, and every gate over all four input combinations, via
encrypt -> gate -> decrypt round trips. Runs on the exact host oracle backend.
"""

import numpy as np
import pytest

from tfhe_tpu import BinFHEContext, Gate, Method, ParamSet
from tfhe_tpu import lwe

TRUTH = {
    Gate.OR: lambda a, b: a | b,
    Gate.AND: lambda a, b: a & b,
    Gate.NOR: lambda a, b: 1 - (a | b),
    Gate.NAND: lambda a, b: 1 - (a & b),
    Gate.XOR_FAST: lambda a, b: a ^ b,
    Gate.XNOR_FAST: lambda a, b: 1 - (a ^ b),
    Gate.XOR: lambda a, b: a ^ b,
    Gate.XNOR: lambda a, b: 1 - (a ^ b),
}


@pytest.fixture(scope="module")
def ginx_ctx():
    cc = BinFHEContext(seed=1234)
    cc.generate_binfhe_context(ParamSet.TOY, Method.GINX)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    return cc, sk


@pytest.fixture(scope="module")
def ap_ctx():
    cc = BinFHEContext(seed=4321)
    cc.generate_binfhe_context(ParamSet.TOY, Method.AP)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    return cc, sk


@pytest.mark.parametrize("gate", list(Gate))
def test_ginx_gate_truth_table(ginx_ctx, gate):
    cc, sk = ginx_ctx
    for m1 in (0, 1):
        for m2 in (0, 1):
            ct1 = cc.encrypt(sk, m1)
            ct2 = cc.encrypt(sk, m2)
            out = cc.eval_bin_gate(gate, ct1, ct2)
            assert int(cc.decrypt(sk, out)) == TRUTH[gate](m1, m2), (gate, m1, m2)


@pytest.mark.parametrize("gate", [Gate.AND, Gate.OR, Gate.NAND, Gate.NOR, Gate.XOR_FAST])
def test_ap_gate_truth_table(ap_ctx, gate):
    cc, sk = ap_ctx
    for m1 in (0, 1):
        for m2 in (0, 1):
            ct1 = cc.encrypt(sk, m1)
            ct2 = cc.encrypt(sk, m2)
            out = cc.eval_bin_gate(gate, ct1, ct2)
            assert int(cc.decrypt(sk, out)) == TRUTH[gate](m1, m2), (gate, m1, m2)


def test_not(ginx_ctx):
    cc, sk = ginx_ctx
    for m in (0, 1):
        ct = cc.encrypt(sk, m)
        assert int(cc.decrypt(sk, cc.eval_not(ct))) == 1 - m


def test_bootstrap(ginx_ctx):
    cc, sk = ginx_ctx
    for m in (0, 1):
        ct = cc.encrypt(sk, m)
        assert int(cc.decrypt(sk, cc.bootstrap(ct))) == m


def test_eval_constant(ginx_ctx):
    cc, sk = ginx_ctx
    for v in (False, True):
        assert int(cc.decrypt(sk, cc.eval_constant(v))) == int(v)


def test_key_switch(ginx_ctx):
    cc, sk = ginx_ctx
    p = cc.params.lwe
    sk_n = cc.key_gen_n()
    ksk = cc.key_switch_gen(sk, sk_n)
    for m in (0, 1, 2, 3):
        ct_n = lwe.encrypt(cc.rng, p, sk_n, m, 4, p.q_ks)
        ct = lwe.key_switch(p, ksk, ct_n)
        assert int(lwe.decrypt(p, lwe.LWEPrivateKey(sk.s, p.q_ks), ct, 4)) == m


def test_mod_switch(ginx_ctx):
    cc, sk = ginx_ctx
    p = cc.params.lwe
    for m in (0, 1, 2, 3):
        ct = cc.encrypt(sk, m, mod=p.q_ks)
        ctq = lwe.mod_switch(p.q, ct)
        assert int(cc.decrypt(sk, ctq)) == m


def test_chained_gates(ginx_ctx):
    """Mini version of UnitTestFHEWDeep: feed gate outputs back in repeatedly."""
    cc, sk = ginx_ctx
    ct1 = cc.encrypt(sk, 1)
    ct0 = cc.encrypt(sk, 0)
    cur, cur_val = ct1, 1
    for i in range(6):
        other, other_val = (ct1, 1) if i % 2 == 0 else (ct0, 0)
        cur = cc.eval_bin_gate(Gate.NAND, cur, other)
        cur_val = 1 - (cur_val & other_val)
        assert int(cc.decrypt(sk, cur)) == cur_val, i


def test_signed_mod_paramset():
    """SIGNED_MOD_TEST validates signed modular reduction in the accumulator
    (UnitTestFHEW.cpp:352-387)."""
    cc = BinFHEContext(seed=99)
    cc.generate_binfhe_context(ParamSet.SIGNED_MOD_TEST, Method.GINX)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    for m1 in (0, 1):
        for m2 in (0, 1):
            out = cc.eval_bin_gate(Gate.AND, cc.encrypt(sk, m1), cc.encrypt(sk, m2))
            assert int(cc.decrypt(sk, out)) == (m1 & m2)


def test_batched_gate_matches_scalar(ginx_ctx):
    """Batched EvalBinGate (the GPU-path analogue) on an array of ciphertexts."""
    cc, sk = ginx_ctx
    m1 = np.array([0, 0, 1, 1, 1, 0, 1, 0])
    m2 = np.array([0, 1, 0, 1, 1, 1, 0, 0])
    ct1 = cc.encrypt(sk, m1)
    ct2 = cc.encrypt(sk, m2)
    out = cc.eval_bin_gate(Gate.NAND, ct1, ct2)
    dec = cc.decrypt(sk, out)
    np.testing.assert_array_equal(np.asarray(dec, dtype=np.int64),
                                  1 - (m1 & m2))
