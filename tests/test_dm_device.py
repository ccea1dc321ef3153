"""DM/AP accumulator on the device backend — bit-exact vs the host oracle.

The reference never shipped this (its DM GPU path is commented out,
rgsw-acc-dm.cpp:361-464); here DM runs on-device with one-hot MXU key
selection."""

import numpy as np
import pytest

from tfhe_tpu import BinFHEContext, Gate, Method, ParamSet
from tfhe_tpu.ops.backend import JaxBackend


@pytest.fixture(scope="module")
def ctx():
    cc = BinFHEContext(seed=21)
    cc.generate_binfhe_context(ParamSet.TOY, Method.AP)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    return cc, sk


def test_dm_device_gate_bit_exact(ctx):
    cc, sk = ctx
    rng = np.random.default_rng(0)
    m1 = rng.integers(0, 2, 8)
    m2 = rng.integers(0, 2, 8)
    ct1, ct2 = cc.encrypt(sk, m1), cc.encrypt(sk, m2)
    ref_out = cc.eval_bin_gate(Gate.NAND, ct1, ct2)

    backend = JaxBackend()
    assert backend.supports(cc.params)
    cc.use_backend(backend)
    backend.setup(cc.params, cc.bt_key)
    dev_out = cc.eval_bin_gate(Gate.NAND, ct1, ct2)
    cc.device_clean()

    assert np.array_equal(np.asarray(cc.decrypt(sk, dev_out)), 1 - (m1 & m2))
    assert np.array_equal(np.asarray(ref_out.a), np.asarray(dev_out.a))
    assert np.array_equal(np.asarray(ref_out.b), np.asarray(dev_out.b))


def test_dm_device_eval_acc_bit_exact(ctx):
    cc, sk = ctx
    p = cc.params
    rng = np.random.default_rng(1)
    B = 4
    acc = rng.integers(0, p.lwe.Q, (B, 2, p.lwe.N)).astype(np.uint64)
    a = rng.integers(0, p.lwe.q, (B, p.lwe.n)).astype(np.uint64)

    from tfhe_tpu.ref.backend import RefBackend
    ref = RefBackend()
    want = ref.eval_acc(p, cc.bt_key, acc.copy(), a, p.lwe.q)

    backend = JaxBackend()
    backend.setup(p, cc.bt_key)
    got = backend.eval_acc(p, cc.bt_key, acc.copy(), a, p.lwe.q)
    assert np.array_equal(np.asarray(want, dtype=np.uint64),
                          np.asarray(got, dtype=np.uint64))
