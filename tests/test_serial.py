"""Serialization round trips (port of UnitTestFHEWSerial.cpp: context, refresh
key, switching key, and ciphertext survive a save/load, and a gate evaluated
with reloaded keys still decrypts correctly)."""

import numpy as np

from tfhe_tpu import BinFHEContext, Gate, ParamSet
from tfhe_tpu.utils import serial


def test_context_key_ciphertext_roundtrip(tmp_path):
    cc = BinFHEContext(seed=123)
    cc.generate_binfhe_context(ParamSet.TOY)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)

    ctx_path = str(tmp_path / "ctx.npz")
    sk_path = str(tmp_path / "sk.npz")
    ct_path = str(tmp_path / "ct.npz")
    cc.save(ctx_path)
    serial.save_private_key(sk_path, sk)
    ct1 = cc.encrypt(sk, 1)
    serial.save_ciphertext(ct_path, ct1)

    cc2 = BinFHEContext.load(ctx_path, seed=456)
    sk2 = serial.load_private_key(sk_path)
    ct1b = serial.load_ciphertext(ct_path)

    # identical key material
    np.testing.assert_array_equal(cc2.bt_key.bsk_coeff, cc.bt_key.bsk_coeff)
    np.testing.assert_array_equal(cc2.bt_key.ksk.A, cc.bt_key.ksk.A)
    np.testing.assert_array_equal(np.asarray(ct1b.a), np.asarray(ct1.a))
    assert cc2.params.lwe.Q == cc.params.lwe.Q

    # a gate evaluated entirely in the reloaded context decrypts correctly
    ct2 = cc2.encrypt(sk2, 0)
    out = cc2.eval_bin_gate(Gate.NAND, ct1b, ct2)
    assert int(cc2.decrypt(sk2, out)) == 1

    # and matches the original context bit-for-bit on the same inputs
    out_orig = cc.eval_bin_gate(Gate.NAND, ct1b, ct2)
    np.testing.assert_array_equal(out.a, out_orig.a)
    assert int(out.b) == int(out_orig.b)


def test_bytes_roundtrip():
    cc = BinFHEContext(seed=9)
    cc.generate_binfhe_context(ParamSet.TOY)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    blob = serial.dumps_context(cc.params, cc.bt_key)
    params2, keys2 = serial.loads_context(blob)
    assert params2.lwe.Q == cc.params.lwe.Q
    np.testing.assert_array_equal(keys2[cc.params.rgsw.base_g].bsk_coeff,
                                  cc.bt_key.bsk_coeff)


def test_json_context_roundtrip(tmp_path):
    """JSON variant (cereal SerType::JSON analogue): gate result bit-identical
    after reload, mirroring boolean-serial-json.cpp."""
    from tfhe_tpu.utils import serial
    cc = BinFHEContext(seed=31)
    cc.generate_binfhe_context(ParamSet.TOY)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    path = str(tmp_path / "ctx.json")
    serial.save_context_json(path, cc.params, cc.bt_key)
    params2, keys2 = serial.load_context_json(path)
    assert params2.lwe.Q == cc.params.lwe.Q
    cc2 = BinFHEContext(seed=31)
    cc2.params = params2
    cc2.bt_key_load(next(iter(keys2.values())))
    ct1, ct2 = cc.encrypt(sk, 1), cc.encrypt(sk, 0)
    out1 = cc.eval_bin_gate(Gate.NAND, ct1, ct2)
    out2 = cc2.eval_bin_gate(Gate.NAND, ct1, ct2)
    assert np.array_equal(np.asarray(out1.a), np.asarray(out2.a))
    assert int(out1.b) == int(out2.b)
