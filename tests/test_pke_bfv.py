"""BFVrns: encrypt/decrypt round-trips and homomorphic ops (pke module).

Mirrors the shape of the reference's `src/pke/unittest/utbfvrns` suite at
test-friendly ring dimensions."""

import numpy as np
import pytest

from tfhe_tpu.pke import BFVContext, BFVParams
from tfhe_tpu.pke.dcrt import DCRTParams, DCRTPoly


@pytest.fixture(scope="module")
def ctx():
    params = BFVParams.create(N=256, t=257, mult_depth=1)
    cc = BFVContext(params, seed=42)
    sk, pk = cc.key_gen()
    return cc, sk, pk


def test_dcrt_roundtrip_and_ring_product():
    p = DCRTParams.create(64, 2, bits=54)
    rng = np.random.default_rng(0)
    a = rng.integers(-50, 50, 64)
    b = rng.integers(-50, 50, 64)
    pa = DCRTPoly.from_signed(p, a, eval_form=True)
    pb = DCRTPoly.from_signed(p, b, eval_form=True)
    prod = (pa * pb).to_centered_bigint()
    # schoolbook negacyclic reference
    want = [0] * 64
    for i in range(64):
        for j in range(64):
            k = i + j
            if k < 64:
                want[k] += int(a[i]) * int(b[j])
            else:
                want[k - 64] -= int(a[i]) * int(b[j])
    assert prod == want


def test_encrypt_decrypt(ctx):
    cc, sk, pk = ctx
    rng = np.random.default_rng(1)
    m = rng.integers(0, cc.params.t, cc.params.N)
    ct = cc.encrypt(pk, m)
    np.testing.assert_array_equal(cc.decrypt(sk, ct), m)


def test_add_sub_negate(ctx):
    cc, sk, pk = ctx
    rng = np.random.default_rng(2)
    t = cc.params.t
    m1 = rng.integers(0, t, cc.params.N)
    m2 = rng.integers(0, t, cc.params.N)
    ct1, ct2 = cc.encrypt(pk, m1), cc.encrypt(pk, m2)
    np.testing.assert_array_equal(cc.decrypt(sk, cc.eval_add(ct1, ct2)), (m1 + m2) % t)
    np.testing.assert_array_equal(cc.decrypt(sk, cc.eval_sub(ct1, ct2)), (m1 - m2) % t)
    np.testing.assert_array_equal(cc.decrypt(sk, cc.eval_negate(ct1)), (-m1) % t)


def test_mult_with_relin(ctx):
    cc, sk, pk = ctx
    rlk = cc.relin_key_gen(sk)
    rng = np.random.default_rng(3)
    t = cc.params.t
    m1 = rng.integers(0, t, cc.params.N)
    m2 = rng.integers(0, t, cc.params.N)
    ct1, ct2 = cc.encrypt(pk, m1), cc.encrypt(pk, m2)
    prod = cc.eval_mult(ct1, ct2, rlk)
    assert len(prod.polys) == 2
    # plaintext ring product: negacyclic convolution mod t
    want = np.zeros(cc.params.N, dtype=np.int64)
    for i in range(cc.params.N):
        for j in range(cc.params.N):
            k = i + j
            v = int(m1[i]) * int(m2[j])
            if k < cc.params.N:
                want[k] += v
            else:
                want[k - cc.params.N] -= v
    want %= t
    np.testing.assert_array_equal(cc.decrypt(sk, prod), want)


def test_mult_without_relin_decrypts_degree2(ctx):
    cc, sk, pk = ctx
    m1 = np.array([3]); m2 = np.array([5])
    ct1, ct2 = cc.encrypt(pk, m1), cc.encrypt(pk, m2)
    prod = cc.eval_mult(ct1, ct2)
    assert len(prod.polys) == 3
    assert int(cc.decrypt(sk, prod)[0]) == 15


def test_pke_serialization_roundtrip(tmp_path, ctx):
    """Keys + ciphertext survive save/load; decrypt is bit-identical
    (the pke side of the cereal checkpointing, src/pke/lib/*-ser.cpp)."""
    from tfhe_tpu.pke import serial as pke_serial
    from tfhe_tpu.pke.bfv import BFVContext
    cc, sk, pk = ctx
    rlk = cc.relin_key_gen(sk)
    kp = str(tmp_path / "keys.npz")
    cp = str(tmp_path / "ct.npz")
    pke_serial.save_keys(kp, cc.params, sk=sk, pk=pk, rlk=rlk)
    params2, sk2, pk2, rlk2 = pke_serial.load_keys(kp)
    assert params2.Q == cc.params.Q

    m = np.arange(cc.params.N) % cc.params.t
    ct = cc.encrypt(pk, m)
    pke_serial.save_ciphertext(cp, ct)
    ct2 = pke_serial.load_ciphertext(cp)

    cc2 = BFVContext(params2, seed=0)
    np.testing.assert_array_equal(cc2.decrypt(sk2, ct2), m)
    # reloaded keys still multiply correctly
    prod = cc2.eval_mult(ct2, ct2, rlk2)
    got = cc2.decrypt(sk2, prod)
    assert got.shape == (cc.params.N,)


def test_gen_crypto_context_factory():
    from tfhe_tpu.pke.context import gen_crypto_context
    cc = gen_crypto_context("BFV", N=128, mult_depth=1, plaintext_modulus=257, seed=1)
    sk, pk = cc.key_gen()
    m = np.arange(128) % 257
    np.testing.assert_array_equal(cc.decrypt(sk, cc.encrypt(pk, m)), m)
    ck = gen_crypto_context("CKKS", N=128, mult_depth=1, scale_bits=30, seed=2)
    csk, cpk = ck.key_gen()
    z = np.linspace(0, 1, ck.params.slots)
    assert np.max(np.abs(ck.decrypt(csk, ck.encrypt(cpk, z)) - z)) < 1e-3
