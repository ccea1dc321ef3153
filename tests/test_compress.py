"""Compress / LevelReduce (rns-leveledshe.cpp Compress +
LevelReduceInternal): shrink result ciphertexts to a few towers before
transmission without changing the decrypted message."""

import numpy as np
import pytest

from tfhe_tpu.pke.bgv import BGVContext, BGVParams
from tfhe_tpu.pke.bgv_rns import BGVRnsContext
from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
from tfhe_tpu.pke.ckks_rns import CKKSRnsContext

N = 64


@pytest.fixture(scope="module")
def ckks():
    cc = CKKSContext(CKKSParams.create(N=N, mult_depth=3, scale_bits=40,
                                       limb_bits=50), seed=31)
    sk, pk = cc.key_gen()
    rns = CKKSRnsContext(cc, dnum=2)
    return cc, rns, sk, pk


def test_ckks_level_reduce_decrypts(ckks):
    cc, rns, sk, pk = ckks
    z = np.linspace(-1, 1, N // 2)
    ct = cc.encrypt(pk, z)
    red = rns.level_reduce(ct, 2)
    assert red.level_params.L == ct.level_params.L - 2
    assert red.scale == ct.scale
    np.testing.assert_allclose(cc.decrypt(sk, red).real, z, atol=1e-6)


def test_ckks_compress_after_mult(ckks):
    cc, rns, sk, pk = ckks
    rlk = rns.relin_key_gen_single(sk)
    z1 = np.linspace(-1, 1, N // 2)
    z2 = np.linspace(0.5, 1.5, N // 2)
    prod = rns.eval_mult(cc.encrypt(pk, z1), cc.encrypt(pk, z2), rlk)
    comp = rns.compress(prod, towers_left=1)
    assert comp.level_params.L == 1
    # the 1-tower ciphertext is ~L x smaller and still decrypts
    np.testing.assert_allclose(cc.decrypt(sk, comp).real, z1 * z2, atol=1e-4)
    full = cc.decrypt(sk, prod).real
    np.testing.assert_allclose(cc.decrypt(sk, comp).real, full, atol=1e-6)


def test_ckks_compress_flushes_deferred_rescale(ckks):
    cc, rns, sk, pk = ckks
    rlk = rns.relin_key_gen_single(sk)
    z1 = np.linspace(-1, 1, N // 2)
    z2 = np.linspace(0.5, 1.5, N // 2)
    deg2 = rns.eval_mult(cc.encrypt(pk, z1), cc.encrypt(pk, z2), rlk,
                         rescale=False)
    deg2.noise_deg = 2
    comp = rns.compress(deg2, towers_left=1)
    assert comp.noise_deg == 1 and comp.level_params.L == 1
    np.testing.assert_allclose(cc.decrypt(sk, comp).real, z1 * z2, atol=1e-4)


def test_bgv_compress_exact():
    T = 257
    cc = BGVContext(BGVParams.create(N=N, t=T, mult_depth=3), seed=33)
    sk, pk = cc.key_gen()
    rns = BGVRnsContext(cc, dnum=2, ks_limb_bits=28)
    rng = np.random.default_rng(0)
    v = rng.integers(0, T, N)
    ct = cc.encrypt_packed(pk, v)
    comp = rns.compress(ct, towers_left=1)
    assert comp.polys[0].params.L == 1
    np.testing.assert_array_equal(cc.decrypt_packed(sk, comp), v)
