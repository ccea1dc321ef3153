"""Packed (SIMD) encoding, slot-wise ops, and rotations for BFV
(packedencoding.cpp / EvalAutomorphism analogues)."""

import numpy as np
import pytest

from tfhe_tpu.pke import BFVContext, BFVParams
from tfhe_tpu.pke import encoding
from tfhe_tpu.ref import ntt as ref_ntt
from tfhe_tpu.utils.numtheory import ntt_prime, root_of_unity

N, T = 256, 12289   # prime, 12289 = 1 mod 512


def test_eval_order_assumption():
    """ref_ntt.forward index k holds the evaluation at psi^(2k+1)."""
    n = 16
    Q = ntt_prime(27, 2 * n)
    psi = root_of_unity(2 * n, Q)
    rng = np.random.default_rng(0)
    x = rng.integers(0, Q, n).astype(np.uint64)
    f = ref_ntt.forward(x[None], Q)[0]
    for k in range(n):
        want = sum(int(x[j]) * pow(psi, ((2 * k + 1) * j) % (2 * n), Q)
                   for j in range(n)) % Q
        assert int(f[k]) == want


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(1)
    v = rng.integers(0, T, N)
    np.testing.assert_array_equal(encoding.unpack(encoding.pack(v, T, N), T, N), v)


@pytest.fixture(scope="module")
def ctx():
    cc = BFVContext(BFVParams.create(N=N, t=T, mult_depth=1), seed=13)
    sk, pk = cc.key_gen()
    return cc, sk, pk


def test_packed_encrypt_slotwise_mult(ctx):
    cc, sk, pk = ctx
    rlk = cc.relin_key_gen(sk)
    rng = np.random.default_rng(2)
    v1 = rng.integers(0, T, N)
    v2 = rng.integers(0, T, N)
    ct1 = cc.encrypt_packed(pk, v1)
    ct2 = cc.encrypt_packed(pk, v2)
    np.testing.assert_array_equal(cc.decrypt_packed(sk, ct1), v1)
    np.testing.assert_array_equal(
        cc.decrypt_packed(sk, cc.eval_add(ct1, ct2)), (v1 + v2) % T)
    np.testing.assert_array_equal(
        cc.decrypt_packed(sk, cc.eval_mult(ct1, ct2, rlk)), (v1 * v2) % T)


def test_eval_rotate(ctx):
    cc, sk, pk = ctx
    rng = np.random.default_rng(3)
    v = rng.integers(0, T, N)
    ct = cc.encrypt_packed(pk, v)
    gk = cc.galois_key_gen(sk, steps=3)
    out = cc.decrypt_packed(sk, cc.eval_rotate(ct, gk))
    half = N // 2
    want = np.concatenate([np.roll(v[:half], -3), np.roll(v[half:], -3)])
    np.testing.assert_array_equal(out, want)


def test_string_encoding_roundtrip():
    """StringEncoding analogue: encrypt a string coefficient-wise."""
    from tfhe_tpu.pke import BFVContext, BFVParams
    from tfhe_tpu.pke import encoding
    cc = BFVContext(BFVParams.create(N=64, t=257, mult_depth=1), seed=8)
    sk, pk = cc.key_gen()
    msg = "hello tfhe_tpu"
    ct = cc.encrypt(pk, encoding.encode_string(msg, 257, 64))
    got = encoding.decode_string(cc.decrypt(sk, ct), 257, 64)
    assert got == msg
