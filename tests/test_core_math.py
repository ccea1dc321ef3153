"""Core math layer: primes, NTT, decomposition, RoundqQ.

Mirrors the reference's core unit tests (`src/core/unittest/UnitTestNTT.cpp`,
`UnitTestTransform.cpp`) plus golden checks of the derived parameter values."""

import numpy as np
import pytest

from tfhe_tpu.params import ParamSet, from_gpu_style, from_param_set
from tfhe_tpu.ref import modmath, ntt
from tfhe_tpu.utils.numtheory import is_prime, ntt_prime, root_of_unity


def test_ntt_prime_values():
    # TOY: largest prime == 1 mod 1024 below 2^27
    q = ntt_prime(27, 1024)
    assert is_prime(q) and q % 1024 == 1 and q < 2**27
    # classic STD128 (27, 2048) and the GPU 54-bit prime (54, 4096)
    q128 = ntt_prime(27, 2048)
    assert is_prime(q128) and q128 % 2048 == 1 and q128 < 2**27
    q54 = ntt_prime(54, 4096)
    assert is_prime(q54) and q54 % 4096 == 1 and q54 < 2**54


def test_param_derivations():
    p = from_param_set(ParamSet.STD128)
    assert p.lwe.n == 512 and p.lwe.N == 1024 and p.lwe.q == 1024
    assert p.lwe.q_ks == 1 << 14 and p.lwe.base_ks == 128
    assert p.lwe.digit_count_ks == 2
    assert p.rgsw.base_g == 1 << 7 and p.rgsw.digits_g == 4 and p.rgsw.digits_g2 == 8

    toy = from_param_set(ParamSet.TOY)
    assert toy.lwe.n == 64 and toy.lwe.N == 512 and toy.lwe.q == 512
    assert toy.lwe.q_ks == toy.lwe.Q  # PRIME sentinel

    # logQ=11 -> 27-bit prime -> ring dim 1024, q = 2N = 2048 (binfhecontext.cpp:70-102)
    g = from_gpu_style(ParamSet.STD128, arb_func=False, log_q=11)
    assert g.lwe.n == 1305 and g.lwe.N == 1024 and g.lwe.q == 2048
    assert g.lwe.Q < 2**27 and g.lwe.q_ks == 1 << 35
    assert g.rgsw.base_g == 1 << 5 and g.rgsw.digits_g == 6

    g12 = from_gpu_style(ParamSet.TOY, arb_func=True, log_q=12, num_digits_to_throw=1)
    assert g12.lwe.N == 2048 and g12.lwe.q == 2048 and g12.lwe.Q < 2**54
    assert g12.rgsw.base_g == 1 << 27 and g12.rgsw.digits_g == 2
    assert g12.rgsw.digits_g2 == 2  # (2 - 1 thrown) * 2


@pytest.mark.parametrize("N,nbits,m", [(512, 27, 1024), (1024, 27, 2048), (2048, 54, 4096)])
def test_negacyclic_ntt_roundtrip_and_convolution(N, nbits, m):
    Q = ntt_prime(nbits, m)
    rng = np.random.default_rng(0)
    if Q < 2**31:
        a = rng.integers(0, Q, N).astype(np.uint64)
        b = rng.integers(0, Q, N).astype(np.uint64)
    else:
        a = modmath.asarray(rng.integers(0, 2**54, N), Q)
        b = modmath.asarray(rng.integers(0, 2**54, N), Q)

    # round trip
    back = ntt.inverse(ntt.forward(a, Q), Q)
    np.testing.assert_array_equal(np.asarray(back, dtype=object), np.asarray(a, dtype=object))

    # eval-domain product == schoolbook negacyclic convolution (spot check N<=512 fully)
    got = ntt.negacyclic_convolve(a, b, Q)
    ai = [int(x) for x in a]
    bi = [int(x) for x in b]
    want = [0] * N
    for i in range(N):
        for j in range(N):
            k = i + j
            if k < N:
                want[k] = (want[k] + ai[i] * bi[j]) % Q
            else:
                want[k - N] = (want[k - N] - ai[i] * bi[j]) % Q
        if N > 512 and i > 2:  # full check only for small N
            break
    if N <= 512:
        assert [int(x) for x in got] == want


def test_root_of_unity_primitive():
    Q = ntt_prime(27, 1024)
    w = root_of_unity(1024, Q)
    assert pow(w, 1024, Q) == 1 and pow(w, 512, Q) == Q - 1


def test_round_q_Q():
    # exact round-half-up of v*q/Q, mod q
    Q, q = 134215681, 1024
    for v in [0, 1, Q - 1, Q // 2, 12345678]:
        exact = ((2 * v * q + Q) // (2 * Q)) % q
        assert modmath.round_q_Q(v, q, Q) == exact
    arr = np.array([0, 1, Q - 1, Q // 2, 12345678], dtype=np.uint64)
    out = modmath.round_q_Q(arr, q, Q)
    assert out.tolist() == [((2 * int(v) * q + Q) // (2 * Q)) % q for v in arr]


def test_signed_digit_decompose_reconstructs():
    from tfhe_tpu.ref.rgsw import signed_digit_decompose

    p = from_param_set(ParamSet.TOY)
    rg = p.rgsw
    Q, N = rg.Q, rg.N
    rng = np.random.default_rng(1)
    inp = rng.integers(0, Q, (2, N)).astype(np.uint64)
    dct = signed_digit_decompose(rg, inp)
    assert dct.shape == (rg.digits_g2, N)
    # digits are centered: residue in [0, baseG/2] or [Q - baseG/2, Q)
    half = rg.base_g // 2
    dd = dct.astype(np.int64)
    ok = (dd <= half) | (dd >= Q - half)
    assert ok.all()
    # weighted recombination == centered input mod Q
    base = rg.base_g
    for j in range(2):
        acc = np.zeros(N, dtype=object)
        for l in range(rg.digits_g):
            digit = modmath.to_signed(dct[j + 2 * l], Q).astype(object)
            acc += digit * (base**l)
        signed_in = modmath.to_signed(inp[j], Q).astype(object)
        assert ((acc - signed_in) % Q == 0).all()
