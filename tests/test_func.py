"""Functional bootstrapping tests (EvalFunc / EvalFloor / EvalSign / EvalDecomp
/ multi-LUT / CiphertextMulMatrix) at accelerated-style TOY parameters.

Port of `src/binfhe/unittest/UnitTestFunc.cpp` and the GPU example
`src/binfhe/examples/unittest.cpp`, shrunk to logQ values that keep the host
oracle fast."""

import numpy as np
import pytest

from tfhe_tpu import BinFHEContext, Gate, ParamSet


@pytest.fixture(scope="module")
def arb_ctx():
    """TOY, arbitrary functions enabled, logQ=12 (54-bit ring prime, q = N)."""
    cc = BinFHEContext(seed=2024)
    cc.generate_binfhe_context(ParamSet.TOY, arb_func=True, log_q=12)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    return cc, sk


@pytest.fixture(scope="module")
def floor_ctx():
    """TOY, logQ=12, q = 2N (for flooring/sign; arb_func=False)."""
    cc = BinFHEContext(seed=77)
    cc.generate_binfhe_context(ParamSet.TOY, arb_func=False, log_q=12)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    return cc, sk


def _cube(m, p1):
    if m < p1:
        return (m * m * m) % p1
    return ((m - p1 // 2) ** 3) % p1


def test_eval_arb_func(arb_ctx):
    """f(x) = x^3 mod p over every plaintext (UnitTestFunc.cpp:44-66)."""
    cc, sk = arb_ctx
    p = cc.get_max_plaintext_space()
    lut = cc.generate_lut_via_function(_cube, p)
    for i in range(p):
        ct = cc.encrypt(sk, i % p, "FRESH", p)
        out = cc.eval_func(ct, lut)
        assert int(cc.decrypt(sk, out, p)) == _cube(i, p), i


def test_eval_func_batched_and_multi_lut(arb_ctx):
    cc, sk = arb_ctx
    p = cc.get_max_plaintext_space()
    lut_cube = cc.generate_lut_via_function(_cube, p)
    lut_sq = cc.generate_lut_via_function(lambda m, p1: (m * m) % p1, p)

    msgs = np.arange(p)
    cts = cc.encrypt(sk, msgs, "FRESH", p)
    out = cc.eval_func(cts, lut_cube)
    dec = np.asarray(cc.decrypt(sk, out, p), dtype=np.int64)
    np.testing.assert_array_equal(dec, [_cube(i, p) for i in range(p)])

    # per-ciphertext LUTs (the GPU-only multi-LUT overload,
    # binfhe-base-scheme.cpp:791-924)
    luts = np.stack([lut_cube, lut_sq] * (p // 2))
    out2 = cc.eval_func(cts, luts, per_ct_luts=True)
    dec2 = np.asarray(cc.decrypt(sk, out2, p), dtype=np.int64)
    want = [_cube(i, p) if i % 2 == 0 else (i * i) % p for i in range(p)]
    np.testing.assert_array_equal(dec2, want)


def test_eval_floor(floor_ctx):
    """Round away one bit (UnitTestFunc.cpp:69-96)."""
    cc, sk = floor_ctx
    p = cc.get_max_plaintext_space()
    for i in range(p // 2 - 2, p // 2 + 2):
        ct = cc.encrypt(sk, i % p, "FRESH", p)
        out = cc.eval_floor(ct, 1)
        assert int(cc.decrypt(sk, out, p // 2)) == i // 2, i


def test_eval_sign():
    """Large-precision sign (UnitTestFunc.cpp:99-160, shrunk to logQ=17)."""
    cc = BinFHEContext(seed=5)
    cc.generate_binfhe_context(ParamSet.TOY, arb_func=False, log_q=17)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    Q_enc = 1 << 17
    q = cc.params.lwe.q
    factor = Q_enc // q
    p = cc.get_max_plaintext_space()
    for i in (0, 2, 4, 6):
        ct = cc.encrypt(sk, p * factor // 2 + i - 3, "FRESH", p * factor, Q_enc)
        out = cc.eval_sign(ct)
        assert int(cc.decrypt(sk, out, 2)) == int(i >= 3), i


def test_eval_decomp():
    """Digit decomposition (UnitTestFunc.cpp EvalDigitDecomp, shrunk)."""
    cc = BinFHEContext(seed=6)
    cc.generate_binfhe_context(ParamSet.TOY, arb_func=False, log_q=17)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    Q_enc = 1 << 17
    q = cc.params.lwe.q
    factor = Q_enc // q
    p_basic = cc.get_max_plaintext_space()
    P = p_basic * factor
    import math
    for i in (P // 2 - 3, P // 2 + 2):
        ct = cc.encrypt(sk, i, "FRESH", P, Q_enc)
        digits = cc.eval_decomp(ct)
        assert len(digits) == int(math.ceil(math.log(factor) / math.log(p_basic))) + 1
        # reconstruct: digit d_k holds (i // p^k) mod p (last digit mod small space)
        val = i
        for k, dct in enumerate(digits[:-1]):
            assert int(cc.decrypt(sk, dct, p_basic)) == val % p_basic, (i, k)
            val //= p_basic


def test_ciphertext_mul_matrix(arb_ctx):
    """Exact LWE x matrix product (GEMM.cpp semantics, computed exactly)."""
    cc, sk = arb_ctx
    p = cc.get_max_plaintext_space()
    K, M = 6, 4
    msgs = np.arange(K) % p
    cts = cc.encrypt(sk, msgs, "FRESH", p, cc.params.lwe.q_ks)
    rng = np.random.default_rng(0)
    matrix = rng.integers(-3, 4, (K, M))
    out = cc.ciphertext_mul_matrix(cts, matrix, cc.params.lwe.q_ks)
    # verify component-wise against direct modular linear combination
    mod = cc.params.lwe.q_ks
    for j in range(M):
        want_a = np.zeros(cts.a.shape[1], dtype=object)
        want_b = 0
        for k in range(K):
            want_a = (want_a + int(matrix[k, j]) * cts.a[k].astype(object)) % mod
            want_b = (want_b + int(matrix[k, j]) * int(cts.b[k])) % mod
        np.testing.assert_array_equal(out.a[j].astype(object), want_a)
        assert int(out.b[j]) == want_b


def test_ciphertext_mul_matrix_device(arb_ctx):
    """Device (int8-limb MXU) GEMM matches the exact host path bit-for-bit,
    including big signed entries and the 54-bit ring modulus."""
    from tfhe_tpu.ops.lweops import (ciphertext_mul_matrix,
                                     ciphertext_mul_matrix_device)
    cc, sk = arb_ctx
    p = cc.get_max_plaintext_space()
    rng = np.random.default_rng(1)
    for mod in (cc.params.lwe.q_ks, int(cc.params.lwe.Q)):
        K, M = 16, 8
        msgs = np.arange(K) % p
        cts = cc.encrypt(sk, msgs, "FRESH", p, cc.params.lwe.q_ks)
        matrix = rng.integers(-(1 << 40), 1 << 40, (K, M))
        want = ciphertext_mul_matrix(cts, matrix, mod)
        got = ciphertext_mul_matrix_device(cts, matrix, mod)
        np.testing.assert_array_equal(got.a, want.a)
        np.testing.assert_array_equal(got.b, want.b)


def test_eval_sign_restores_base_g_on_error(floor_ctx):
    """A failure mid-EvalSign must not leave the context's gadget base switched
    (scheme.py try/finally around change_base_g)."""
    from tfhe_tpu import scheme

    cc, sk = floor_ctx
    base_before = cc.params.rgsw.base_g

    class Boom(Exception):
        pass

    class FailingBackend:
        def setup(self, params, key):
            pass

        def eval_acc(self, *a, **k):
            raise Boom()

        def mkm_switch(self, *a, **k):
            raise Boom()

    ct = cc.encrypt(sk, 1, "FRESH", cc.get_max_plaintext_space() * 4, 1 << 14)
    keys = {base_before: cc.bt_key}
    with pytest.raises(Boom):
        scheme.eval_sign(FailingBackend(), cc.params, keys, ct, cc.get_beta())
    assert cc.params.rgsw.base_g == base_before
    with pytest.raises(Boom):
        scheme.eval_decomp(FailingBackend(), cc.params, keys, ct, cc.get_beta())
    assert cc.params.rgsw.base_g == base_before


def test_gate_test_poly_rejects_bad_modulus():
    """2N % q != 0 must raise, not silently mis-index (host-path guard)."""
    from tfhe_tpu import scheme
    from tfhe_tpu.params import Gate

    cc = BinFHEContext(seed=3)
    cc.generate_binfhe_context(ParamSet.TOY)
    with pytest.raises(ValueError):
        scheme._gate_test_poly(cc.params, Gate.AND, np.array([1]), 3 * 100)
    with pytest.raises(ValueError):
        scheme._func_test_poly(cc.params, np.array([1]), 3 * 100, 8,
                               lambda x, q, Q: x)


def test_lut_classification():
    from tfhe_tpu.scheme import check_input_function
    q = 16
    neg = [(i if i < 8 else (q - (i - 8)) % q) for i in range(16)]
    # construct a strictly negacyclic LUT: f[i+8] = -f[i]
    f = [1, 2, 3, 4, 5, 6, 7, 1]
    neg = f + [(q - x) % q for x in f]
    per = f + f
    arb = f + [3] * 8
    assert check_input_function(neg, q) == 0
    assert check_input_function(per, q) == 1
    assert check_input_function(arb, q) == 2


def test_eval_sign_time_optimization_on_device():
    """Dynamic-baseG sign (UnitTestFunc.cpp EvalSignFuncTime) through the JAX
    backend — the reference's GPUSetup rejects timeOptimization
    (binfhecontext.cpp:352-354); here the multi-baseG key map runs on device."""
    cc = BinFHEContext(seed=9)
    cc.generate_binfhe_context(ParamSet.TOY, arb_func=False, log_q=17,
                               time_optimization=True)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    assert len(cc.bt_key_map) >= 2
    cc.device_setup()
    Q_enc = 1 << 17
    q = cc.params.lwe.q
    factor = Q_enc // q
    p = cc.get_max_plaintext_space()
    for i in (0, 5):
        ct = cc.encrypt(sk, p * factor // 2 + i - 3, "FRESH", p * factor, Q_enc)
        out = cc.eval_sign(ct)
        assert int(cc.decrypt(sk, out, 2)) == int(i >= 3), i
