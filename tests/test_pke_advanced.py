"""Advanced SHE (EvalSum/inner product), PRE, and threshold tests
(base-advancedshe / base-pre / base-multiparty analogues)."""

import numpy as np
import pytest

from tfhe_tpu.pke import BFVContext, BFVParams
from tfhe_tpu.pke import advanced as adv

N, T = 128, 7681   # 7681 = 1 mod 256, prime (packed encoding works)


@pytest.fixture(scope="module")
def ctx():
    cc = BFVContext(BFVParams.create(N=N, t=T, mult_depth=1), seed=23)
    sk, pk = cc.key_gen()
    return cc, sk, pk


def test_eval_sum(ctx):
    cc, sk, pk = ctx
    keys = adv.eval_sum_key_gen(cc, sk)
    rng = np.random.default_rng(0)
    v = rng.integers(0, 50, N)
    ct = cc.encrypt_packed(pk, v)
    out = cc.decrypt_packed(sk, adv.eval_sum(cc, ct, keys))
    half = N // 2
    # each half's slots all hold that half's sum
    assert np.all(out[:half] == int(v[:half].sum()) % T)
    assert np.all(out[half:] == int(v[half:].sum()) % T)


def test_eval_inner_product(ctx):
    cc, sk, pk = ctx
    rlk = cc.relin_key_gen(sk)
    keys = adv.eval_sum_key_gen(cc, sk)
    rng = np.random.default_rng(1)
    half = N // 2
    v1 = np.zeros(N, dtype=np.int64)
    v2 = np.zeros(N, dtype=np.int64)
    v1[:half] = rng.integers(0, 10, half)
    v2[:half] = rng.integers(0, 10, half)
    ct = adv.eval_inner_product(cc, cc.encrypt_packed(pk, v1),
                                cc.encrypt_packed(pk, v2), rlk, keys)
    out = cc.decrypt_packed(sk, ct)
    assert int(out[0]) == int((v1 * v2).sum()) % T


def test_proxy_re_encryption(ctx):
    cc, sk_a, pk_a = ctx
    sk_b, pk_b = cc.key_gen()
    rk = adv.re_key_gen(cc, sk_a, sk_b)
    rng = np.random.default_rng(2)
    m = rng.integers(0, T, N)
    ct_a = cc.encrypt(pk_a, m)
    ct_b = adv.re_encrypt(cc, ct_a, rk)
    np.testing.assert_array_equal(cc.decrypt(sk_b, ct_b), m)
    # and the delegatee's key alone cannot be the original
    assert not np.array_equal(np.asarray(sk_a.s_signed), np.asarray(sk_b.s_signed))


def test_threshold_decrypt(ctx):
    cc, _, _ = ctx
    parties, joint_pk, joint_sk = adv.multiparty_key_gen(cc, 3)
    rng = np.random.default_rng(3)
    m = rng.integers(0, T, N)
    ct = cc.encrypt(joint_pk, m)
    # full joint-secret decryption works
    np.testing.assert_array_equal(cc.decrypt(joint_sk, ct), m)
    # distributed decryption: one lead + partials
    shares = [adv.multiparty_decrypt_lead(cc, parties[0], ct)]
    shares += [adv.multiparty_decrypt_main(cc, p, ct) for p in parties[1:]]
    np.testing.assert_array_equal(adv.multiparty_decrypt_fusion(cc, shares), m)


def test_threshold_shares_are_flooded(ctx):
    """Each partial decryption carries sigma = MP_SD = 2^20 flooding noise
    (base-multiparty.cpp's 'e is added to do noise flooding'): the share
    minus the exact c1*s term must be a ~2^20-std Gaussian, not the bare
    scheme noise."""
    import tfhe_tpu.pke.advanced as adv
    cc = ctx[0]
    parties, joint_pk, joint_sk = adv.multiparty_key_gen(cc, 2)
    m = np.arange(cc.params.N) % cc.params.t
    ct = cc.encrypt(joint_pk, m)
    share = adv.multiparty_decrypt_main(cc, parties[1], ct)
    exact = ct.polys[1] * parties[1].s
    resid = (share - exact).to_centered_bigint()
    std = np.std(np.array([float(x) for x in resid]))
    assert 0.5 * adv.MP_SD < std < 2.0 * adv.MP_SD
    # and fusion still decrypts correctly through the flooding
    shares = [adv.multiparty_decrypt_lead(cc, parties[0], ct),
              adv.multiparty_decrypt_main(cc, parties[1], ct)]
    np.testing.assert_array_equal(adv.multiparty_decrypt_fusion(cc, shares), m)


def test_pre_hra_rerandomized(ctx):
    """ReEncrypt with the delegator's public key re-randomizes with a
    flooded zero-encryption (HRA mode, base-pre.cpp:55-62): still decrypts
    under the delegatee's key, and the output differs from the plain
    re-encryption by flooding-scale randomness."""
    import tfhe_tpu.pke.advanced as adv
    cc = ctx[0]
    sk_a, pk_a = cc.key_gen()
    sk_b, pk_b = cc.key_gen()
    rk = adv.re_key_gen(cc, sk_a, sk_b)
    m = (np.arange(cc.params.N) * 7) % cc.params.t
    ct = cc.encrypt(pk_a, m)
    plain = adv.re_encrypt(cc, ct, rk)
    hra = adv.re_encrypt(cc, ct, rk, public_key=pk_a)
    np.testing.assert_array_equal(cc.decrypt(sk_b, hra), m)
    d = (hra.polys[0] - plain.polys[0]).to_centered_bigint()
    assert np.std([float(x) for x in d]) > 0.1 * adv.MP_SD
