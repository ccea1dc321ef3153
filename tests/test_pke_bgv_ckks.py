"""BGV and CKKS scheme tests (pke module, utbgvrns/utckksrns analogues)."""

import numpy as np
import pytest

from tfhe_tpu.pke.bgv import BGVContext, BGVParams
from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams


@pytest.fixture(scope="module")
def bgv():
    cc = BGVContext(BGVParams.create(N=256, t=257, mult_depth=1), seed=7)
    sk, pk = cc.key_gen()
    return cc, sk, pk


def test_bgv_roundtrip_add(bgv):
    cc, sk, pk = bgv
    rng = np.random.default_rng(0)
    t = cc.params.t
    m1 = rng.integers(0, t, cc.params.N)
    m2 = rng.integers(0, t, cc.params.N)
    ct1, ct2 = cc.encrypt(pk, m1), cc.encrypt(pk, m2)
    np.testing.assert_array_equal(cc.decrypt(sk, ct1), m1)
    np.testing.assert_array_equal(cc.decrypt(sk, cc.eval_add(ct1, ct2)), (m1 + m2) % t)


def test_bgv_mult_relin(bgv):
    cc, sk, pk = bgv
    rlk = cc.relin_key_gen(sk)
    m1 = np.array([3, 0, 1])
    m2 = np.array([5, 2, 0])
    ct = cc.eval_mult(cc.encrypt(pk, m1), cc.encrypt(pk, m2), rlk)
    assert len(ct.polys) == 2
    dec = cc.decrypt(sk, ct)
    # (3 + X^2)(5 + 2X) = 15 + 6X + 5X^2 + 2X^3
    assert list(dec[:4]) == [15, 6, 5, 2]


@pytest.fixture(scope="module")
def ckks():
    cc = CKKSContext(CKKSParams.create(N=256, mult_depth=1, scale_bits=36,
                                       limb_bits=50), seed=8)
    sk, pk = cc.key_gen()
    return cc, sk, pk


def test_ckks_encode_decode():
    from tfhe_tpu.pke.ckks import encode, decode
    p = CKKSParams.create(N=256, mult_depth=0, scale_bits=36, limb_bits=50)
    rng = np.random.default_rng(1)
    z = rng.normal(size=p.slots) + 1j * rng.normal(size=p.slots)
    coeffs = encode(p, z)
    back = decode(p, [int(c) for c in coeffs], p.scale)
    assert np.max(np.abs(back - z)) < 1e-6


def test_ckks_encrypt_decrypt_add(ckks):
    cc, sk, pk = ckks
    rng = np.random.default_rng(2)
    z1 = rng.normal(size=cc.params.slots)
    z2 = rng.normal(size=cc.params.slots)
    ct1, ct2 = cc.encrypt(pk, z1), cc.encrypt(pk, z2)
    d1 = cc.decrypt(sk, ct1)
    assert np.max(np.abs(d1 - z1)) < 1e-4
    ds = cc.decrypt(sk, cc.eval_add(ct1, ct2))
    assert np.max(np.abs(ds - (z1 + z2))) < 1e-4


def test_ckks_mult_rescale(ckks):
    cc, sk, pk = ckks
    rlk = cc.relin_key_gen(sk)
    rng = np.random.default_rng(3)
    z1 = rng.normal(size=cc.params.slots)
    z2 = rng.normal(size=cc.params.slots)
    prod = cc.eval_mult(cc.encrypt(pk, z1), cc.encrypt(pk, z2), rlk)
    assert len(prod.polys) == 2
    assert prod.level_params.L == cc.params.dcrt.L - 1   # rescaled one level
    d = cc.decrypt(sk, prod)
    assert np.max(np.abs(d - z1 * z2)) < 1e-2


def test_bgv_mod_switch_leveled(bgv):
    """ModReduce preserves the message and enables leveled circuits
    (rns-leveledshe.cpp analogue)."""
    cc, sk, pk = bgv
    rlk = cc.relin_key_gen(sk)
    rng = np.random.default_rng(4)
    t = cc.params.t
    m1 = rng.integers(0, t, cc.params.N)
    m2 = rng.integers(0, t, cc.params.N)
    ct = cc.eval_mult(cc.encrypt(pk, m1), cc.encrypt(pk, m2), rlk)
    ct = cc.mod_switch(ct)
    assert ct.polys[0].params.L == cc.params.dcrt.L - 1
    want = np.zeros(cc.params.N, dtype=np.int64)
    for i in range(cc.params.N):
        for j in range(cc.params.N):
            k, v = i + j, int(m1[i]) * int(m2[j])
            if k < cc.params.N:
                want[k] += v
            else:
                want[k - cc.params.N] -= v
    np.testing.assert_array_equal(cc.decrypt(sk, ct), want % t)


def test_ckks_depth2_chain(ckks):
    """Two multiplications with rescale at each level (leveled CKKS)."""
    from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
    cc = CKKSContext(CKKSParams.create(N=256, mult_depth=2, scale_bits=38,
                                       limb_bits=40), seed=9)
    sk, pk = cc.key_gen()
    rlk = cc.relin_key_gen(sk)
    rng = np.random.default_rng(5)
    z1 = rng.normal(size=cc.params.slots) * 0.5
    z2 = rng.normal(size=cc.params.slots) * 0.5
    z3 = rng.normal(size=cc.params.slots) * 0.5
    ct12 = cc.eval_mult(cc.encrypt(pk, z1), cc.encrypt(pk, z2), rlk)
    # bring z3 to the same level/scale before the second mult
    ct3 = cc.encrypt(pk, z3, scale=ct12.scale)
    from tfhe_tpu.pke.ckks import _at_level, CKKSCiphertext
    lp = ct12.level_params
    ct3 = CKKSCiphertext([_at_level(p, lp) for p in ct3.polys], ct3.scale, ct3.params)
    out = cc.eval_mult(ct12, ct3, rlk)
    d = cc.decrypt(sk, out)
    assert np.max(np.abs(d - z1 * z2 * z3)) < 1e-4


def test_bgv_packed_rotation():
    """BGV slot packing + rotation (EvalAtIndex at the BGV level, with
    t-scaled Galois-key noise)."""
    from tfhe_tpu.pke.bgv import BGVContext, BGVParams
    cc = BGVContext(BGVParams.create(N=256, t=7681, mult_depth=1), seed=3)
    sk, pk = cc.key_gen()
    v = np.arange(1, 257) % 50
    ct = cc.encrypt_packed(pk, v)
    np.testing.assert_array_equal(cc.decrypt_packed(sk, ct), v)
    gk = cc.galois_key_gen(sk, 1)
    out = cc.decrypt_packed(sk, cc.eval_rotate(ct, gk))
    # same slot-shift semantics as the BFV rotation over the packed layout:
    # roll by -steps within each half-row
    half = cc.params.N // 2
    want = np.concatenate([np.roll(v[:half], -1), np.roll(v[half:], -1)])
    np.testing.assert_array_equal(out, want)
