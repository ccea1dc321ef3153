"""Hybrid (GHS) key switching — counterpart of keyswitch-hybrid.cpp.

Deeper chains with dnum-sized keys: CKKS and BFV multiplication chains at
depth 4 with hybrid relinearization, plus hybrid automorphism keys.
"""

import numpy as np
import pytest

from tfhe_tpu.pke import ckks_boot as cb
from tfhe_tpu.pke.bfv import BFVContext, BFVParams
from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
from tfhe_tpu.pke.dcrt import DCRTParams, DCRTPoly
from tfhe_tpu.pke.keyswitch import (galois_key_gen_hybrid, hybrid_key_switch,
                                    negacyclic_square_signed,
                                    relin_key_gen_hybrid)


def test_hybrid_switch_noise_is_small():
    """delta0 + delta1*s == c2*s^2 up to the documented switch noise."""
    p = BFVParams.create(N=32, t=257, mult_depth=2)
    ctx = BFVContext(p, seed=4)
    sk, _ = ctx.key_gen()
    rng = np.random.default_rng(0)
    c2 = DCRTPoly.from_signed(p.dcrt, rng.integers(-2**40, 2**40, 32),
                              eval_form=True)
    hks = relin_key_gen_hybrid(ctx.rng, p.dcrt, sk.s_signed, dnum=2,
                               limb_bits=54)
    d0, d1 = hybrid_key_switch(hks, c2, p.dcrt)
    diff = ((d0 + d1 * sk.s) - c2 * (sk.s * sk.s)).to_centered_bigint()
    assert max(abs(x) for x in diff) < 64


def test_ckks_depth4_chain_hybrid_relin():
    N, L = 32, 6
    p = CKKSParams(N=N, dcrt=DCRTParams.create(N, L, 40), scale=float(1 << 40))
    ctx = CKKSContext(p, seed=9)
    sk, pk = ctx.key_gen()
    hks = relin_key_gen_hybrid(ctx.rng, p.dcrt, sk[1], dnum=2)
    rng = np.random.default_rng(2)
    z = rng.normal(size=p.slots) * 0.9
    ct = ctx.encrypt(pk, z)
    want = z.copy()
    for _ in range(4):
        ct = ctx.eval_mult(ct, ct, rlk=hks)
        want = want * want
    assert np.abs(ctx.decrypt(sk, ct) - want).max() < 1e-3


def test_bfv_depth4_chain_hybrid_relin():
    p = BFVParams.create(N=32, t=257, mult_depth=4)
    ctx = BFVContext(p, seed=4)
    sk, pk = ctx.key_gen()
    hks = relin_key_gen_hybrid(ctx.rng, p.dcrt, sk.s_signed, dnum=2,
                               limb_bits=54)
    m = np.arange(1, 33) % 5 + 1
    ct = ctx.encrypt_packed(pk, m)
    want = m.copy()
    for _ in range(4):
        ct = ctx.eval_mult(ct, ct, rlk=hks)
        want = want * want % 257
    np.testing.assert_array_equal(ctx.decrypt_packed(sk, ct), want)


def test_ckks_hybrid_galois_key():
    """eval_automorphism accepts a hybrid Galois key."""
    N = 32
    p = CKKSParams(N=N, dcrt=DCRTParams.create(N, 3, 40), scale=float(1 << 40))
    ctx = CKKSContext(p, seed=13)
    sk, pk = ctx.key_gen()
    rng = np.random.default_rng(5)
    z = rng.normal(size=p.slots) + 1j * rng.normal(size=p.slots)
    ct = ctx.encrypt(pk, z)
    a = cb.galois_element(1, N)
    gk = galois_key_gen_hybrid(ctx.rng, p.dcrt, sk[1], a, dnum=2)
    got = ctx.decrypt(sk, cb.eval_automorphism(ctx, ct, a, gk))
    u, plain = cb._auto_slot_action(N, a)
    want = np.where(plain, z[u], np.conj(z[u]))
    assert np.abs(got - want).max() < 1e-3
