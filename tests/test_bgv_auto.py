"""BGV automatic level management (pke/bgv_auto.py): lazy ModReduce +
level alignment, mirroring the reference's BGV FLEXIBLEAUTO behavior —
arbitrary mixed-level expressions evaluate with no manual ModReduce."""

import numpy as np
import pytest

from tfhe_tpu.pke.bgv import BGVContext, BGVParams
from tfhe_tpu.pke.bgv_auto import BGVAutoContext
from tfhe_tpu.pke.bgv_rns import BGVRnsContext

N, T = 64, 257


@pytest.fixture(scope="module")
def actx():
    cc = BGVContext(BGVParams.create(N=N, t=T, mult_depth=4, limb_bits=30),
                    seed=19)
    rns = BGVRnsContext(cc, dnum=2, ks_limb_bits=30)
    a = BGVAutoContext(rns)
    sk, pk = a.key_gen()
    rlk = a.relin_key_gen(sk)
    return a, sk, pk, rlk


def _vs(k, rng=None):
    rng = rng or np.random.default_rng(3)
    return [rng.integers(0, T, N) for _ in range(k)]


def test_mult_chain_no_manual_modreduce(actx):
    a, sk, pk, rlk = actx
    vs = _vs(4)
    cts = [a.encrypt(pk, v) for v in vs]
    acc, want = cts[0], vs[0]
    for v, ct in zip(vs[1:], cts[1:]):
        acc = a.eval_mult(acc, ct, rlk)
        want = (want * v) % T
    np.testing.assert_array_equal(a.decrypt(sk, acc), want)


def test_mixed_level_add_and_mult(actx):
    a, sk, pk, rlk = actx
    x, y, z = _vs(3)
    cx, cy, cz = (a.encrypt(pk, v) for v in (x, y, z))
    xy = a.eval_mult(cx, cy, rlk)            # deg 2
    s = a.eval_add(xy, cz)                   # fresh + deg-2 product
    np.testing.assert_array_equal(a.decrypt(sk, s), (x * y + z) % T)
    # (x*y + z) * (x*y) — operands at different (len, deg) states
    m = a.eval_mult(s, xy, rlk)
    np.testing.assert_array_equal(a.decrypt(sk, m),
                                  ((x * y + z) * x * y) % T)


def test_mixed_level_gap2(actx):
    a, sk, pk, rlk = actx
    x, y = _vs(2)
    cx, cy = a.encrypt(pk, x), a.encrypt(pk, y)
    x2 = a.eval_mult(cx, cx, rlk)
    x4 = a.eval_mult(x2, x2, rlk)            # two levels below fresh
    s = a.eval_sub(x4, cy)
    want = (x.astype(object) ** 4 - y) % T
    np.testing.assert_array_equal(a.decrypt(sk, s),
                                  np.asarray(want, dtype=np.int64))


def test_plain_mult_and_rotate(actx):
    a, sk, pk, rlk = actx
    x, w = _vs(2)
    gk = a.galois_key_gen(sk, 1)
    cx = a.encrypt(pk, x)
    prod = a.eval_mult(cx, cx, rlk)          # deg 2
    pw = a.eval_mult_plain(prod, w)          # plaintext mult on deg-2
    rot = a.eval_rotate(pw, 1, gk)
    v = (x * x % T * w) % T
    half = N // 2          # BGV packing rotates the two half-orbits of <5>
    want = np.concatenate([np.roll(v[:half], -1), np.roll(v[half:], -1)])
    np.testing.assert_array_equal(a.decrypt(sk, rot), want)
