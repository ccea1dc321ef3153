"""Two-limb uint32 device arithmetic vs Python-int ground truth."""

import numpy as np
import pytest

import jax.numpy as jnp

from tfhe_tpu.ops import modmath64 as mm64
from tfhe_tpu.utils.numtheory import ntt_prime

Q54 = ntt_prime(54, 4096)


def _pairs(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    lo, hi = mm64.pack_host(arr)
    return jnp.asarray(lo), jnp.asarray(hi)


def _ints(pair):
    return [int(x) for x in mm64.unpack_host(np.asarray(pair[0]), np.asarray(pair[1]))]


def test_addsub_negmod64():
    rng = np.random.default_rng(0)
    a = rng.integers(0, Q54, 64).astype(np.uint64)
    b = rng.integers(0, Q54, 64).astype(np.uint64)
    ap, bp = _pairs(a), _pairs(b)
    assert _ints(mm64.addmod64(ap, bp, Q54)) == [(int(x) + int(y)) % Q54 for x, y in zip(a, b)]
    assert _ints(mm64.submod64(ap, bp, Q54)) == [(int(x) - int(y)) % Q54 for x, y in zip(a, b)]
    assert _ints(mm64.negmod64(ap, Q54)) == [(-int(x)) % Q54 for x in a]


def test_mulmod_shoup64():
    rng = np.random.default_rng(1)
    a = rng.integers(0, Q54, 256).astype(np.uint64)
    b = rng.integers(0, Q54, 256).astype(np.uint64)
    b_sh = mm64.shoup64(b, Q54)
    got = _ints(mm64.mulmod_shoup64(_pairs(a), _pairs(b), (jnp.asarray(b_sh[0]), jnp.asarray(b_sh[1])), Q54))
    assert got == [int(x) * int(y) % Q54 for x, y in zip(a, b)]
    # edge cases
    edges = np.array([0, 1, Q54 - 1, Q54 // 2, Q54 // 2 + 1], dtype=np.uint64)
    eb = np.array([Q54 - 1] * 5, dtype=np.uint64)
    sh = mm64.shoup64(eb, Q54)
    got = _ints(mm64.mulmod_shoup64(_pairs(edges), _pairs(eb), (jnp.asarray(sh[0]), jnp.asarray(sh[1])), Q54))
    assert got == [int(x) * (Q54 - 1) % Q54 for x in edges]


def test_round_q_Q64():
    rng = np.random.default_rng(2)
    for q in (1 << 35, 2048, 1 << 12):
        v = np.concatenate([rng.integers(0, Q54, 100).astype(np.uint64),
                            np.array([0, 1, Q54 - 1, Q54 // 2], dtype=np.uint64)])
        got = _ints(mm64.round_q_Q64(_pairs(v), q, Q54))
        want = [((2 * int(x) * q + Q54) // (2 * Q54)) % q for x in v]
        assert got == want, q


def test_ntt64_roundtrip_and_convolution():
    from tfhe_tpu.ops.ntt64 import NTT64
    from tfhe_tpu.ref import modmath as rmod, ntt as rntt

    N = 512
    ntt = NTT64(N, Q54)
    rng = np.random.default_rng(3)
    a = rng.integers(0, Q54, (2, N)).astype(np.uint64)
    ap = _pairs(a)
    back = mm64.unpack_host(*[np.asarray(x) for x in ntt.inverse(ntt.forward(ap))])
    np.testing.assert_array_equal(back, a)

    # matches the host-oracle eval domain exactly
    ref_hat = rntt.forward(a, Q54)
    dev_hat = mm64.unpack_host(*[np.asarray(x) for x in ntt.forward(ap)])
    np.testing.assert_array_equal(dev_hat, ref_hat)


def test_round_q_Q64_scale_up():
    """RoundqQ with q > Q (the accelerated logQ=11 configs: Q ~ 2^27 prime,
    qKS = 2^35 — the mod switch scales UP)."""
    import numpy as np
    from tfhe_tpu.ops import modmath64 as mm64
    from tfhe_tpu.utils.numtheory import ntt_prime
    Q = ntt_prime(27, 2048)
    q = 1 << 35
    rng = np.random.default_rng(0)
    v = rng.integers(0, Q, 257).astype(np.uint64)
    got = mm64.unpack_host(*[np.asarray(x) for x in
                             mm64.round_q_Q64(mm64.pack_host(v), q, Q)])
    want = np.array([((2 * q * int(x) + Q) // (2 * Q)) % q for x in v],
                    dtype=np.uint64)
    np.testing.assert_array_equal(got, want)
