"""Limb-partitioned NTT over a ('limb',) mesh (SURVEY section 5.7): the
cross-shard DIF stages exchange shards with ppermute exactly where the
reference's multi-block GPU kernel pays grid.sync (bootstrapping.cu:120-401).
Bit-identical to the host reference NTT."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from tfhe_tpu.ops.ntt_sched import apply_forward_np
from tfhe_tpu.parallel.limb_ntt import build_limb_ntt
from tfhe_tpu.utils.numtheory import ntt_prime


@pytest.mark.parametrize("N", [1 << 10, 1 << 13])
def test_limb_ntt_matches_reference(N):
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devs[:8]), ("limb",))
    Q = ntt_prime(27, 2 * N)
    rng = np.random.default_rng(4)
    x = rng.integers(0, Q, N).astype(np.uint32)
    got = np.asarray(build_limb_ntt(N, Q, mesh)(x)).astype(np.uint64)
    want = apply_forward_np(x.astype(np.uint64), N, Q)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("N", [1 << 10])
def test_limb_intt_roundtrip(N):
    """Sharded inverse is the exact inverse of the sharded forward, and both
    match the host schedule (apply_forward_np / apply_inverse_np)."""
    from tfhe_tpu.ops.ntt_sched import apply_inverse_np
    from tfhe_tpu.parallel.limb_ntt import build_limb_intt

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devs[:8]), ("limb",))
    Q = ntt_prime(27, 2 * N)
    rng = np.random.default_rng(5)
    x = rng.integers(0, Q, N).astype(np.uint32)
    fwd = np.asarray(build_limb_ntt(N, Q, mesh)(x))
    back = np.asarray(build_limb_intt(N, Q, mesh)(fwd)).astype(np.uint64)
    np.testing.assert_array_equal(back, x.astype(np.uint64))
    np.testing.assert_array_equal(
        back, apply_inverse_np(fwd.astype(np.uint64), N, Q))


@pytest.mark.parametrize("ks_limb_bits", [28, 30])
def test_ckks_mult_limb_sharded_bit_exact(ks_limb_bits):
    """The pke wiring: CKKSRnsContext.eval_mult_limb (ring dimension sharded
    over the 8-device mesh) produces towers BIT-IDENTICAL to the host
    eval_mult and decrypts correctly. ks_limb_bits=28 exercises the fully
    sharded one-jit path (tensor + hybrid key switch + rescale, no host
    seam, build_limb_mult); ks_limb_bits=30 exercises the fallback with the
    key switch composing on gathered towers."""
    from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
    from tfhe_tpu.pke.ckks_rns import CKKSRnsContext
    from tfhe_tpu.pke.dcrt import DCRTParams

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devs[:8]), ("limb",))
    N = 64
    p = CKKSParams(N=N, dcrt=DCRTParams.create(N, 3, 28),
                   scale=float(1 << 28))
    ctx = CKKSContext(p, seed=33)
    sk, pk = ctx.key_gen()
    rctx = CKKSRnsContext(ctx, dnum=2, ks_limb_bits=ks_limb_bits)
    keys = rctx.relin_key_gen(sk)
    rng = np.random.default_rng(6)
    z1 = rng.normal(size=ctx.params.slots) * 0.5
    z2 = rng.normal(size=ctx.params.slots) * 0.5
    ct1, ct2 = ctx.encrypt(pk, z1), ctx.encrypt(pk, z2)
    host = rctx.eval_mult(ct1, ct2, keys)
    mesh_ct = rctx.eval_mult_limb(ct1, ct2, keys, mesh)
    for ph, pm in zip(host.polys, mesh_ct.polys):
        np.testing.assert_array_equal(ph.rns, pm.rns)
    assert np.abs(ctx.decrypt(sk, mesh_ct) - z1 * z2).max() < 1e-3
