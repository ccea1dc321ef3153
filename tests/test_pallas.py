"""Pallas fused blind-rotation kernel: schedules, kernel, and e2e gate tests.

Runs in Pallas interpret mode on the CPU test mesh (the kernel compiles for
real on TPU; bench.py decrypt-verifies the compiled path on hardware)."""

import numpy as np
import pytest

from tfhe_tpu.ops import ntt_sched as ns
from tfhe_tpu.ops import modmath32 as mm
from tfhe_tpu.ref import ntt as ref_ntt
from tfhe_tpu.utils.numtheory import ntt_prime


@pytest.mark.parametrize("N", [16, 256])
def test_schedule_matches_reference_ntt(N):
    Q = ntt_prime(27, 2 * N)
    rng = np.random.default_rng(1)
    x = rng.integers(0, Q, (5, N)).astype(np.uint64)
    sch = ns.schedule(N, Q)
    f = ns.apply_forward_np(x, N, Q)
    assert np.array_equal(f[..., sch["bitrev"]], ref_ntt.forward(x, Q))
    assert np.array_equal(ns.apply_inverse_np(f, N, Q), x)


@pytest.mark.parametrize("throw", [0, 1])
def test_pallas_rotate_matches_jnp(throw):
    from tfhe_tpu.ops.blindrotate32 import build_blind_rotate
    from tfhe_tpu.ops import pallas_rotate as pr

    N, n, B = 128, 6, 16
    Q = ntt_prime(27, 2 * N)
    base_g, digits = 1 << 9, 3
    digits_eff = digits - throw
    d2 = 2 * digits_eff
    rng = np.random.default_rng(3)
    acc = rng.integers(0, Q, (B, 2, N)).astype(np.uint32)
    a_idx = rng.integers(0, 2 * N, (B, n)).astype(np.int32)
    bsk_hat = ref_ntt.forward(
        rng.integers(0, Q, (n, 2, d2, 2, N)).astype(np.uint64), Q)

    fn = build_blind_rotate(N, Q, base_g, digits_eff, throw, n)
    want = np.asarray(fn(acc, a_idx, bsk_hat.astype(np.uint32),
                         mm.shoup(bsk_hat, Q)))

    # BT=8, bt=4 exercises both the grid and the in-kernel subtile loop
    pfn = pr.build_pallas_rotate(N, Q, base_g, digits_eff, throw, n, BT=8, bt=4)
    got = np.asarray(pfn(acc, a_idx, pr.pack_bsk(bsk_hat, Q)))
    assert np.array_equal(want, got)


@pytest.mark.parametrize("throw", [0, 1])
def test_pallas_rotate64_matches_jnp(throw):
    from tfhe_tpu.ops.blindrotate64 import build_blind_rotate64
    from tfhe_tpu.ops import pallas_rotate64 as pr64
    from tfhe_tpu.ops import modmath64 as mm64

    N, n, B = 128, 5, 8
    Q = ntt_prime(54, 2 * N)
    base_g, digits = 1 << 20, 3
    digits_eff = digits - throw
    d2 = 2 * digits_eff
    rng = np.random.default_rng(5)
    acc = rng.integers(0, Q, (B, 2, N)).astype(np.uint64)
    a_idx = rng.integers(0, 2 * N, (B, n)).astype(np.int32)
    bsk_hat = ref_ntt.forward(
        rng.integers(0, Q, (n, 2, d2, 2, N)).astype(np.uint64), Q)

    alo, ahi = mm64.pack_host(acc)
    blo, bhi = mm64.pack_host(bsk_hat)
    slo, shi = mm64.shoup64(bsk_hat, Q)
    fn = build_blind_rotate64(N, Q, base_g, digits_eff, throw, n)
    want = fn(alo, ahi, a_idx, blo, bhi, slo, shi)
    want = mm64.unpack_host(np.asarray(want[0]), np.asarray(want[1]))

    pfn = pr64.build_pallas_rotate64(N, Q, base_g, digits_eff, throw, n,
                                     BT=8, bt=4)
    got = pfn(alo, ahi, a_idx, pr64.pack_bsk64(bsk_hat, Q))
    got = mm64.unpack_host(np.asarray(got[0]), np.asarray(got[1]))
    assert np.array_equal(want, got)


@pytest.mark.parametrize("throw", [0, 1])
def test_pallas_rotate_rns_matches_two_limb(throw):
    """RNS (two-prime) kernel vs the two-limb XLA path at the same composite
    Q = q1*q2: bit-exact after CRT recombination."""
    from tfhe_tpu.ops.blindrotate64 import build_blind_rotate64
    from tfhe_tpu.ops import pallas_rotate_rns as prr
    from tfhe_tpu.ops import modmath64 as mm64
    from tfhe_tpu.utils.numtheory import previous_prime

    N, n, B = 128, 5, 8
    q1 = ntt_prime(27, 2 * N)
    q2 = previous_prime(q1, 2 * N)
    Q = q1 * q2
    base_g, digits = 1 << 20, 3
    digits_eff = digits - throw
    d2 = 2 * digits_eff
    rng = np.random.default_rng(7)
    acc = rng.integers(0, Q, (B, 2, N)).astype(np.uint64)
    a_idx = rng.integers(0, 2 * N, (B, n)).astype(np.int32)
    bsk_coeff = rng.integers(0, Q, (n, 2, d2, 2, N)).astype(np.uint64)
    bsk_hat = ref_ntt.forward(bsk_coeff, Q)

    alo, ahi = mm64.pack_host(acc)
    blo, bhi = mm64.pack_host(bsk_hat)
    slo, shi = mm64.shoup64(bsk_hat, Q)
    fn = build_blind_rotate64(N, Q, base_g, digits_eff, throw, n)
    want = fn(alo, ahi, a_idx, blo, bhi, slo, shi)
    want = mm64.unpack_host(np.asarray(want[0]), np.asarray(want[1]))

    rfn = prr.build_pallas_rotate_rns(N, q1, q2, base_g, digits_eff, throw, n,
                                      BT=8, bt=4)
    o1, o2 = rfn((acc % np.uint64(q1)).astype(np.uint32),
                 (acc % np.uint64(q2)).astype(np.uint32),
                 a_idx, prr.pack_bsk_rns(bsk_coeff, q1, q2))
    r1 = np.asarray(o1).astype(np.uint64)
    r2 = np.asarray(o2).astype(np.uint64)
    t = (r1 + np.uint64(q1) - r2 % np.uint64(q1)) % np.uint64(q1)
    t = t * np.uint64(pow(q2, -1, q1)) % np.uint64(q1)
    got = r2 + np.uint64(q2) * t
    assert np.array_equal(want, got)


def test_gate_e2e_pallas_backend(monkeypatch):
    """Full NAND truth table through the Pallas pipeline vs the host oracle."""
    monkeypatch.setenv("TFHE_TPU_PALLAS", "1")
    from tfhe_tpu import BinFHEContext, Gate
    from tfhe_tpu.ops.backend import JaxBackend

    cc = BinFHEContext(seed=11)
    Q = ntt_prime(20, 512)
    cc.generate_binfhe_context_custom(n=16, N=256, q=512, Q=Q, std=3.19,
                                      base_ks=32, base_g=1 << 5, base_r=23)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)

    m1 = np.array([0, 0, 1, 1, 0, 1, 0, 1])
    m2 = np.array([0, 1, 0, 1, 1, 0, 0, 1])
    ct1 = cc.encrypt(sk, m1)
    ct2 = cc.encrypt(sk, m2)

    ref_out = cc.eval_bin_gate(Gate.NAND, ct1, ct2)

    backend = JaxBackend()
    assert backend._use_pallas(cc.params)
    cc.use_backend(backend)
    backend.setup(cc.params, cc.bt_key)
    dev_out = cc.eval_bin_gate(Gate.NAND, ct1, ct2)

    assert np.array_equal(np.asarray(cc.decrypt(sk, dev_out)), 1 - (m1 & m2))
    assert np.array_equal(np.asarray(ref_out.a), np.asarray(dev_out.a))
    assert np.array_equal(np.asarray(ref_out.b), np.asarray(dev_out.b))


def test_gate_e2e_pallas_sharded(monkeypatch):
    """Pallas pipeline under shard_map over a 4-device ('batch',) mesh."""
    monkeypatch.setenv("TFHE_TPU_PALLAS", "1")
    from tfhe_tpu import BinFHEContext, Gate
    from tfhe_tpu.ops.backend import JaxBackend
    from tfhe_tpu.parallel.mesh import make_mesh

    cc = BinFHEContext(seed=12)
    Q = ntt_prime(20, 512)
    cc.generate_binfhe_context_custom(n=16, N=256, q=512, Q=Q, std=3.19,
                                      base_ks=32, base_g=1 << 5, base_r=23)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)

    rng = np.random.default_rng(0)
    m1 = rng.integers(0, 2, 8)
    m2 = rng.integers(0, 2, 8)
    ct1 = cc.encrypt(sk, m1)
    ct2 = cc.encrypt(sk, m2)
    ref_out = cc.eval_bin_gate(Gate.AND, ct1, ct2)

    backend = JaxBackend(mesh=make_mesh(4))
    assert backend._use_pallas(cc.params)
    cc.use_backend(backend)
    backend.setup(cc.params, cc.bt_key)
    dev_out = cc.eval_bin_gate(Gate.AND, ct1, ct2)

    assert np.array_equal(np.asarray(cc.decrypt(sk, dev_out)), m1 & m2)
    assert np.array_equal(np.asarray(ref_out.a), np.asarray(dev_out.a))
    assert np.array_equal(np.asarray(ref_out.b), np.asarray(dev_out.b))
