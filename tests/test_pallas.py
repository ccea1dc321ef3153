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
