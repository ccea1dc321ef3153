"""JAX device backend vs host oracle: bit-exact agreement.

The gate pipeline is deterministic given fixed keys and input ciphertexts, so
backend equivalence is checked on full output ciphertexts (every `a`
component and `b`), mirroring how the reference validates GPU-vs-CPU
(examples/unittest.cpp, error-analysis.cpp) — except our comparison demands
exact equality, not small-noise agreement."""

import numpy as np
import pytest

from tfhe_tpu import BinFHEContext, Gate, ParamSet
from tfhe_tpu import params as params_mod
from tfhe_tpu import scheme
from tfhe_tpu.ops.backend import JaxBackend
from tfhe_tpu.ref.backend import RefBackend


@pytest.fixture(scope="module")
def ctx():
    cc = BinFHEContext(seed=31337)
    cc.generate_binfhe_context(ParamSet.TOY)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    return cc, sk


def test_gate_bit_exact_vs_oracle(ctx):
    cc, sk = ctx
    m1 = np.array([0, 1, 1, 0, 1])
    m2 = np.array([1, 1, 0, 0, 1])
    ct1 = cc.encrypt(sk, m1)
    ct2 = cc.encrypt(sk, m2)

    ref = scheme.eval_bin_gate(RefBackend(), cc.params, Gate.NAND, cc.bt_key, ct1, ct2)
    dev = scheme.eval_bin_gate(JaxBackend(), cc.params, Gate.NAND, cc.bt_key, ct1, ct2)

    np.testing.assert_array_equal(ref.a, dev.a)
    np.testing.assert_array_equal(np.asarray(ref.b), np.asarray(dev.b))
    np.testing.assert_array_equal(np.asarray(cc.decrypt(sk, dev), dtype=np.int64),
                                  1 - (m1 & m2))


def test_eval_acc_bit_exact(ctx):
    """Blind rotation alone, on a random accumulator state."""
    cc, sk = ctx
    p = cc.params
    rng = np.random.default_rng(7)
    B = 3
    acc = rng.integers(0, p.lwe.Q, (B, 2, p.lwe.N)).astype(np.uint64)
    a = rng.integers(0, p.lwe.q, (B, p.lwe.n)).astype(np.uint64)

    ref = RefBackend().eval_acc(p, cc.bt_key, acc.copy(), a, p.lwe.q)
    dev = JaxBackend().eval_acc(p, cc.bt_key, acc.copy(), a, p.lwe.q)
    np.testing.assert_array_equal(ref, dev)


def test_context_device_setup_roundtrip(ctx):
    cc, sk = ctx
    cc.device_setup()
    try:
        out = cc.eval_bin_gate(Gate.AND, cc.encrypt(sk, 1), cc.encrypt(sk, 1))
        assert int(cc.decrypt(sk, out)) == 1
        boot = cc.bootstrap(cc.encrypt(sk, 0))
        assert int(cc.decrypt(sk, boot)) == 0
    finally:
        cc.device_clean()


def test_unsupported_params_raise():
    """A 60-bit prime with qKS = Q (non-power-of-two > 2^32) fits no device
    path and must fall back with a clear error. (DM/AP at small moduli IS
    supported on device now — beyond the reference's GPU.)"""
    from tfhe_tpu.utils.numtheory import ntt_prime
    cc = BinFHEContext(seed=1)
    Q = ntt_prime(60, 512)
    cc.generate_binfhe_context_custom(n=16, N=256, q=512, Q=Q, std=3.19,
                                      base_ks=32, base_g=1 << 20, base_r=23)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    with pytest.raises(NotImplementedError):
        cc.device_setup()


@pytest.fixture(scope="module")
def ctx54():
    """Accelerated-style TOY with a 54-bit ring prime and qKS = 2^35."""
    cc = BinFHEContext(seed=999)
    cc.generate_binfhe_context(ParamSet.TOY, arb_func=True, log_q=12,
                               num_digits_to_throw=1)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    return cc, sk


def test_two_limb_func_bit_exact_vs_oracle(ctx54):
    """54-bit path: EvalFunc on device == oracle, bit for bit."""
    cc, sk = ctx54
    p = cc.get_max_plaintext_space()
    lut = cc.generate_lut_via_function(lambda m, p1: (m * m) % p1, p)
    msgs = np.arange(4) % p
    cts = cc.encrypt(sk, msgs, "FRESH", p)

    ref = scheme.eval_func(RefBackend(), cc.params, cc.bt_key, cts, lut, cc.get_beta())
    dev = scheme.eval_func(JaxBackend(), cc.params, cc.bt_key, cts, lut, cc.get_beta())
    np.testing.assert_array_equal(ref.a, dev.a)
    np.testing.assert_array_equal(np.asarray(ref.b), np.asarray(dev.b))
    np.testing.assert_array_equal(np.asarray(cc.decrypt(sk, dev, p), dtype=np.int64),
                                  (msgs * msgs) % p)


def test_two_limb_gate_bit_exact(ctx54):
    """54-bit path: full gate pipeline on device == oracle."""
    cc, sk = ctx54
    m1 = np.array([0, 1, 1, 0])
    m2 = np.array([1, 1, 0, 0])
    ct1 = cc.encrypt(sk, m1)
    ct2 = cc.encrypt(sk, m2)
    ref = scheme.eval_bin_gate(RefBackend(), cc.params, Gate.OR, cc.bt_key, ct1, ct2)
    dev = scheme.eval_bin_gate(JaxBackend(), cc.params, Gate.OR, cc.bt_key, ct1, ct2)
    np.testing.assert_array_equal(ref.a, dev.a)
    np.testing.assert_array_equal(np.asarray(ref.b), np.asarray(dev.b))


@pytest.fixture(scope="module")
def ctx_rns(request):
    """Composite two-prime ring modulus (the TPU-native RNS form of the
    accelerated 54-bit sets, params.from_gpu_style) scaled down to N=256 so
    the Pallas RNS kernel runs in interpret mode: Q = q1*q2 ~ 2^34 with
    27-bit-class lanes replaced by 17-bit lanes, qKS = 2^35."""
    import os
    from tfhe_tpu.params import BinFHEParams, LWEParams, RGSWParams
    from tfhe_tpu.utils.numtheory import ntt_prime, previous_prime

    old = os.environ.get("TFHE_TPU_PALLAS")
    os.environ["TFHE_TPU_PALLAS"] = "1"
    request.addfinalizer(lambda: (os.environ.__setitem__("TFHE_TPU_PALLAS", old)
                                  if old is not None
                                  else os.environ.pop("TFHE_TPU_PALLAS", None)))
    N, q = 256, 512
    q1 = ntt_prime(17, 2 * N)
    q2 = previous_prime(q1, 2 * N)
    Q = q1 * q2
    params = BinFHEParams(
        lwe=LWEParams(n=8, N=N, q=q, Q=Q, q_ks=1 << 35, std=3.19, base_ks=32),
        rgsw=RGSWParams(N=N, Q=Q, q=q, base_g=1 << 7, base_r=23,
                        method=params_mod.Method.GINX, std=3.19, sign_eval=True))
    assert params.rgsw.rns_primes == (q1, q2)
    cc = BinFHEContext(seed=4242)
    cc.params = params
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    return cc, sk


def test_rns_gate_bit_exact_vs_oracle(ctx_rns):
    """RNS two-lane Pallas pipeline (interpret mode) == host oracle at the
    composite ring modulus, bit for bit, through the whole gate bootstrap."""
    cc, sk = ctx_rns
    be = JaxBackend()
    assert be._use_rns(cc.params) and be.supports(cc.params)
    m1 = np.array([0, 1, 1, 0])
    m2 = np.array([1, 1, 0, 0])
    ct1 = cc.encrypt(sk, m1)
    ct2 = cc.encrypt(sk, m2)
    ref = scheme.eval_bin_gate(RefBackend(), cc.params, Gate.NAND, cc.bt_key,
                               ct1, ct2)
    dev = scheme.eval_bin_gate(be, cc.params, Gate.NAND, cc.bt_key, ct1, ct2)
    np.testing.assert_array_equal(ref.a, dev.a)
    np.testing.assert_array_equal(np.asarray(ref.b), np.asarray(dev.b))
    np.testing.assert_array_equal(
        np.asarray(cc.decrypt(sk, dev), dtype=np.int64), 1 - (m1 & m2))


def test_rns_func_fast_path_bit_exact(ctx_rns):
    """EvalFloor through the RNS device fast path (test polynomial built on
    device from the [ctMod] value table) == host oracle, bit for bit."""
    cc, sk = ctx_rns
    be = JaxBackend()
    p = cc.params.max_plaintext_space
    m = np.array([1, p // 3, p // 2, p - 1])
    ct = cc.encrypt(sk, m, "FRESH", p)
    ref = scheme.eval_floor(RefBackend(), cc.params, cc.bt_key, ct,
                            cc.params.beta, 1)
    dev = scheme.eval_floor(be, cc.params, cc.bt_key, ct, cc.params.beta, 1)
    np.testing.assert_array_equal(ref.a, dev.a)
    np.testing.assert_array_equal(np.asarray(ref.b), np.asarray(dev.b))
    # the fast path must actually engage for this configuration
    fv = np.arange(cc.params.lwe.q, dtype=np.uint64) % 7
    ctb, _ = scheme._as_batch(ct)
    assert be.func_bootstrap(cc.params, cc.bt_key, fv, ctb,
                             cc.params.lwe.q) is not None


def test_mixed_fused_gate_fast_path(monkeypatch):
    """The fully-fused u16 gate pipeline on a mixed (qKS=2^35) config —
    the low-latency path the CHES AND loop uses — bit-exact vs oracle."""
    monkeypatch.setenv("TFHE_TPU_PALLAS", "1")
    from tfhe_tpu.params import BinFHEParams, LWEParams, RGSWParams
    from tfhe_tpu.utils.numtheory import ntt_prime

    N, q = 256, 512
    Q = ntt_prime(20, 2 * N)
    cc = BinFHEContext(seed=77)
    cc.params = BinFHEParams(
        lwe=LWEParams(n=8, N=N, q=q, Q=Q, q_ks=1 << 35, std=3.19, base_ks=32),
        rgsw=RGSWParams(N=N, Q=Q, q=q, base_g=1 << 5, base_r=23,
                        method=params_mod.Method.GINX, std=3.19))
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    be = JaxBackend()
    assert be._is_mixed(cc.params)
    m1 = np.array([0, 1, 0, 1])
    m2 = np.array([0, 0, 1, 1])
    ct1, ct2 = cc.encrypt(sk, m1), cc.encrypt(sk, m2)
    ref = scheme.eval_bin_gate(RefBackend(), cc.params, Gate.AND, cc.bt_key,
                               ct1, ct2)
    # the fused path must engage (not fall back to the generic pipeline)
    prep = ct1.copy()
    from tfhe_tpu import lwe as lwe_mod
    lwe_mod.add_eq(prep, ct2)
    assert be.gate_bootstrap(cc.params, cc.bt_key, Gate.AND, prep,
                             cc.params.lwe.q) is not None
    dev = scheme.eval_bin_gate(be, cc.params, Gate.AND, cc.bt_key, ct1, ct2)
    np.testing.assert_array_equal(ref.a, dev.a)
    np.testing.assert_array_equal(np.asarray(ref.b), np.asarray(dev.b))
    np.testing.assert_array_equal(
        np.asarray(cc.decrypt(sk, dev), dtype=np.int64), m1 & m2)


def test_accelerated_logq11_gate_bit_exact():
    """Accelerated TOY at logQ=11: Q ~ 2^27 prime with qKS = 2^35 — the
    two-limb pipeline with a scale-UP mod switch (the reference's gate
    benchmark configuration, binfhecontext.cpp:99-103)."""
    cc = BinFHEContext(seed=17)
    cc.generate_binfhe_context(ParamSet.TOY, arb_func=False, log_q=11)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    m1 = np.array([0, 1, 0, 1])
    m2 = np.array([0, 0, 1, 1])
    ct1, ct2 = cc.encrypt(sk, m1), cc.encrypt(sk, m2)
    ref_out = cc.eval_bin_gate(Gate.NAND, ct1, ct2)
    cc.device_setup()
    dev_out = cc.eval_bin_gate(Gate.NAND, ct1, ct2)
    cc.device_clean()
    assert np.array_equal(np.asarray(cc.decrypt(sk, dev_out)), 1 - (m1 & m2))
    assert np.array_equal(np.asarray(ref_out.a), np.asarray(dev_out.a))
    assert np.array_equal(np.asarray(ref_out.b), np.asarray(dev_out.b))


def test_accelerated_logq11_floor_bit_exact():
    """EvalFloor through the mixed pipeline (u32 rotation + 2^35 key switch)
    == oracle, bit for bit (the time-estimate floor configuration)."""
    cc = BinFHEContext(seed=18)
    cc.generate_binfhe_context(ParamSet.TOY, arb_func=False, log_q=11)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    p = cc.get_max_plaintext_space()
    m = np.array([1, p // 2, p - 1])
    ct = cc.encrypt(sk, m, "FRESH", p)
    ref_out = cc.eval_floor(ct, 1)
    cc.device_setup()
    dev_out = cc.eval_floor(ct, 1)
    cc.device_clean()
    assert np.array_equal(np.asarray(ref_out.a), np.asarray(dev_out.a))
    assert np.array_equal(np.asarray(ref_out.b), np.asarray(dev_out.b))
    assert np.array_equal(np.asarray(cc.decrypt(sk, dev_out, p // 2)), m // 2)


def test_rns_multi_lut_fast_path_bit_exact(ctx_rns):
    """Per-ciphertext LUT EvalFunc through the RNS device fast path (value
    tables gathered in-graph per row, no host-built accumulator uploads) ==
    host oracle bit for bit — the multi-LUT GPU overload,
    binfhe-base-scheme.cpp:791-924."""
    cc, sk = ctx_rns
    be = JaxBackend()
    q = cc.params.lwe.q
    rng = np.random.default_rng(9)
    B = 4
    half = rng.integers(1, q, (B, q // 2)).astype(np.uint64)
    luts = np.concatenate([half, (q - half) % q], axis=1)  # negacyclic rows
    m = rng.integers(0, 2, B)
    ct = cc.encrypt(sk, m)
    ref = scheme.eval_func(RefBackend(), cc.params, cc.bt_key, ct, luts,
                           cc.params.beta, per_ct_luts=True)
    dev = scheme.eval_func(be, cc.params, cc.bt_key, ct, luts,
                           cc.params.beta, per_ct_luts=True)
    np.testing.assert_array_equal(ref.a, dev.a)
    np.testing.assert_array_equal(np.asarray(ref.b), np.asarray(dev.b))
    # the per-ct fast path must actually engage (a [B, ctMod] table)
    ctb, _ = scheme._as_batch(ct)
    fv2 = np.stack([np.arange(q, dtype=np.uint64) % 7] * B)
    assert be.func_bootstrap(cc.params, cc.bt_key, fv2, ctb, q) is not None


def test_rns_sign_device_chain_bit_exact(ctx_rns):
    """EvalSign through the device-resident chain (every inter-bootstrap
    LWE combination, modulus switch, and base retag runs in-graph; the
    ciphertext crosses the host boundary exactly twice) == host oracle,
    bit for bit (binfhe-base-scheme.cpp:312-372)."""
    cc, sk = ctx_rns
    be = JaxBackend()
    q, beta = cc.params.lwe.q, cc.params.beta
    Q_enc = 1 << 11                       # schedule: 2^11 -> 2^10 -> 2^9 = q
    P = cc.params.max_plaintext_space * (Q_enc // q)
    delta = np.array([-2, -1, 0, 1])
    m = (P // 2 + delta) % P
    ct = cc.encrypt(sk, m, "FRESH", P, Q_enc)
    keys = {cc.params.rgsw.base_g: cc.bt_key}
    assert scheme._chain_mods_ok(be, cc.params, keys,
                                 scheme._mod_schedule(Q_enc, q, beta), q)
    ref = scheme.eval_sign(RefBackend(), cc.params, keys, ct, beta)
    dev = scheme.eval_sign(be, cc.params, keys, ct, beta)
    np.testing.assert_array_equal(ref.a, dev.a)
    np.testing.assert_array_equal(np.asarray(ref.b), np.asarray(dev.b))
    np.testing.assert_array_equal(
        np.asarray(cc.decrypt(sk, dev, 2), dtype=np.int64),
        (delta >= 0).astype(np.int64))


def test_rns_decomp_device_chain_bit_exact(ctx_rns):
    """EvalDecomp through the device-resident chain == host oracle bit for
    bit, including the unreduced raw-retag digit convention
    (binfhe-base-scheme.cpp:375-433)."""
    cc, sk = ctx_rns
    be = JaxBackend()
    q, beta = cc.params.lwe.q, cc.params.beta
    Q_enc = 1 << 11
    p = cc.params.max_plaintext_space
    P = p * (Q_enc // q)
    m = np.array([1, P // 3, P // 2, P - 1])
    ct = cc.encrypt(sk, m, "FRESH", P, Q_enc)
    keys = {cc.params.rgsw.base_g: cc.bt_key}
    ref = scheme.eval_decomp(RefBackend(), cc.params, keys, ct, beta)
    dev = scheme.eval_decomp(be, cc.params, keys, ct, beta)
    assert len(ref) == len(dev) and len(ref) >= 2
    for r, d in zip(ref, dev):
        assert r.modulus == d.modulus
        np.testing.assert_array_equal(r.a, d.a)
        np.testing.assert_array_equal(np.asarray(r.b), np.asarray(d.b))


@pytest.fixture(scope="module")
def ctx_rns_seeded(request):
    """ctx_rns configuration with the device-generated (threefry) switching
    key — the TPU-native keygen fast path for power-of-two qKS."""
    import os
    from tfhe_tpu.params import BinFHEParams, LWEParams, RGSWParams
    from tfhe_tpu.utils.numtheory import ntt_prime, previous_prime

    old = os.environ.get("TFHE_TPU_PALLAS")
    os.environ["TFHE_TPU_PALLAS"] = "1"
    request.addfinalizer(lambda: (os.environ.__setitem__("TFHE_TPU_PALLAS", old)
                                  if old is not None
                                  else os.environ.pop("TFHE_TPU_PALLAS", None)))
    N, q = 256, 512
    q1 = ntt_prime(17, 2 * N)
    q2 = previous_prime(q1, 2 * N)
    Q = q1 * q2
    params = BinFHEParams(
        lwe=LWEParams(n=8, N=N, q=q, Q=Q, q_ks=1 << 35, std=3.19, base_ks=32),
        rgsw=RGSWParams(N=N, Q=Q, q=q, base_g=1 << 7, base_r=23,
                        method=params_mod.Method.GINX, std=3.19))
    cc = BinFHEContext(seed=4243, seeded_ksk=True)
    cc.params = params
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    assert isinstance(cc.bt_key.ksk, lwe_pkg.SeededSwitchingKey)
    return cc, sk


from tfhe_tpu import lwe as lwe_pkg  # noqa: E402


def test_seeded_ksk_pack_bit_identical(ctx_rns_seeded):
    """In-graph threefry pack == host pack of the materialized A block."""
    from tfhe_tpu.ops.keyswitch64 import pack_ksk64, seeded_ksk_pack

    cc, _ = ctx_rns_seeded
    ksk = cc.bt_key.ksk
    host = pack_ksk64(np.asarray(ksk.A).reshape(-1, cc.params.lwe.n),
                      np.asarray(ksk.B, dtype=np.uint64).reshape(-1),
                      ksk.q_ks)
    dev = np.asarray(seeded_ksk_pack(ksk))
    np.testing.assert_array_equal(host, dev)


def test_seeded_ksk_gate_bit_exact(ctx_rns_seeded):
    """Full gate bootstrap with the seeded switching key: device pipeline
    (in-graph key pack) == host oracle (lazy-materialized A), bit for bit —
    proving the two views of the key are the same key."""
    cc, sk = ctx_rns_seeded
    be = JaxBackend()
    m1 = np.array([0, 1, 1, 0])
    m2 = np.array([1, 1, 0, 0])
    ct1 = cc.encrypt(sk, m1)
    ct2 = cc.encrypt(sk, m2)
    ref = scheme.eval_bin_gate(RefBackend(), cc.params, Gate.NAND, cc.bt_key,
                               ct1, ct2)
    dev = scheme.eval_bin_gate(be, cc.params, Gate.NAND, cc.bt_key, ct1, ct2)
    np.testing.assert_array_equal(ref.a, dev.a)
    np.testing.assert_array_equal(np.asarray(ref.b), np.asarray(dev.b))
    np.testing.assert_array_equal(
        np.asarray(cc.decrypt(sk, dev), dtype=np.int64), 1 - (m1 & m2))


def test_seeded_ksk_sign_chain(ctx_rns_seeded):
    """EvalSign device chain on a seeded key == host oracle bit for bit."""
    cc, sk = ctx_rns_seeded
    be = JaxBackend()
    q, beta = cc.params.lwe.q, cc.params.beta
    Q_enc = 1 << 11
    P = cc.params.max_plaintext_space * (Q_enc // q)
    delta = np.array([-2, -1, 0, 1])
    m = (P // 2 + delta) % P
    ct = cc.encrypt(sk, m, "FRESH", P, Q_enc)
    keys = {cc.params.rgsw.base_g: cc.bt_key}
    ref = scheme.eval_sign(RefBackend(), cc.params, keys, ct, beta)
    dev = scheme.eval_sign(be, cc.params, keys, ct, beta)
    np.testing.assert_array_equal(ref.a, dev.a)
    np.testing.assert_array_equal(np.asarray(ref.b), np.asarray(dev.b))
