"""FFT-factored (levelBudget) CoeffsToSlots/SlotsToCoeffs + sparse packing
(pke/ckks_boot_fft.py) — the reference's EvalBootstrapSetup(levelBudget)
/ EvalCoeffsToSlots / sparse EvalBootstrap configurations
(ckksrns-fhe.cpp, ckksrns-utils.cpp GetCollapsedFFTParams)."""

import numpy as np
import pytest

import tfhe_tpu.pke.ckks_boot as cb
import tfhe_tpu.pke.ckks_boot_fft as cf
from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams, decode, encode
from tfhe_tpu.pke.dcrt import DCRTParams


def test_pair_matrix_is_the_decode_map():
    """z = E v with v_j = m_j + i m_{j+s}: matches the encoder exactly."""
    N, s = 32, 16
    p = CKKSParams(N=N, dcrt=DCRTParams.create(N, 2, 40),
                   scale=float(1 << 40))
    rng = np.random.default_rng(0)
    z = rng.normal(size=s) + 1j * rng.normal(size=s)
    m = encode(p, z, 1 << 20).astype(np.float64) / (1 << 20)
    v = m[:s] + 1j * m[s:]
    E = cf.pair_matrix(s)
    assert np.abs(E @ v - z).max() < 1e-5


@pytest.mark.parametrize("s", [4, 16, 64])
@pytest.mark.parametrize("budget", [1, 2, 3])
def test_stage_factorization(s, budget):
    """Grouped forward stages o bitrev == E; grouped inverses == bitrev o
    E^{-1} (float-exact)."""
    E = cf.pair_matrix(s)
    P = np.eye(s)[cf._bit_reverse(s)].astype(complex)
    G = P.copy()
    for g in cf.group_stages(cf.fft_stage_diags(s), s, budget):
        G = cf.diag_to_dense(g.diags, s) @ G
    assert np.abs(G - E).max() < 1e-9
    Gi = np.eye(s, dtype=complex)
    for g in cf.group_stages(list(reversed(cf.fft_stage_diags_inv(s))),
                             s, budget):
        Gi = cf.diag_to_dense(g.diags, s) @ Gi
    assert np.abs(Gi - P @ np.linalg.inv(E)).max() < 1e-9


def test_grouped_diag_count_tracks_budget():
    """levelBudget dials rotations vs depth: more groups -> fewer diagonals
    (rotations) per level."""
    s = 64
    one = cf.group_stages(cf.fft_stage_diags(s), s, 1)
    three = cf.group_stages(cf.fft_stage_diags(s), s, 3)
    assert len(one) == 1 and len(one[0].diags) == s
    assert len(three) == 3 and max(len(g.diags) for g in three) <= 7


@pytest.fixture(scope="module")
def fft_ctx():
    p = CKKSParams(N=32, dcrt=DCRTParams.create(32, 30, 40),
                   scale=float(1 << 40))
    ctx = CKKSContext(p, seed=13)
    sk, pk = ctx.key_gen()
    from tfhe_tpu.pke.keyswitch import relin_key_gen_hybrid
    rlk = relin_key_gen_hybrid(ctx.rng, p.dcrt, sk[1], dnum=3)
    return ctx, sk, pk, rlk


def test_homomorphic_diag_transform(fft_ctx):
    """One grouped factor evaluated homomorphically == its dense matrix."""
    ctx, sk, pk, rlk = fft_ctx
    s = ctx.params.slots
    pre = cf.eval_bootstrap_setup_fft(ctx, level_budget=(2, 2))
    keys = cf.eval_bootstrap_keygen_fft(ctx, sk, pre, dnum=3)
    rng = np.random.default_rng(3)
    z = rng.normal(size=s) * 0.3 + 1j * rng.normal(size=s) * 0.3
    ct = ctx.encrypt(pk, z)
    g = pre.stc_groups[0]
    got = ctx.decrypt(sk, cf.eval_diag_transform(ctx, ct, g, keys))
    want = cf.diag_to_dense(g.diags, s) @ z
    assert np.abs(got - want).max() < 1e-4


@pytest.mark.parametrize("budget", [(1, 1), (2, 2), (4, 4)])
def test_bootstrap_fft_full_packing(fft_ctx, budget):
    """FFT-factored bootstrap refreshes with the same precision class as the
    dense/BSGS path at every level budget."""
    ctx, sk, pk, rlk = fft_ctx
    p = ctx.params
    pre = cf.eval_bootstrap_setup_fft(ctx, level_budget=budget)
    keys = cf.eval_bootstrap_keygen_fft(ctx, sk, pre, dnum=3)
    z = np.linspace(-0.04, 0.04, p.slots)
    ct = ctx.encrypt(pk, z)
    while ct.level_params.L > 1:
        ct = ctx.rescale(cb.mult_const(ctx, ct, 1.0, rescale=False))
    fresh = cf.eval_bootstrap_fft(ctx, ct, pre, keys, rlk)
    assert fresh.level_params.L >= 3
    assert fresh.scale == p.scale
    err = np.abs(ctx.decrypt(sk, fresh).real - z).max()
    assert err < 2e-3, f"budget {budget}: {err}"


def test_bootstrap_fft_sparse_packing(fft_ctx):
    """Sparsely packed case (s' = 4 < N/2 = 16): PartialSum fold + size-s'
    transforms; a replicated message is refreshed and stays replicated."""
    ctx, sk, pk, rlk = fft_ctx
    p = ctx.params
    sp = 4
    pre = cf.eval_bootstrap_setup_fft(ctx, level_budget=(2, 2),
                                      sparse_slots=sp)
    keys = cf.eval_bootstrap_keygen_fft(ctx, sk, pre, dnum=3)
    rng = np.random.default_rng(9)
    zs = rng.uniform(-0.01, 0.01, sp)
    z = np.tile(zs, p.slots // sp)
    ct = ctx.encrypt(pk, z)
    while ct.level_params.L > 1:
        ct = ctx.rescale(cb.mult_const(ctx, ct, 1.0, rescale=False))
    fresh = cf.eval_bootstrap_fft(ctx, ct, pre, keys, rlk)
    assert fresh.level_params.L >= 3
    got = ctx.decrypt(sk, fresh).real
    err = np.abs(got - z).max()
    assert err < 2e-3, f"sparse refresh: {err}"
    # sparse needs fewer keys than the full-packing transform set
    pre_full = cf.eval_bootstrap_setup_fft(ctx, level_budget=(2, 2))
    assert len(cf.fft_key_indices(ctx, pre)) <= \
        len(cf.fft_key_indices(ctx, pre_full)) + 2


def test_fft_key_indices_cover_the_run(fft_ctx):
    """The advertised index set is exactly what the pipeline uses (a run
    with only those keys succeeds — FindBootstrapRotationIndices parity)."""
    ctx, sk, pk, rlk = fft_ctx
    pre = cf.eval_bootstrap_setup_fft(ctx, level_budget=(3, 3))
    keys = cf.eval_bootstrap_keygen_fft(ctx, sk, pre, dnum=3)
    z = np.linspace(-0.03, 0.03, ctx.params.slots)
    ct = ctx.encrypt(pk, z)
    while ct.level_params.L > 1:
        ct = ctx.rescale(cb.mult_const(ctx, ct, 1.0, rescale=False))
    fresh = cf.eval_bootstrap_fft(ctx, ct, pre, keys, rlk)
    assert np.abs(ctx.decrypt(sk, fresh).real - z).max() < 2e-3


@pytest.mark.parametrize("budget", [(1, 1), (2, 2), (3, 3)])
def test_bootstrap_depth_matches_run(fft_ctx, budget):
    """bootstrap_depth (GetBootstrapDepth) == levels actually consumed."""
    ctx, sk, pk, rlk = fft_ctx
    p = ctx.params
    pre = cf.eval_bootstrap_setup_fft(ctx, level_budget=budget)
    keys = cf.eval_bootstrap_keygen_fft(ctx, sk, pre, dnum=3)
    z = np.linspace(-0.03, 0.03, p.slots)
    ct = ctx.encrypt(pk, z)
    while ct.level_params.L > 1:
        ct = ctx.rescale(cb.mult_const(ctx, ct, 1.0, rescale=False))
    fresh = cf.eval_bootstrap_fft(ctx, ct, pre, keys, rlk)
    consumed = p.dcrt.L - fresh.level_params.L
    assert consumed == cf.bootstrap_depth(budget, cheb_deg=22,
                                          double_angles=3)


@pytest.mark.skipif(not __import__("os").environ.get("TFHE_SLOW"),
                    reason="large-ring bootstrap (minutes); set TFHE_SLOW=1")
def test_bootstrap_fft_large_ring():
    """N = 2^13 with levelBudget (3,3): ~2^5 diagonals per level instead of
    the dense transform's 4096 — the configuration class the reference
    ships for production rings. Validated 2026-08-18 (sparse secret, K=28,
    59-bit limbs): ~25 min on the 1-core host, ~2x faster than the BSGS
    path at the same ring."""
    N = 1 << 13
    depth = cf.bootstrap_depth((3, 3), cheb_deg=44, double_angles=3)
    # 59-bit limbs: the reference's bootstrap modulus class (dcrtBits=59 in
    # simple-ckks-bootstrapping.cpp) — SlotsToCoeffs amplifies the EvalMod
    # slot error by ~sqrt(slots), so the per-op noise floor must be far
    # below the precision target at s = 4096
    p = CKKSParams(N=N, dcrt=DCRTParams.create(N, depth + 3, 59),
                   scale=float(1 << 59))
    ctx = CKKSContext(p, seed=17)
    # sparse secret + K_SPARSE-class EvalMod: at N=2^13 a uniform ternary
    # secret drives the ModRaise overflow |I| to ~80 >> K; hw-64 keeps it
    # <~ 10 (ckksrns-fhe.cpp:144-151 and the sparse-secret advanced
    # bootstrapping example)
    sk, pk = ctx.key_gen(secret_dist="sparse")
    from tfhe_tpu.pke.keyswitch import relin_key_gen_hybrid
    rlk = relin_key_gen_hybrid(ctx.rng, p.dcrt, sk[1], dnum=3)
    pre = cf.eval_bootstrap_setup_fft(ctx, level_budget=(3, 3), K=28.0,
                                      cheb_deg=44)
    keys = cf.eval_bootstrap_keygen_fft(ctx, sk, pre, dnum=3)
    z = np.linspace(-0.04, 0.04, p.slots)
    ct = ctx.encrypt(pk, z)
    while ct.level_params.L > 1:
        ct = ctx.rescale(cb.mult_const(ctx, ct, 1.0, rescale=False))
    fresh = cf.eval_bootstrap_fft(ctx, ct, pre, keys, rlk)
    err = np.abs(ctx.decrypt(sk, fresh).real - z).max()
    assert fresh.level_params.L >= 3 and err < 2e-3


def test_sparse_ternary_secret_bootstrap():
    """SPARSE_TERNARY secrets (base-pke.cpp:67-70): hamming-weight-limited
    keygen works end to end, and the small ||s||_1 admits the small-K
    EvalMod configuration the reference reserves for sparse secrets
    (K_SPARSE vs K_UNIFORM, ckksrns-fhe.cpp:144-151)."""
    p = CKKSParams(N=32, dcrt=DCRTParams.create(32, 30, 40),
                   scale=float(1 << 40))
    ctx = CKKSContext(p, seed=29)
    sk, pk = ctx.key_gen(secret_dist="sparse", hamming_weight=8)
    assert int(np.count_nonzero(sk[1])) == 8
    from tfhe_tpu.pke.keyswitch import relin_key_gen_hybrid
    rlk = relin_key_gen_hybrid(ctx.rng, p.dcrt, sk[1], dnum=3)
    pre = cf.eval_bootstrap_setup_fft(ctx, level_budget=(2, 2), K=4.0,
                                      cheb_deg=18)
    keys = cf.eval_bootstrap_keygen_fft(ctx, sk, pre, dnum=3)
    z = np.linspace(-0.04, 0.04, p.slots)
    ct = ctx.encrypt(pk, z)
    while ct.level_params.L > 1:
        ct = ctx.rescale(cb.mult_const(ctx, ct, 1.0, rescale=False))
    fresh = cf.eval_bootstrap_fft(ctx, ct, pre, keys, rlk)
    err = np.abs(ctx.decrypt(sk, fresh).real - z).max()
    assert err < 2e-3, f"sparse-secret refresh: {err}"


def test_gaussian_secret_roundtrip():
    """GAUSSIAN SecretKeyDist: encrypt/decrypt round-trips."""
    p = CKKSParams(N=32, dcrt=DCRTParams.create(32, 3, 40),
                   scale=float(1 << 40))
    ctx = CKKSContext(p, seed=31)
    sk, pk = ctx.key_gen(secret_dist="gaussian")
    z = np.linspace(-0.4, 0.4, p.slots)
    assert np.abs(ctx.decrypt(sk, ctx.encrypt(pk, z)).real - z).max() < 1e-6


def test_bootstrap_depth_clamps_to_stage_count(fft_ctx):
    """With sparse_slots=4 only 2 stages exist; budgets above log2(s') are
    clamped by group_stages, and bootstrap_depth(slots=...) agrees."""
    ctx, sk, pk, rlk = fft_ctx
    sp = 4
    pre = cf.eval_bootstrap_setup_fft(ctx, level_budget=(3, 3),
                                      sparse_slots=sp)
    assert len(pre.cts_groups) == 2 and len(pre.stc_groups) == 2
    keys = cf.eval_bootstrap_keygen_fft(ctx, sk, pre, dnum=3)
    z = np.tile(np.array([0.01, -0.01, 0.005, 0.008]),
                ctx.params.slots // sp)
    ct = ctx.encrypt(pk, z)
    while ct.level_params.L > 1:
        ct = ctx.rescale(cb.mult_const(ctx, ct, 1.0, rescale=False))
    fresh = cf.eval_bootstrap_fft(ctx, ct, pre, keys, rlk)
    consumed = ctx.params.dcrt.L - fresh.level_params.L
    assert consumed == cf.bootstrap_depth((3, 3), cheb_deg=22,
                                          double_angles=3, slots=sp)
    with pytest.raises(ValueError):
        cb.eval_bootstrap_iterative(ctx, ct, None, None, None,
                                    num_iterations=2, precision=12)


def test_context_factory_bootstrapping():
    """gen_crypto_context(..., bootstrapping=True): the chain is widened by
    GetBootstrapDepth so `mult_depth` levels remain usable after a refresh
    (the reference's SetMultiplicativeDepth(levelsUsed +
    GetBootstrapDepth(...)) idiom)."""
    from tfhe_tpu.pke.context import gen_crypto_context
    from tfhe_tpu.pke.keyswitch import relin_key_gen_hybrid
    cc = gen_crypto_context("ckks", N=32, mult_depth=2, scale_bits=40,
                            bootstrapping=True, level_budget=(2, 2),
                            seed=23)
    cfg = cc.bootstrap_config
    want = 2 + 1 + cf.bootstrap_depth(cfg["level_budget"],
                                      cheb_deg=cfg["cheb_deg"],
                                      double_angles=cfg["double_angles"])
    assert cc.params.dcrt.L == want
    sk, pk = cc.key_gen(secret_dist=cfg["secret_dist"], hamming_weight=8)
    rlk = relin_key_gen_hybrid(cc.rng, cc.params.dcrt, sk[1], dnum=3)
    pre = cf.eval_bootstrap_setup_fft(cc, level_budget=cfg["level_budget"],
                                      K=cfg["K"], cheb_deg=cfg["cheb_deg"],
                                      double_angles=cfg["double_angles"])
    keys = cf.eval_bootstrap_keygen_fft(cc, sk, pre, dnum=3)
    z = np.linspace(-0.02, 0.02, cc.params.slots)
    ct = cc.encrypt(pk, z)
    while ct.level_params.L > 1:
        ct = cc.rescale(cb.mult_const(cc, ct, 1.0, rescale=False))
    fresh = cf.eval_bootstrap_fft(cc, ct, pre, keys, rlk)
    assert fresh.level_params.L >= 3, "mult_depth levels must survive"
    assert np.abs(cc.decrypt(sk, fresh).real - z).max() < 5e-3
    with pytest.raises(ValueError):
        gen_crypto_context("bgv", N=32, bootstrapping=True)
