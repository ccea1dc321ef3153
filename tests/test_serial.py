"""Serialization round trips (port of UnitTestFHEWSerial.cpp: context, refresh
key, switching key, and ciphertext survive a save/load, and a gate evaluated
with reloaded keys still decrypts correctly)."""

import numpy as np

from tfhe_tpu import BinFHEContext, Gate, ParamSet
from tfhe_tpu.utils import serial


def test_context_key_ciphertext_roundtrip(tmp_path):
    cc = BinFHEContext(seed=123)
    cc.generate_binfhe_context(ParamSet.TOY)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)

    ctx_path = str(tmp_path / "ctx.npz")
    sk_path = str(tmp_path / "sk.npz")
    ct_path = str(tmp_path / "ct.npz")
    cc.save(ctx_path)
    serial.save_private_key(sk_path, sk)
    ct1 = cc.encrypt(sk, 1)
    serial.save_ciphertext(ct_path, ct1)

    cc2 = BinFHEContext.load(ctx_path, seed=456)
    sk2 = serial.load_private_key(sk_path)
    ct1b = serial.load_ciphertext(ct_path)

    # identical key material
    np.testing.assert_array_equal(cc2.bt_key.bsk_coeff, cc.bt_key.bsk_coeff)
    np.testing.assert_array_equal(cc2.bt_key.ksk.A, cc.bt_key.ksk.A)
    np.testing.assert_array_equal(np.asarray(ct1b.a), np.asarray(ct1.a))
    assert cc2.params.lwe.Q == cc.params.lwe.Q

    # a gate evaluated entirely in the reloaded context decrypts correctly
    ct2 = cc2.encrypt(sk2, 0)
    out = cc2.eval_bin_gate(Gate.NAND, ct1b, ct2)
    assert int(cc2.decrypt(sk2, out)) == 1

    # and matches the original context bit-for-bit on the same inputs
    out_orig = cc.eval_bin_gate(Gate.NAND, ct1b, ct2)
    np.testing.assert_array_equal(out.a, out_orig.a)
    assert int(out.b) == int(out_orig.b)


def test_bytes_roundtrip():
    cc = BinFHEContext(seed=9)
    cc.generate_binfhe_context(ParamSet.TOY)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    blob = serial.dumps_context(cc.params, cc.bt_key)
    params2, keys2 = serial.loads_context(blob)
    assert params2.lwe.Q == cc.params.lwe.Q
    np.testing.assert_array_equal(keys2[cc.params.rgsw.base_g].bsk_coeff,
                                  cc.bt_key.bsk_coeff)


def test_json_context_roundtrip(tmp_path):
    """JSON variant (cereal SerType::JSON analogue): gate result bit-identical
    after reload, mirroring boolean-serial-json.cpp."""
    from tfhe_tpu.utils import serial
    cc = BinFHEContext(seed=31)
    cc.generate_binfhe_context(ParamSet.TOY)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    path = str(tmp_path / "ctx.json")
    serial.save_context_json(path, cc.params, cc.bt_key)
    params2, keys2 = serial.load_context_json(path)
    assert params2.lwe.Q == cc.params.lwe.Q
    cc2 = BinFHEContext(seed=31)
    cc2.params = params2
    cc2.bt_key_load(next(iter(keys2.values())))
    ct1, ct2 = cc.encrypt(sk, 1), cc.encrypt(sk, 0)
    out1 = cc.eval_bin_gate(Gate.NAND, ct1, ct2)
    out2 = cc2.eval_bin_gate(Gate.NAND, ct1, ct2)
    assert np.array_equal(np.asarray(out1.a), np.asarray(out2.a))
    assert int(out1.b) == int(out2.b)


def test_rns_hybrid_key_roundtrip(tmp_path):
    """Per-level RNS hybrid keys (relin + galois) survive save/load and
    still relinearize correctly (the pke EvalKey serialization analogue)."""
    import numpy as np

    from tfhe_tpu.pke.bgv import BGVContext, BGVParams
    from tfhe_tpu.pke.bgv_rns import BGVRnsContext
    from tfhe_tpu.pke.serial import load_hybrid_keys, save_hybrid_keys

    N, T = 32, 193
    cc = BGVContext(BGVParams.create(N=N, t=T, mult_depth=1, limb_bits=28),
                    seed=61)
    sk, pk = cc.key_gen()
    rns = BGVRnsContext(cc, dnum=2, ks_limb_bits=28)
    rlk = rns.relin_key_gen(sk)
    gk = rns.galois_key_gen(sk, steps=1)

    save_hybrid_keys(tmp_path / "rlk.npz", rlk)
    save_hybrid_keys(tmp_path / "gk.npz", gk)
    rlk2 = load_hybrid_keys(tmp_path / "rlk.npz")
    gk2 = load_hybrid_keys(tmp_path / "gk.npz")

    for lvl, k in rlk.items():
        k2 = rlk2[lvl]
        assert k2.t == k.t and k2.groups == [tuple(g) for g in k.groups]
        for b, b2 in zip(k.bs, k2.bs):
            np.testing.assert_array_equal(b.rns, b2.rns)
    assert gk2[2].galois_k == gk[2].galois_k

    rng = np.random.default_rng(0)
    v1, v2 = (rng.integers(0, T, N) for _ in range(2))
    out = rns.eval_mult(cc.encrypt_packed(pk, v1), cc.encrypt_packed(pk, v2),
                        rlk2)
    np.testing.assert_array_equal(cc.decrypt_packed(sk, out), v1 * v2 % T)
    half = N // 2
    v = rng.integers(0, T, N)
    rot = rns.eval_rotate(cc.encrypt_packed(pk, v), 1, gk2)
    want = np.concatenate([np.roll(v[:half], -1), np.roll(v[half:], -1)])
    np.testing.assert_array_equal(cc.decrypt_packed(sk, rot), want)


def test_ckks_ciphertext_roundtrip(tmp_path):
    """CKKS ciphertext serialization: reduced chain + scale + noise degree
    survive a save/load, and the loaded ct decrypts identically."""
    import numpy as np

    from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
    from tfhe_tpu.pke.ckks_auto import CKKSAutoContext
    from tfhe_tpu.pke.ckks_rns import CKKSRnsContext
    from tfhe_tpu.pke.dcrt import DCRTParams, _moduli_chain_pattern
    from tfhe_tpu.pke.serial import (load_ckks_ciphertext,
                                     save_ckks_ciphertext)

    p = CKKSParams(N=64, dcrt=DCRTParams(N=64, moduli=_moduli_chain_pattern(
        64, (52, 40, 40))), scale=float(1 << 40))
    ctx = CKKSContext(p, seed=77)
    actx = CKKSAutoContext(CKKSRnsContext(ctx, dnum=2))
    sk, pk = actx.key_gen()
    rlk = actx.relin_key_gen(sk)
    x = np.linspace(0.2, 0.8, 32)
    ct = actx.eval_mult(actx.encrypt(pk, x), actx.encrypt(pk, x), rlk)

    path = tmp_path / "ckks_ct.npz"
    save_ckks_ciphertext(path, ct)
    back = load_ckks_ciphertext(path)
    assert back.noise_deg == ct.noise_deg == 2
    assert back.scale == ct.scale
    assert back.polys[0].params.moduli == ct.polys[0].params.moduli
    for a, b in zip(ct.polys, back.polys):
        np.testing.assert_array_equal(a.rns, b.rns)
    got = actx.decrypt(sk, back).real
    want = actx.decrypt(sk, ct).real
    np.testing.assert_array_equal(got, want)


def test_seeded_ksk_round_trip(tmp_path):
    """Seeded switching keys serialize as (seed, B); the regenerated key
    decrypts/evaluates identically after load."""
    import numpy as np
    from tfhe_tpu import BinFHEContext
    from tfhe_tpu import lwe as lwe_mod
    from tfhe_tpu.params import BinFHEParams, LWEParams, Method, RGSWParams
    from tfhe_tpu.utils import serial
    from tfhe_tpu.utils.numtheory import ntt_prime

    N, q = 256, 512
    Q = ntt_prime(20, 2 * N)
    cc = BinFHEContext(seed=91, seeded_ksk=True)
    cc.params = BinFHEParams(
        lwe=LWEParams(n=8, N=N, q=q, Q=Q, q_ks=1 << 35, std=3.19, base_ks=32),
        rgsw=RGSWParams(N=N, Q=Q, q=q, base_g=1 << 5, base_r=23,
                        method=Method.GINX, std=3.19))
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    assert isinstance(cc.bt_key.ksk, lwe_mod.SeededSwitchingKey)
    path = str(tmp_path / "ctx_seeded.npz")
    serial.save_context(path, cc.params, bt_key=cc.bt_key)
    params2, keys2 = serial.load_context(path)
    k2 = keys2[cc.bt_key.base_g].ksk
    assert isinstance(k2, lwe_mod.SeededSwitchingKey)
    np.testing.assert_array_equal(np.asarray(cc.bt_key.ksk.B),
                                  np.asarray(k2.B))
    np.testing.assert_array_equal(cc.bt_key.ksk.A, k2.A)
