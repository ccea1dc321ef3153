"""Key-reuse paths: a switching key depends only on (sk, skN) and the LWE
block, so it can be shared across gadget bases (the time_optimization map,
binfhecontext.cpp:224-246 regenerates one per base — ours hoists it) and
across contexts whose LWE parameters match (all accelerated logQ configs)."""

import numpy as np

from tfhe_tpu import BinFHEContext, Gate, ParamSet


def test_bt_key_gen_reuses_ksk_across_contexts():
    cc1 = BinFHEContext(seed=11)
    cc1.generate_binfhe_context(ParamSet.TOY, arb_func=True, log_q=12)
    sk = cc1.key_gen()
    cc1.bt_key_gen(sk)

    cc2 = BinFHEContext(seed=12)
    cc2.generate_binfhe_context(ParamSet.TOY, arb_func=False, log_q=17)
    p1, p2 = cc1.params.lwe, cc2.params.lwe
    assert (p1.n, p1.N, p1.Q, p1.q_ks, p1.base_ks, p1.digit_count_ks) == \
        (p2.n, p2.N, p2.Q, p2.q_ks, p2.base_ks, p2.digit_count_ks)
    cc2.bt_key_gen(sk, sk_n=cc1.bt_key.sk_n, ksk=cc1.bt_key.ksk)
    assert cc2.bt_key.ksk is cc1.bt_key.ksk

    # the reused-KSK context must still evaluate correctly end to end
    Q_enc = 1 << 17
    q = cc2.params.lwe.q
    P = cc2.get_max_plaintext_space() * (Q_enc // q)
    delta = np.array([-2, -1, 0, 1, 2, 3, -3, 1])
    m = (P // 2 + delta) % P
    ct = cc2.encrypt(sk, m, "FRESH", P, Q_enc)
    out = cc2.eval_sign(ct)
    got = np.asarray(cc2.decrypt(sk, out, 2), dtype=np.int64)
    assert np.array_equal(got, (delta >= 0).astype(np.int64))


def test_time_optimization_map_shares_one_ksk():
    cc = BinFHEContext(seed=13)
    cc.generate_binfhe_context(ParamSet.TOY, arb_func=False, log_q=17,
                               time_optimization=True)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    keys = list(cc.bt_key_map.values())
    assert len(keys) >= 2
    assert all(k.ksk is keys[0].ksk for k in keys)
    assert all(k.sk_n is keys[0].sk_n for k in keys)

    Q_enc = 1 << 17
    q = cc.params.lwe.q
    P = cc.get_max_plaintext_space() * (Q_enc // q)
    delta = np.array([-2, 1, 0, -1])
    m = (P // 2 + delta) % P
    ct = cc.encrypt(sk, m, "FRESH", P, Q_enc)
    out = cc.eval_sign(ct)
    got = np.asarray(cc.decrypt(sk, out, 2), dtype=np.int64)
    assert np.array_equal(got, (delta >= 0).astype(np.int64))


def test_gate_still_correct_after_rng_changes():
    cc = BinFHEContext(seed=14)
    cc.generate_binfhe_context(ParamSet.TOY)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    m1 = np.array([0, 0, 1, 1])
    m2 = np.array([0, 1, 0, 1])
    out = cc.eval_bin_gate(Gate.AND, cc.encrypt(sk, m1), cc.encrypt(sk, m2))
    assert np.array_equal(np.asarray(cc.decrypt(sk, out)), m1 & m2)
