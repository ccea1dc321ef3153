"""Native C++ host math core: bit-exactness against the pure-numpy NTT."""

import numpy as np
import pytest

from tfhe_tpu import native
from tfhe_tpu.ref import ntt as ref_ntt
from tfhe_tpu.ref import modmath
from tfhe_tpu.utils.numtheory import ntt_prime


@pytest.mark.skipif(native.get_lib() is None, reason="native toolchain missing")
@pytest.mark.parametrize("N,qbits", [(64, 27), (256, 28), (512, 54)])
def test_native_ntt_matches_numpy(N, qbits):
    Q = ntt_prime(qbits, 2 * N)
    rng = np.random.default_rng(7)
    x = rng.integers(0, Q, (17, N)).astype(np.uint64)

    t = ref_ntt._tables(N, Q)
    tx = modmath.mul(x, t["twist"], Q)
    want_fwd = ref_ntt._cyclic_ntt(tx, t["fwd_stages"], t["bitrev"], Q)

    got_fwd = x.copy()
    assert native.ntt_batch(got_fwd, Q, ref_ntt._psi(N, Q), inverse=False)
    assert np.array_equal(want_fwd, got_fwd)

    got_inv = got_fwd.copy()
    assert native.ntt_batch(got_inv, Q, ref_ntt._psi(N, Q), inverse=True)
    assert np.array_equal(got_inv, x)


@pytest.mark.skipif(native.get_lib() is None, reason="native toolchain missing")
def test_forward_routes_through_native(monkeypatch):
    N, Q = 128, ntt_prime(27, 256)
    rng = np.random.default_rng(1)
    x = rng.integers(0, Q, (5, N)).astype(np.uint64)
    via_native = ref_ntt.forward(x, Q)
    monkeypatch.setenv("TFHE_TPU_NATIVE", "0")
    via_numpy = ref_ntt.forward(x, Q)
    assert np.array_equal(via_native, via_numpy)


@pytest.mark.skipif(native.get_lib() is None, reason="native toolchain missing")
def test_native_cggi_rotate_matches_numpy():
    """C++ blind rotation == the pure-numpy oracle loop, bit for bit."""
    from tfhe_tpu import BinFHEContext, ParamSet
    from tfhe_tpu.ref import rgsw

    cc = BinFHEContext(seed=3)
    cc.generate_binfhe_context(ParamSet.TOY)
    sk = cc.key_gen()
    cc.bt_key_gen(sk)
    p = cc.params.rgsw
    ek = rgsw.to_eval_cggi(p, cc.bt_key.bsk_coeff)
    rng = np.random.default_rng(5)
    acc = rng.integers(0, p.Q, (2, p.N)).astype(np.uint64)
    a = rng.integers(0, p.q, cc.params.lwe.n).astype(np.uint64)

    got = rgsw.eval_acc_cggi(p, ek, acc.copy(), a, p.q)   # native path

    # force the numpy loop
    M = 2 * p.N
    factor = M // p.q
    want = acc.copy()
    for i in range(len(a)):
        a_scaled = int((p.q - int(a[i])) % p.q) * factor
        want = rgsw.add_to_acc_cggi(p, ek.bsk_hat[i, 0], ek.bsk_hat[i, 1],
                                    a_scaled, want)
    assert np.array_equal(got, want)
