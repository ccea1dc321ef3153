"""Device DCRT tower primitives (pke/dcrt_device.py): per-limb NTTs, CKKS
tensor product and RNS rescale on the accelerator, bit-identical to the host
tower — the first slice of the pke device offload."""

import numpy as np
import pytest

from tfhe_tpu.pke import dcrt_device as dd
from tfhe_tpu.pke.ckks_rns import rescale_rns
from tfhe_tpu.pke.dcrt import DCRTParams, DCRTPoly


@pytest.fixture(scope="module")
def tower():
    lp = DCRTParams.create(64, 3, bits=28)
    rng = np.random.default_rng(0)

    def poly():
        return DCRTPoly.from_signed(lp, rng.integers(-1000, 1000, 64),
                                    eval_form=True)

    return lp, rng, poly


def test_device_ntt_matches_host(tower):
    lp, rng, _ = tower
    c = DCRTPoly.from_signed(lp, rng.integers(-1000, 1000, 64))
    np.testing.assert_array_equal(dd.to_eval_device(c).rns, c.to_eval().rns)


def test_device_tensor_matches_host(tower):
    lp, rng, poly = tower
    a0, a1, b0, b1 = poly(), poly(), poly(), poly()
    d = dd.tensor_mult_device([a0, a1], [b0, b1])
    for dev, host in zip(d, (a0 * b0, a0 * b1 + a1 * b0, a1 * b1)):
        np.testing.assert_array_equal(dev.rns, host.rns)


def test_device_rescale_matches_host(tower):
    lp, rng, _ = tower
    p = DCRTPoly(lp, np.stack([rng.integers(0, m, 64).astype(np.uint64)
                               for m in lp.moduli]), eval_form=False).to_eval()
    np.testing.assert_array_equal(dd.rescale_device(p).rns,
                                  rescale_rns(p).rns)


def test_device_rns_ckks_mult_chain(tower):
    """A CKKS RNS multiplication using the device tensor/rescale primitives,
    decrypting correctly (end-to-end composition check)."""
    from tfhe_tpu.pke.ckks import CKKSCiphertext, CKKSContext, CKKSParams
    from tfhe_tpu.pke.ckks_rns import CKKSRnsContext

    p = CKKSParams(N=64, dcrt=DCRTParams.create(64, 4, bits=28),
                   scale=float(1 << 28))
    ctx = CKKSContext(p, seed=5)
    sk, pk = ctx.key_gen()
    rctx = CKKSRnsContext(ctx, dnum=2)
    keys = rctx.relin_key_gen(sk)
    z = np.linspace(0.05, 0.6, p.slots)
    ct = ctx.encrypt(pk, z)

    # tensor + relin (host RNS) but with the tensor product computed on device
    lp = ct.polys[0].params
    d0, d1, d2 = dd.tensor_mult_device(ct.polys, ct.polys)
    from tfhe_tpu.pke.ckks_rns import rns_hybrid_key_switch
    s0, s1 = rns_hybrid_key_switch(keys[lp.L], d2, lp.moduli)
    out = CKKSCiphertext(
        [dd.rescale_device(d0 + s0), dd.rescale_device(d1 + s1)],
        ct.scale * ct.scale / lp.moduli[-1], p)
    assert np.abs(ctx.decrypt(sk, out) - z * z).max() < 1e-4
