"""Device auto-scaling (pke/ckks_auto_device.py): the FIXEDAUTO/FLEXIBLEAUTO
state machine over device-resident towers, bit-identical to the host layer.

Runs on the CPU JAX backend (conftest pins platform); the kernels are the
same u32 jits the TPU executes."""

import numpy as np
import pytest

from tfhe_tpu.pke.ckks import CKKSContext, CKKSParams
from tfhe_tpu.pke.ckks_auto import CKKSAutoContext
from tfhe_tpu.pke.ckks_auto_device import CKKSAutoDeviceContext
from tfhe_tpu.pke.ckks_device import CKKSDeviceContext
from tfhe_tpu.pke.ckks_rns import CKKSRnsContext
from tfhe_tpu.pke.dcrt import DCRTParams, _moduli_chain_pattern

N, L = 64, 5


@pytest.fixture(scope="module", params=["flexibleauto", "fixedauto"])
def ctxs(request):
    # device chain: all limbs < 2^31 (u32 kernels); wide-ish first limb
    p = CKKSParams(N=N,
                   dcrt=DCRTParams(N=N, moduli=_moduli_chain_pattern(
                       N, (30,) + (28,) * (L - 1))),
                   scale=float(1 << 28))
    base = CKKSContext(p, seed=20260818)
    rns = CKKSRnsContext(base, dnum=2, ks_limb_bits=28)
    host = CKKSAutoContext(rns, technique=request.param)
    dev = CKKSAutoDeviceContext(CKKSDeviceContext(rns),
                                technique=request.param)
    sk, pk = base.key_gen()
    rlk = rns.relin_key_gen_single(sk)
    dev.dev.load_relin_keys(rlk)
    return host, dev, sk, pk, rlk


def _towers(ct):
    return [np.asarray(p.rns, dtype=np.uint64) for p in ct.polys]


def _assert_bitexact(host_ct, dev_ct, dev):
    down = dev.download(dev_ct)
    assert down.noise_deg == host_ct.noise_deg
    assert down.polys[0].params.moduli == host_ct.polys[0].params.moduli
    for hp, dp in zip(_towers(host_ct), _towers(down)):
        np.testing.assert_array_equal(hp, dp)


def test_mult_chain_bitexact(ctxs):
    """Lazy-rescale mult chain: device towers == host towers bit for bit."""
    host, dev, sk, pk, rlk = ctxs
    rng = np.random.default_rng(1)
    x = rng.uniform(0.2, 0.9, N // 2)
    y = rng.uniform(0.2, 0.9, N // 2)
    hx, hy = host.encrypt(pk, x), host.encrypt(pk, y)
    dx, dy = dev.upload(hx), dev.upload(hy)
    h = host.eval_mult(host.eval_mult(hx, hy, rlk), hx, rlk)
    d = dev.eval_mult(dev.eval_mult(dx, dy), dx)
    _assert_bitexact(h, d, dev)
    got = host.decrypt(sk, dev.download(d)).real
    assert np.abs(got - x * x * y).max() < 1e-3


def test_mixed_level_add_bitexact(ctxs):
    """x^4 + fresh y: the constant-multiply adjust path, device == host."""
    host, dev, sk, pk, rlk = ctxs
    rng = np.random.default_rng(2)
    x = rng.uniform(0.2, 0.9, N // 2)
    y = rng.uniform(0.2, 0.9, N // 2)
    hx, hy = host.encrypt(pk, x), host.encrypt(pk, y)
    dx, dy = dev.upload(hx), dev.upload(hy)
    hx2 = host.eval_mult(hx, hx, rlk)
    hx4 = host.eval_mult(hx2, hx2, rlk)
    hs = host.eval_add(hx4, hy)
    dx2 = dev.eval_mult(dx, dx)
    dx4 = dev.eval_mult(dx2, dx2)
    ds = dev.eval_add(dx4, dy)
    _assert_bitexact(hs, ds, dev)


def test_plaintext_ops_bitexact(ctxs):
    host, dev, sk, pk, rlk = ctxs
    rng = np.random.default_rng(3)
    x = rng.uniform(0.2, 0.9, N // 2)
    w = rng.uniform(-1.0, 1.0, N // 2)
    hx = host.encrypt(pk, x)
    dx = dev.upload(hx)
    h = host.eval_add_plain(host.eval_mult_plain(
        host.eval_mult(hx, hx, rlk), w), 0.25)
    d = dev.eval_add_plain(dev.eval_mult_plain(
        dev.eval_mult(dx, dx), w), 0.25)
    _assert_bitexact(h, d, dev)
    got = host.decrypt(sk, dev.download(d)).real
    assert np.abs(got - (x * x * w + 0.25)).max() < 1e-3


def test_scalar_and_sub_bitexact(ctxs):
    host, dev, sk, pk, rlk = ctxs
    rng = np.random.default_rng(4)
    x = rng.uniform(0.2, 0.9, N // 2)
    y = rng.uniform(0.2, 0.9, N // 2)
    hx, hy = host.encrypt(pk, x), host.encrypt(pk, y)
    dx, dy = dev.upload(hx), dev.upload(hy)
    h = host.eval_sub(host.eval_mult_plain(hx, 3.0), hy)
    d = dev.eval_sub(dev.eval_mult_plain(dx, 3.0), dy)
    _assert_bitexact(h, d, dev)


def test_rotation_bitexact(ctxs):
    host, dev, sk, pk, rlk = ctxs
    rns = host.rns
    gk = rns.galois_key_gen_single(sk, 1)
    dev.dev.load_galois_keys(1, gk)
    rng = np.random.default_rng(5)
    x = rng.uniform(0.2, 0.9, N // 2)
    y = rng.uniform(0.2, 0.9, N // 2)
    hx, hy = host.encrypt(pk, x), host.encrypt(pk, y)
    dx, dy = dev.upload(hx), dev.upload(hy)
    h = host.eval_add(host.eval_rotate(host.eval_mult(hx, hy, rlk), 1, gk),
                      hx)
    d = dev.eval_add(dev.eval_rotate(dev.eval_mult(dx, dy), 1), dx)
    _assert_bitexact(h, d, dev)


def test_batched_auto(ctxs):
    """[L, B, N] batch rides the same jits; each element matches the host."""
    host, dev, sk, pk, rlk = ctxs
    rng = np.random.default_rng(6)
    xs = [rng.uniform(0.2, 0.9, N // 2) for _ in range(3)]
    hcts = [host.encrypt(pk, x) for x in xs]
    d = dev.upload_batch(hcts)
    dres = dev.eval_add_plain(dev.eval_mult(d, d), 0.5)
    downs = dev.download_batch(dres)
    for x, ct in zip(xs, downs):
        got = host.decrypt(sk, ct).real
        assert np.abs(got - (x * x + 0.5)).max() < 1e-3
