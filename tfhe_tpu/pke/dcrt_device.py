"""Device-resident DCRT tower primitives (limb moduli < 2^31).

First slice of the TPU offload for the pure-RNS pke stack (pke/ckks_rns.py):
the [L, N] residue towers map onto per-limb device NTTs (ops/ntt32) and
vectorized modular pointwise ops — the exact operations `DCRTPoly` runs on
host numpy, jitted for the accelerator. Because every step is exact u32
arithmetic, device results are bit-identical to the host tower
(tests/test_dcrt_device.py).

Scope: CKKS-RNS chains want ~28-bit limbs here (u32 device lanes), i.e.
`DCRTParams.create(N, L, bits=28)`; the 40-bit-limb host chains keep the
numpy path. Offload of the full CKKSRnsContext (keyswitch FBC on device) is
the round-3 follow-up; these primitives are the hot 95% (NTTs + pointwise).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import modmath32 as mm
from ..ops import modmath32v as mv
from ..ops.nttl import NTTL
from .dcrt import DCRTParams, DCRTPoly


def _check(params: DCRTParams) -> None:
    assert all(m < (1 << 31) for m in params.moduli), \
        "device tower needs limb moduli < 2^31 (use DCRTParams.create(bits<=30))"


@functools.lru_cache(maxsize=None)
def build_to_eval(params: DCRTParams):
    _check(params)
    ntt = NTTL(params.N, tuple(params.moduli))

    @jax.jit
    def fwd(rns):                                   # [L, N] u32 coeff-form
        return ntt.forward(rns)

    return fwd


@functools.lru_cache(maxsize=None)
def build_to_coeff(params: DCRTParams):
    _check(params)
    ntt = NTTL(params.N, tuple(params.moduli))

    @jax.jit
    def inv(rns):                                   # [L, N] u32 eval-form
        return ntt.inverse(rns)

    return inv


@functools.lru_cache(maxsize=None)
def build_tensor_mult(params: DCRTParams):
    """(a0, a1, b0, b1) eval-form towers -> (d0, d1, d2) of the CKKS tensor
    product, all on device: d0 = a0*b0, d1 = a0*b1 + a1*b0, d2 = a1*b1."""
    _check(params)
    lm = mv.LimbModuli(tuple(params.moduli))

    @jax.jit
    def tensor(a0, a1, b0, b1):
        d0 = mv.barrett_mulmod_v(a0, b0, lm)
        d1 = mv.addmod_v(mv.barrett_mulmod_v(a0, b1, lm),
                         mv.barrett_mulmod_v(a1, b0, lm), lm)
        d2 = mv.barrett_mulmod_v(a1, b1, lm)
        return d0, d1, d2

    return tensor


@functools.lru_cache(maxsize=None)
def build_rescale(params: DCRTParams):
    """RNS ModReduce on device: drop the last limb, scale by 1/q_last
    (the device form of ckks_rns.rescale_rns; input/output coefficient
    form — compose with to_coeff/to_eval for eval-form towers)."""
    _check(params)
    q_last = params.moduli[-1]
    keep = params.moduli[:-1]
    half = np.uint32(q_last // 2)
    inv = [np.uint32(pow(q_last, -1, m)) for m in keep]
    inv_sh = [np.uint32((pow(q_last, -1, m) << 32) // m) for m in keep]

    q_last_mod = [np.uint32(q_last % m) for m in keep]

    @jax.jit
    def rescale(rns):                               # [L, N] u32 coeff-form
        c_last = rns[-1]
        rows = []
        for i, m in enumerate(keep):
            # reduce both operands mod m before the centered subtraction so
            # nothing wraps in u32 when m < q_last (mixed-width limb chains)
            cl_m = mm.mod_u32(c_last, m)
            cl = jnp.where(c_last > half,
                           mm.submod(cl_m, q_last_mod[i], m),
                           cl_m)
            diff = mm.submod(mm.mod_u32(rns[i], m), cl, m)
            rows.append(mm.mulmod_shoup(diff, inv[i], inv_sh[i], m))
        return jnp.stack(rows)

    return rescale


# -- host-facing wrappers ---------------------------------------------------

def to_eval_device(poly: DCRTPoly) -> DCRTPoly:
    fn = build_to_eval(poly.params)
    out = np.asarray(jax.device_get(
        fn(poly.to_coeff().rns.astype(np.uint32)))).astype(np.uint64)
    return DCRTPoly(poly.params, out, eval_form=True)


def tensor_mult_device(a: list[DCRTPoly], b: list[DCRTPoly]) -> list[DCRTPoly]:
    """CKKS tensor product of two 2-poly ciphertext towers on device."""
    lp = a[0].params
    fn = build_tensor_mult(lp)
    args = [p.to_eval().rns.astype(np.uint32)
            for p in (a[0], a[1], b[0], b[1])]
    d0, d1, d2 = fn(*args)
    return [DCRTPoly(lp, np.asarray(jax.device_get(d)).astype(np.uint64), True)
            for d in (d0, d1, d2)]


def rescale_device(poly: DCRTPoly) -> DCRTPoly:
    lp = poly.params
    fn = build_rescale(lp)
    out = np.asarray(jax.device_get(
        fn(poly.to_coeff().rns.astype(np.uint32)))).astype(np.uint64)
    new_lp = DCRTParams(N=lp.N, moduli=lp.moduli[:-1])
    return DCRTPoly(new_lp, out, eval_form=False).to_eval()
