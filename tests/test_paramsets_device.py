"""Every classic parameter set through the JAX device path, bit-exact vs the
host oracle.

The reference runs all 17 table sets (binfhecontext.cpp:137-156) through one
GPU dispatch covering NHalf 512-4096 x digitsG2 2-16 (bootstrapping.cu:772-871,
1161-1554); this matrix asserts the same breadth here, including the big-Q
sets (STD192/STD128Q/STD192Q..., Q in [2^31, 2^54)) that pair the two-limb
rotation with the u32 key switch. The LWE dimension n is shrunk so each
blind rotation runs a handful of rounds — every modulus/base/digit code path
is exercised at full production width (N, Q, qKS, baseG, baseKS) while the
oracle comparison stays CI-fast.
"""

import dataclasses

import numpy as np
import pytest

from tfhe_tpu import lwe, scheme
from tfhe_tpu import params as params_mod
from tfhe_tpu.params import Method, ParamSet
from tfhe_tpu.ops.backend import JaxBackend
from tfhe_tpu.ref.backend import RefBackend
from tfhe_tpu.ref.rgsw import poly_transpose
from tfhe_tpu.utils.rng import BinFHERng

_MINI_N = 12


def _mini_params(param_set: ParamSet, method: Method) -> params_mod.BinFHEParams:
    p = params_mod.from_param_set(param_set, method)
    return params_mod.BinFHEParams(
        lwe=dataclasses.replace(p.lwe, n=_MINI_N), rgsw=p.rgsw)


def _run_pipeline_compare(params):
    be = JaxBackend()
    rng = BinFHERng(1000 + params.lwe.N + params.lwe.Q % 97)
    sk = lwe.key_gen(rng, params.lwe.n, params.lwe.q_ks)
    key = scheme.key_gen(rng, params, sk)
    p = params.lwe
    nprng = np.random.default_rng(p.Q % 10007)
    B = 2
    acc = nprng.integers(0, p.Q, (B, 2, p.N)).astype(np.uint64)
    a = nprng.integers(0, p.q, (B, p.n)).astype(np.uint64)

    ref_acc = RefBackend().eval_acc(params, key, acc.copy(), a, p.q)
    dev_acc = be.eval_acc(params, key, acc.copy(), a, p.q)
    np.testing.assert_array_equal(ref_acc, dev_acc)

    # transpose/extract + gate constant, then the fused mod-key-mod switch
    a_t = poly_transpose(ref_acc[:, 0, :], p.Q)
    b = (ref_acc[:, 1, 0] + np.uint64(p.Q // 8 + 1)) % np.uint64(p.Q)
    ref_ct = RefBackend().mkm_switch(params, key, a_t, b, p.q)
    dev_ct = be.mkm_switch(params, key, a_t, b, p.q)
    np.testing.assert_array_equal(ref_ct.a, dev_ct.a)
    np.testing.assert_array_equal(np.asarray(ref_ct.b), np.asarray(dev_ct.b))


@pytest.mark.parametrize("param_set", list(ParamSet), ids=lambda s: s.name)
def test_classic_set_device_ginx(param_set):
    params = _mini_params(param_set, Method.GINX)
    assert JaxBackend().supports(params), \
        f"{param_set.name} (GINX) must run on the device path"
    _run_pipeline_compare(params)


@pytest.mark.parametrize("param_set", list(ParamSet), ids=lambda s: s.name)
def test_classic_set_device_dm(param_set):
    params = _mini_params(param_set, Method.AP)
    if not JaxBackend().supports(params):
        pytest.skip(f"{param_set.name} (DM) not device-supported "
                    "(large-Q DM runs on the host oracle)")
    _run_pipeline_compare(params)
