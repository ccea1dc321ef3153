"""Ablation profile of the blind-rotation round on the current device.

Times variants of the round body at STD128 shapes to locate the bottleneck
(NTT vs pointwise vs rotations vs decompose). Run on the real TPU:
    python scripts/profile_rotation.py [batch]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from tfhe_tpu.utils.jaxcfg import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tfhe_tpu.ops import modmath32 as mm  # noqa: E402
from tfhe_tpu.ops.blindrotate32 import _decompose, _rotate_sub  # noqa: E402
from tfhe_tpu.ops.ntt32 import NTT32  # noqa: E402
from tfhe_tpu.utils.numtheory import ntt_prime  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
N, n, dg = 1024, 512, 4
Q = ntt_prime(27, 2048)
base_g = 1 << 7
d2 = 2 * dg
ntt = NTT32(N, Q)


def make(variant):
    def round_fn(r, state):
        acc, a_idx, bsk, bsk_sh = state
        dct = _decompose(acc, Q, base_g, dg, 0)
        if variant == "decompose_only":
            upd = dct[:, :2]
        else:
            dct_hat = ntt.forward(dct) if variant != "no_ntt" else dct
            ek = jax.lax.dynamic_index_in_dim(bsk, r, 0, keepdims=False)
            ek_sh = jax.lax.dynamic_index_in_dim(bsk_sh, r, 0, keepdims=False)
            if variant == "no_pointwise":
                u = jnp.stack([dct_hat[:, :2], dct_hat[:, 2:4]], axis=1)
            else:
                prod = mm.mulmod_shoup(dct_hat[:, None, :, None, :], ek[None], ek_sh[None], Q)
                u = mm.sum_mod(prod, 2, Q)
            c = ntt.inverse(u) if variant != "no_ntt" else u
            if variant == "no_rotate":
                upd = mm.addmod(c[:, 0], c[:, 1], Q)
            else:
                idx_pos = a_idx[:, r]
                idx_neg = (np.int32(2 * N) - idx_pos) % np.int32(2 * N)
                upd = mm.addmod(_rotate_sub(c[:, 0], idx_pos, Q),
                                _rotate_sub(c[:, 1], idx_neg, Q), Q)
        acc = mm.addmod(acc, upd, Q)
        return acc, a_idx, bsk, bsk_sh

    @jax.jit
    def rot(acc, a_idx, bsk, bsk_sh):
        return jax.lax.fori_loop(0, n, round_fn, (acc, a_idx, bsk, bsk_sh))[0]

    return rot


def main():
    rng = np.random.default_rng(0)
    acc = jnp.asarray(rng.integers(0, Q, (B, 2, N)).astype(np.uint32))
    a_idx = jnp.asarray(rng.integers(0, 2 * N, (B, n)).astype(np.int32))
    bsk = jnp.asarray(rng.integers(0, Q, (n, 2, d2, 2, N)).astype(np.uint32))
    bsk_sh = jnp.asarray(rng.integers(0, 2**31, (n, 2, d2, 2, N)).astype(np.uint32))

    from tfhe_tpu.ops.blindrotate32 import build_blind_rotate
    variants = ("real", "full", "no_rotate", "no_pointwise", "no_ntt", "decompose_only")
    for variant in variants:
        fn = build_blind_rotate(N, Q, base_g, dg, 0, n) if variant == "real" else make(variant)
        np.asarray(jax.device_get(fn(acc, a_idx, bsk, bsk_sh)))  # compile+warm
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = fn(acc, a_idx, bsk, bsk_sh)
            np.asarray(jax.device_get(out))  # force completion over the tunnel
        dt = (time.time() - t0) / reps
        print(f"{variant:16s} {dt*1000:9.1f} ms/rotation  ({dt/B*1e6:8.1f} us/ct)", flush=True)


if __name__ == "__main__":
    main()
