"""Limb-partitioned negacyclic NTT over a ('limb',) mesh axis.

SURVEY.md section 5.7: the reference's only "long axis" is the ring dimension
N inside one bootstrap, which its GPU splits across cooperative thread blocks
with grid.sync() between phases (bootstrapping.cu:120-401). The TPU-native
analogue — needed only when N is too large for one core's VMEM (N >= 2^15;
every shipped parameter set fits on-core, so this is the scalability proof,
not the hot path) — partitions the coefficient axis across mesh devices:

- the first log2(D) Gentleman-Sande (DIF) stages pair coefficients that live
  on different shards; each is one `jax.lax.ppermute` shard exchange followed
  by local butterflies (the collective rides ICI, exactly where the GPU pays
  grid.sync);
- the remaining stages are shard-local, identical to the single-core kernel
  math (roll + Shoup multiply + select, ops/ntt_sched.py).

Exact u32 arithmetic mod Q < 2^31; bit-identical to the host reference NTT
(tests/test_limb_ntt.py runs it on a virtual CPU mesh).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import modmath32 as mm
from ..ops.ntt_sched import schedule


@functools.lru_cache(maxsize=None)
def _tables(N: int, Q: int):
    sch = schedule(N, Q)
    fwd = np.concatenate([sch["twist"][None], sch["fwd_w"]], axis=0)
    return (np.ascontiguousarray(fwd.astype(np.uint64).astype(np.uint32)),
            mm.shoup(fwd, Q), sch["bitrev"])


def build_limb_ntt(N: int, Q: int, mesh: Mesh):
    """Jitted forward negacyclic NTT [.., N] u32 -> bit-reversed evaluation
    order (same convention as ops/ntt_sched), coefficient axis sharded over
    the mesh's 'limb' axis."""
    D = mesh.shape["limb"]
    S = N // D
    assert S * D == N and S % 2 == 0
    logn = N.bit_length() - 1
    logd = D.bit_length() - 1
    twf, twf_sh, _ = _tables(N, Q)

    def ntt_shard(x, twf_s, twf_sh_s):
        """x: [S] local shard; twf_s/twf_sh_s: [logn+1, S] local table shards.
        Runs under shard_map; axis name 'limb'."""
        idx = jax.lax.axis_index("limb")
        # twist (stage row 0 is the psi^j twist)
        x = _mulmod_lazy(x, twf_s[0], twf_sh_s[0], Q)
        # cross-shard DIF stages: h = N/2 .. S (pairs live D/(2^k) shards apart)
        for k in range(logd):
            h = N >> (k + 1)
            shift = h // S                      # shards between pair elements
            # perm pairs are (source, dest): to READ the shard `shift` ahead,
            # every source i must send to i - shift
            fwd = jax.lax.ppermute(x, "limb",
                                   [(i, (i - shift) % D) for i in range(D)])
            bwd = jax.lax.ppermute(x, "limb",
                                   [(i, (i + shift) % D) for i in range(D)])
            # lanes with bit (logn-1-k) of the global position set are the
            # "odd half": global position = idx*S + j
            upper = ((idx >> (logd - 1 - k)) & 1) == 1
            w, wsh = twf_s[k + 1], twf_sh_s[k + 1]
            # even half: s = x + x[p+h]  (partner ahead); odd: t = w*(x[p-h]-x)
            s = _cond_sub(x + fwd, 2 * Q)
            t = _mulmod_lazy(bwd + np.uint32(2 * Q) - x, w, wsh, Q)
            x = jnp.where(upper, t, s)
        # local DIF stages: h = S/2 .. 1
        j = jax.lax.broadcasted_iota(jnp.int32, (S,), 0)
        for k in range(logd, logn):
            h = N >> (k + 1)
            m_bit = logn - 1 - k
            odd = ((j >> m_bit) & 1) == 1
            w, wsh = twf_s[k + 1], twf_sh_s[k + 1]
            d = _roll1(x, h, S) + np.uint32(2 * Q) - x
            t = _mulmod_lazy(d, w, wsh, Q)
            s = _cond_sub(x + _roll1(x, -h, S), 2 * Q)
            x = jnp.where(odd, t, s)
        return _cond_sub(_cond_sub(x, 2 * Q), Q)

    from jax.experimental.shard_map import shard_map

    fn = shard_map(ntt_shard, mesh=mesh,
                   in_specs=(P("limb"), P(None, "limb"), P(None, "limb")),
                   out_specs=P("limb"))

    @jax.jit
    def ntt(x):
        return fn(x, jnp.asarray(twf), jnp.asarray(twf_sh))

    return ntt


def _mulmod_lazy(a, b, b_sh, Q: int):
    t = mm.mulhi32(a, b_sh)
    return a * b - t * np.uint32(Q)


def _cond_sub(x, c: int):
    cc = np.uint32(c)
    return jnp.where(x >= cc, x - cc, x)


def _roll1(x, s: int, S: int):
    s %= S
    if s == 0:
        return x
    return jnp.concatenate([x[S - s:], x[:S - s]])
