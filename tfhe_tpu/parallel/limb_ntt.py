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


@functools.lru_cache(maxsize=None)
def _inv_tables(N: int, Q: int):
    """Rows [logN + 1, N]: the logN DIT stage vectors then the untwist
    (with N^-1 folded in), plus Shoup companions."""
    sch = schedule(N, Q)
    inv = np.concatenate([sch["inv_w"], sch["untwist"][None]], axis=0)
    return (np.ascontiguousarray(inv.astype(np.uint64).astype(np.uint32)),
            mm.shoup(inv, Q))


def _fwd_shard(x, twf_s, twf_sh_s, N: int, Q: int, D: int):
    """Forward DIF body on one shard: x [S] local slice of the natural-order
    coefficients; twf_s/twf_sh_s [logN+1, S] local table shards (row 0 is the
    psi^j twist). Must run under shard_map with axis name 'limb'. Returns the
    local slice of the bit-reversed evaluation order, fully reduced [0, Q)."""
    S = N // D
    logn = N.bit_length() - 1
    logd = D.bit_length() - 1
    idx = jax.lax.axis_index("limb")
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


def _inv_shard(x, twi_s, twi_sh_s, N: int, Q: int, D: int):
    """Inverse DIT body on one shard: x [S] local slice in bit-reversed
    evaluation order, values [0, 2Q); twi_s/twi_sh_s [logN+1, S] local table
    shards (last row is the untwist with N^-1 folded in). Returns the local
    natural-order coefficient slice, fully reduced [0, Q). Stage k pairs at
    distance h = 2^k: local while h < S, then ppermute shard exchanges."""
    S = N // D
    logn = N.bit_length() - 1
    logd = D.bit_length() - 1
    idx = jax.lax.axis_index("limb")
    j = jax.lax.broadcasted_iota(jnp.int32, (S,), 0)
    # local DIT stages: h = 1 .. S/2
    for k in range(logn - logd):
        h = 1 << k
        odd = ((j >> k) & 1) == 1
        w, wsh = twi_s[k], twi_sh_s[k]
        t = _mulmod_lazy(x, w, wsh, Q)               # odd-lane multipliers
        even = _cond_sub(x + _roll1(t, -h, S), 2 * Q)
        oddv = _cond_sub(_roll1(x, h, S) + np.uint32(2 * Q) - t, 2 * Q)
        x = jnp.where(odd, oddv, even)
    # cross-shard DIT stages: h = S .. N/2 (pair bit m of the shard index)
    for m in range(logd):
        k = logn - logd + m
        h = 1 << k
        shift = h // S
        w, wsh = twi_s[k], twi_sh_s[k]
        t = _mulmod_lazy(x, w, wsh, Q)
        # even lane p needs t[p+h]; odd lane p needs x[p-h]
        t_ahead = jax.lax.ppermute(t, "limb",
                                   [(i, (i - shift) % D) for i in range(D)])
        x_behind = jax.lax.ppermute(x, "limb",
                                    [(i, (i + shift) % D) for i in range(D)])
        upper = ((idx >> m) & 1) == 1
        even = _cond_sub(x + t_ahead, 2 * Q)
        oddv = _cond_sub(x_behind + np.uint32(2 * Q) - t, 2 * Q)
        x = jnp.where(upper, oddv, even)
    x = _mulmod_lazy(x, twi_s[logn], twi_sh_s[logn], Q)      # untwist
    return _cond_sub(_cond_sub(x, 2 * Q), Q)


def build_limb_ntt(N: int, Q: int, mesh: Mesh):
    """Jitted forward negacyclic NTT [N] u32 -> bit-reversed evaluation
    order (same convention as ops/ntt_sched), coefficient axis sharded over
    the mesh's 'limb' axis."""
    D = mesh.shape["limb"]
    S = N // D
    assert S * D == N and S % 2 == 0
    twf, twf_sh, _ = _tables(N, Q)

    from jax import shard_map

    fn = shard_map(lambda x, t, tsh: _fwd_shard(x, t, tsh, N, Q, D),
                   mesh=mesh,
                   in_specs=(P("limb"), P(None, "limb"), P(None, "limb")),
                   out_specs=P("limb"))

    @jax.jit
    def ntt(x):
        return fn(x, jnp.asarray(twf), jnp.asarray(twf_sh))

    return ntt


def build_limb_intt(N: int, Q: int, mesh: Mesh):
    """Jitted inverse negacyclic NTT: bit-reversed evaluation order [N] u32
    -> natural coefficient order, sharded over 'limb'. Exact inverse of
    build_limb_ntt (bit-identical to the host reference)."""
    D = mesh.shape["limb"]
    S = N // D
    assert S * D == N and S % 2 == 0
    twi, twi_sh = _inv_tables(N, Q)

    from jax import shard_map

    fn = shard_map(lambda x, t, tsh: _inv_shard(x, t, tsh, N, Q, D),
                   mesh=mesh,
                   in_specs=(P("limb"), P(None, "limb"), P(None, "limb")),
                   out_specs=P("limb"))

    @jax.jit
    def intt(x):
        return fn(x, jnp.asarray(twi), jnp.asarray(twi_sh))

    return intt


def build_limb_ckks_kernels(params, mesh: Mesh):
    """CKKS mult hot-loop kernels with the RING DIMENSION sharded over the
    ('limb',) mesh — the long-axis pke wiring (SURVEY §5.7): for rings too
    large for one core's VMEM, every NTT runs as cross-shard ppermute stages +
    local butterflies, and the pointwise tensor/rescale math is shard-local.

    params: DCRTParams (limb moduli < 2^30 for the lazy-reduction headroom).
    Returns jitted fns over natural-order COEFFICIENT towers (u32, coefficient
    axis sharded):

    - ``tensor``: (a0, a1, b0, b1) [L, N] -> (d0, d1, d2) [L, N], the CKKS
      tensor product (EvalMultCore, rns-leveledshe.cpp) — 12 sharded forward
      and 9 sharded inverse NTTs + shard-local pointwise products;
    - ``rescale``: [L, N] -> [L-1, N], RNS ModReduce (shard-local pointwise,
      the same centered correction as ckks_rns.rescale_rns).

    The relinearization seam stays at d2 (hybrid key switch composes on the
    gathered towers, ckks_rns.eval_mult_limb). Bit-identical to the host
    DCRTPoly path (tests/test_limb_ntt.py)."""
    from jax import shard_map

    N = params.N
    mods = params.moduli
    D = mesh.shape["limb"]
    S = N // D
    assert S * D == N and S % 2 == 0
    assert all(m < (1 << 30) for m in mods), \
        "limb-sharded pipeline needs moduli < 2^30 (lazy-reduction headroom)"
    ft = np.stack([_tables(N, m)[0] for m in mods])          # [L, logn+1, N]
    ftsh = np.stack([_tables(N, m)[1] for m in mods])
    it = np.stack([_inv_tables(N, m)[0] for m in mods])
    itsh = np.stack([_inv_tables(N, m)[1] for m in mods])

    def tensor_body(a0, a1, b0, b1, ftl, ftshl, itl, itshl):
        def fwd(x, l):
            return _fwd_shard(x, ftl[l], ftshl[l], N, mods[l], D)

        def inv(x, l):
            return _inv_shard(x, itl[l], itshl[l], N, mods[l], D)

        d0, d1, d2 = [], [], []
        for l, m in enumerate(mods):
            ea0, ea1 = fwd(a0[l], l), fwd(a1[l], l)
            eb0, eb1 = fwd(b0[l], l), fwd(b1[l], l)
            p00 = mm.barrett_mulmod(ea0, eb0, m)
            p01 = mm.addmod(mm.barrett_mulmod(ea0, eb1, m),
                            mm.barrett_mulmod(ea1, eb0, m), m)
            p11 = mm.barrett_mulmod(ea1, eb1, m)
            d0.append(inv(p00, l))
            d1.append(inv(p01, l))
            d2.append(inv(p11, l))
        return jnp.stack(d0), jnp.stack(d1), jnp.stack(d2)

    # rescale constants (the sharded form of ckks_rns.rescale_rns)
    q_last = mods[-1]
    keep = mods[:-1]
    half = np.uint32(q_last // 2)
    inv_q = np.array([pow(q_last, -1, m) for m in keep], dtype=np.uint64)
    inv_sh = np.stack([mm.shoup(np.array([v], dtype=np.uint64), m)[0]
                       for v, m in zip(inv_q, keep)])
    q_last_mod = [np.uint32(q_last % m) for m in keep]

    def rescale_body(rows):
        c_last = rows[-1]
        out = []
        for i, m in enumerate(keep):
            cl_m = mm.mod_u32(c_last, m)
            cl = jnp.where(c_last > half,
                           mm.submod(cl_m, q_last_mod[i], m), cl_m)
            diff = mm.submod(mm.mod_u32(rows[i], m), cl, m)
            out.append(mm.mulmod_shoup(diff, np.uint32(inv_q[i]),
                                       inv_sh[i], m))
        return jnp.stack(out)

    tower = P(None, "limb")
    tab = P(None, None, "limb")
    t_fn = shard_map(tensor_body, mesh=mesh,
                     in_specs=(tower,) * 4 + (tab,) * 4,
                     out_specs=(tower,) * 3)
    r_fn = shard_map(rescale_body, mesh=mesh, in_specs=(tower,),
                     out_specs=tower)

    @jax.jit
    def tensor(a0, a1, b0, b1):
        return t_fn(a0, a1, b0, b1, jnp.asarray(ft), jnp.asarray(ftsh),
                    jnp.asarray(it), jnp.asarray(itsh))

    return {"tensor": tensor, "rescale": jax.jit(r_fn)}


_MULT_CACHE: dict = {}


def _pack_key_np(key):
    """RnsHybridKey -> numpy [G, L_pq, N] u32 towers + Shoup companions
    (the host-side twin of ckks_device._PackedKey, left as numpy so the jit
    shards them straight onto the mesh instead of replicating first). The
    rows are permuted from the canonical eval order into the schedule's
    bit-reversed evaluation order — the one-time host permutation
    ops/ntt_sched.py calls out — so they line up with _fwd_shard outputs."""
    pq = key.pq_params.moduli
    assert all(m < (1 << 30) for m in pq), \
        "limb-sharded keyswitch needs all PQ limbs < 2^30 " \
        "(build the context with ks_limb_bits <= 29)"
    G, L_pq, N = len(key.bs), len(pq), key.pq_params.N
    kb = np.zeros((G, L_pq, N), dtype=np.uint32)
    ka = np.zeros((G, L_pq, N), dtype=np.uint32)
    kb_sh = np.zeros((G, L_pq, N), dtype=np.uint32)
    ka_sh = np.zeros((G, L_pq, N), dtype=np.uint32)
    for g in range(G):
        for i, m in enumerate(pq):
            br = _tables(N, m)[2]
            b_row = np.empty(N, dtype=np.uint64)
            a_row = np.empty(N, dtype=np.uint64)
            b_row[br] = np.asarray(key.bs[g].rns[i], dtype=np.uint64)
            a_row[br] = np.asarray(key.as_[g].rns[i], dtype=np.uint64)
            kb[g, i] = b_row.astype(np.uint32)
            ka[g, i] = a_row.astype(np.uint32)
            kb_sh[g, i] = ((b_row << np.uint64(32)) // np.uint64(m)).astype(np.uint32)
            ka_sh[g, i] = ((a_row << np.uint64(32)) // np.uint64(m)).astype(np.uint32)
    return kb, kb_sh, ka, ka_sh


def build_limb_mult(params, key, mesh: Mesh):
    """Full CKKS eval_mult — tensor product, hybrid relinearization
    (per-group HPS fast base conversion, inner product with the key towers,
    ModDown by P) and RNS rescale — in ONE jit with the RING DIMENSION
    sharded over the ('limb',) mesh axis. No host seam anywhere: the FBC /
    ModDown / rescale arithmetic is per-coefficient across limbs, hence
    shard-local under the N-sharding, and every NTT runs as cross-shard
    ppermute stages + local butterflies (_fwd_shard/_inv_shard). Reference
    parity: rns-leveledshe.cpp EvalMultCore + keyswitch-hybrid.cpp:1-484 +
    ModReduce, re-laid-out for a device mesh.

    params: DCRTParams of the ciphertext level chain; key: RnsHybridKey for
    that chain (every PQ limb < 2^30 for lazy-reduction headroom).
    Returns (mult, key_arrays): ``mult(a0, a1, b0, b1)`` maps natural-order
    COEFFICIENT towers [L, N] u32 to rescaled output towers [L-1, N].
    Bit-identical to the host CKKSRnsContext.eval_mult and to the
    single-device ckks_device.build_mult_relin_rescale."""
    from jax import shard_map

    from ..pke.ckks_device import _make_fbc, _make_rescale, _shoup_c

    N = params.N
    lvl = tuple(params.moduli)
    p_moduli = tuple(key.p_moduli)
    groups = tuple(tuple(g) for g in key.groups)
    D = mesh.shape["limb"]
    S = N // D
    assert S * D == N and S % 2 == 0
    pq = lvl + p_moduli
    assert all(m < (1 << 30) for m in pq), \
        "limb-sharded pipeline needs moduli < 2^30 (lazy-reduction headroom)"
    assert tuple(key.q_moduli) == lvl, \
        "use the hybrid key generated for this level chain"
    cache_key = (N, lvl, p_moduli, groups, D, mesh)
    kargs = getattr(key, "_limb_packed", None)
    if kargs is None:
        kargs = _pack_key_np(key)
        key._limb_packed = kargs
    if cache_key in _MULT_CACHE:
        return _MULT_CACHE[cache_key], kargs

    n_q = len(lvl)
    ft = np.stack([_tables(N, m)[0] for m in pq])            # [L_pq, logn+1, N]
    ftsh = np.stack([_tables(N, m)[1] for m in pq])
    it = np.stack([_inv_tables(N, m)[0] for m in pq])
    itsh = np.stack([_inv_tables(N, m)[1] for m in pq])

    fbcs = [_make_fbc(lvl[g0:g1], pq) for (g0, g1) in groups]
    fbc_p = _make_fbc(p_moduli, lvl)
    rescale = _make_rescale(lvl)
    P_big = 1
    for m in p_moduli:
        P_big *= m
    pinv_c = [(np.uint32(pow(P_big % m, -1, m)),
               _shoup_c(pow(P_big % m, -1, m), m)) for m in lvl]

    def body(a0, a1, b0, b1, kb, kb_sh, ka, ka_sh, ftl, ftshl, itl, itshl):
        def fwd(x, i):
            return _fwd_shard(x, ftl[i], ftshl[i], N, pq[i], D)

        def inv(x, i):
            return _inv_shard(x, itl[i], itshl[i], N, pq[i], D)

        d0r, d1r, d2c = [], [], []
        for i, m in enumerate(lvl):
            ea0, ea1 = fwd(a0[i], i), fwd(a1[i], i)
            eb0, eb1 = fwd(b0[i], i), fwd(b1[i], i)
            d0r.append(mm.barrett_mulmod(ea0, eb0, m))
            d1r.append(mm.addmod(mm.barrett_mulmod(ea0, eb1, m),
                                 mm.barrett_mulmod(ea1, eb0, m), m))
            d2c.append(inv(mm.barrett_mulmod(ea1, eb1, m), i))
        # hybrid key switch of d2 (all shard-local except the NTTs)
        acc0 = [None] * len(pq)
        acc1 = [None] * len(pq)
        for g, (g0, g1) in enumerate(groups):
            # the shared FBC/rescale helpers are limb-stacked now
            ext = fbcs[g](jnp.stack([d2c[i] for i in range(g0, g1)]))
            for i, m in enumerate(pq):
                dp = fwd(ext[i], i)
                t0 = mm.mulmod_shoup(dp, kb[g, i], kb_sh[g, i], m)
                t1 = mm.mulmod_shoup(dp, ka[g, i], ka_sh[g, i], m)
                acc0[i] = t0 if acc0[i] is None else mm.addmod(acc0[i], t0, m)
                acc1[i] = t1 if acc1[i] is None else mm.addmod(acc1[i], t1, m)

        def moddown(rows):
            conv = fbc_p(jnp.stack(rows[n_q:]))
            out = []
            for i, m in enumerate(lvl):
                diff = mm.submod(rows[i], conv[i], m)
                out.append(mm.mulmod_shoup(diff, pinv_c[i][0],
                                           pinv_c[i][1], m))
            return out

        s0 = moddown([inv(acc0[i], i) for i in range(len(pq))])
        s1 = moddown([inv(acc1[i], i) for i in range(len(pq))])
        c0c = [mm.addmod(inv(d0r[i], i), s0[i], m) for i, m in enumerate(lvl)]
        c1c = [mm.addmod(inv(d1r[i], i), s1[i], m) for i, m in enumerate(lvl)]
        return rescale(jnp.stack(c0c)), rescale(jnp.stack(c1c))

    row = P(None, "limb")
    key3 = P(None, None, "limb")
    fn = shard_map(body, mesh=mesh,
                   in_specs=(row,) * 4 + (key3,) * 8,
                   out_specs=(row, row))

    @jax.jit
    def mult(a0, a1, b0, b1, kb, kb_sh, ka, ka_sh):
        return fn(a0, a1, b0, b1, kb, kb_sh, ka, ka_sh,
                  jnp.asarray(ft), jnp.asarray(ftsh),
                  jnp.asarray(it), jnp.asarray(itsh))

    _MULT_CACHE[cache_key] = mult
    return mult, kargs


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
