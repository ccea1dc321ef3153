"""JAX device backend: batched blind rotation + fused key switching on TPU
(or any JAX device), bit-exact against the host oracle.

The setup step is the analogue of the reference's `GPUSetup`
(bootstrapping.cu:725-1083): the canonical coefficient-domain bootstrapping
key is transformed to the evaluation domain, paired with Shoup preconditioned
multipliers, and the switching key is flattened to one gatherable table —
exactly where the reference converts its key to the cuFFTDx layout and
flattens `KSkey[N][baseKS][digitCount]`.

Arithmetic paths, selected by modulus size and method:
- single-limb uint32 (Q, qKS < 2^31): the small classic parameter sets and
  the accelerated logQ=11 gate configuration (CGGI/GINX);
- two-limb uint32 pairs for big-Q classic sets (Q in [2^31, 2^54):
  STD192/STD128Q/STD192Q...), with the u32 key switch (qKS < 2^31, any
  baseKS) — covering the same set breadth as the reference's GPU template
  dispatch (bootstrapping.cu:772-871);
- RNS two-prime lanes (composite Q = q1*q2) or two-limb pairs for the
  accelerated 54-bit sets with qKS = 2^35;
- DM/AP with small moduli: one-hot MXU key selection (ops/blindrotate_dm) —
  a device path the reference never shipped (its DM GPU code is commented
  out, rgsw-acc-dm.cpp:361-464).
Remaining configurations (large-Q DM, non-power-of-two qKS >= 2^31) run on
the host oracle.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .. import lwe
from ..params import BinFHEParams, Method
from ..ref import ntt as ref_ntt
from . import modmath32 as mm
from . import modmath64 as mm64
from .blindrotate32 import build_blind_rotate, transpose_extract
from .blindrotate64 import build_blind_rotate64, transpose_extract64
from .keyswitch32 import build_mkm_switch, build_mkm_switch_from64, pack_ksk
from .keyswitch64 import build_mkm_switch64, pack_ksk64
from .blindrotate_dm import build_dm_rotate, dm_digits, pack_dm_table
from .pallas_rotate import build_pallas_rotate, pack_bsk
from .pallas_rotate64 import build_pallas_rotate64, pack_bsk64
from .pallas_rotate_rns import build_pallas_rotate_rns, pack_bsk_rns
import functools
import os
import warnings

from ..utils.profiling import profile_log, tic

_PROFILE = os.environ.get("TFHE_TPU_PROFILE", "") not in ("", "0")


def _prof_mark(label: str, t0: float, *arrays) -> float:
    """Phase timer for the device pipelines, active only under
    TFHE_TPU_PROFILE (the sync it forces would otherwise serialize the
    async dispatch chain). Pulls one element per array because the remote
    worker's block_until_ready returns before execution completes."""
    if not _PROFILE:
        return t0
    for x in arrays:
        if x is not None and hasattr(x, "ravel"):
            np.asarray(jax.device_get(x.ravel()[0]))
    profile_log(label, t0)
    return tic()

# buffer donation (single-use accumulators between the rotation and tail
# jits) is a TPU HBM optimization; the CPU backend cannot honor it and warns
warnings.filterwarnings(
    "ignore", message="Some donated buffers were not usable")


def _mkm64_builder(N: int, Q: int, q_ks: int, base_ks: int, digit_count: int,
                   n: int, fmod: int):
    """MKM switch taking uint32-pair inputs mod Q >= 2^31: the u32 key switch
    when qKS < 2^31 (big-Q classic sets like STD192/STD128Q), else the
    two-limb power-of-two-qKS kernel (accelerated sets, qKS = 2^35)."""
    if q_ks < (1 << 31):
        return build_mkm_switch_from64(N, Q, q_ks, base_ks, digit_count, n, fmod)
    return build_mkm_switch64(N, Q, q_ks, base_ks, digit_count, n, fmod)


@functools.lru_cache(maxsize=None)
def build_rotate_extract32(N: int, Q: int, base_g: int, digits_g_eff: int,
                           throw: int, n: int, use_pallas: bool):
    """Rotation + transpose/extract for the u32 paths (small classic sets and
    the mixed logQ=11 configs), its own jit: the expensive kernel compiles
    once per shape while the fmod-specific tails recompile cheaply."""
    blind = (build_pallas_rotate if use_pallas else build_blind_rotate)(
        N, Q, base_g, digits_g_eff, throw, n)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def rot(acc, a_idx, *bsk_args):
        acc = blind(acc, a_idx, *bsk_args)
        return transpose_extract(acc, Q)

    return rot


@functools.lru_cache(maxsize=None)
def build_rotate_extract64(N: int, Q: int, base_g: int, digits_g_eff: int,
                           throw: int, n: int, use_pallas: bool):
    """Two-limb rotation + transpose/extract as its own jit."""
    blind = (build_pallas_rotate64 if use_pallas else build_blind_rotate64)(
        N, Q, base_g, digits_g_eff, throw, n)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def rot(acc_lo, acc_hi, a_idx, *bsk_args):
        acc = blind(acc_lo, acc_hi, a_idx, *bsk_args)
        a_t, b = transpose_extract64(acc, Q)
        return a_t[0], a_t[1], b[0], b[1]

    return rot


@functools.lru_cache(maxsize=None)
def build_tail32(N: int, Q: int, q_ks: int, base_ks: int, digit_count: int,
                 n: int, fmod: int, add_q8: bool):
    """Gate-constant offset + fused mod/key/mod switch, u32 end to end."""
    mkm = build_mkm_switch(N, Q, q_ks, base_ks, digit_count, n, fmod)
    q8 = np.uint32(Q // 8 + 1)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def tail(a_t, b, ksk_bf):
        if add_q8:
            b = mm.addmod(b, q8, Q)
        return mkm(a_t, b, ksk_bf)

    return tail


@functools.lru_cache(maxsize=None)
def build_tail64_from32(N: int, Q: int, q_ks: int, base_ks: int,
                        digit_count: int, n: int, fmod: int, add_q8: bool):
    """Mixed-path tail: u32 rotation outputs into the two-limb key switch
    (qKS = 2^35 scale-up, the accelerated logQ=11 configs)."""
    mkm = build_mkm_switch64(N, Q, q_ks, base_ks, digit_count, n, fmod)
    q8 = np.uint32(Q // 8 + 1)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def tail(a_t, b, ksk_bf):
        if add_q8:
            b = mm.addmod(b, q8, Q)
        return mkm(a_t, jnp.zeros_like(a_t), b, jnp.zeros_like(b), ksk_bf)

    return tail


@functools.lru_cache(maxsize=None)
def build_tail64(N: int, Q: int, q_ks: int, base_ks: int, digit_count: int,
                 n: int, fmod: int, add_q8: bool):
    """Two-limb tail (RNS and 64-bit rotations)."""
    mkm = _mkm64_builder(N, Q, q_ks, base_ks, digit_count, n, fmod)
    q8v = Q // 8 + 1
    q8p = (np.uint32(q8v & 0xFFFFFFFF), np.uint32(q8v >> 32))

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def tail(alo, ahi, blo, bhi, ksk_bf):
        if add_q8:
            blo, bhi = mm64.addmod64((blo, bhi), q8p, Q)
        return mkm(alo, ahi, blo, bhi, ksk_bf)

    return tail


@functools.lru_cache(maxsize=None)
def build_gate_pipeline(N: int, Q: int, base_g: int, digits_g_eff: int, throw: int,
                        n: int, q_ks: int, base_ks: int, digit_count: int,
                        fmod: int, add_q8: bool):
    """Fused device graph: blind rotation -> transpose/extract -> fused
    modswitch/keyswitch/modswitch. The accumulator batch never returns to the
    host mid-pipeline (the reference pays a D2H+H2D between EvalAcc_CUDA and
    MKMSwitch_CUDA, binfhe-base-scheme.cpp:659-675)."""
    blind = build_blind_rotate(N, Q, base_g, digits_g_eff, throw, n)
    mkm = build_mkm_switch(N, Q, q_ks, base_ks, digit_count, n, fmod)
    q8 = np.uint32(Q // 8 + 1)

    @jax.jit
    def pipe(acc, a_idx, bsk, bsk_sh, ksk_bf):
        acc = blind(acc, a_idx, bsk, bsk_sh)
        a_t, b = transpose_extract(acc, Q)
        if add_q8:
            b = mm.addmod(b, q8, Q)
        return mkm(a_t, b, ksk_bf)

    return pipe


@functools.lru_cache(maxsize=None)
def build_full_gate_pipeline(N: int, Q: int, base_g: int, digits_g_eff: int,
                             throw: int, n: int, q_ks: int, base_ks: int,
                             digit_count: int, fmod: int, q: int, q1: int,
                             mixed: bool = False):
    """Whole gate bootstrap on device INCLUDING test-polynomial construction
    (the batched BootstrapGateCore, binfhe-base-scheme.cpp:1087-1145, done
    in-graph): inputs are just the prepped LWE batch (a [B,n], b [B]) — the
    reference uploads a full accumulator per ciphertext instead. One jit end
    to end — the low-latency path (gates are single-fmod, so the split
    compile structure buys nothing and the extra dispatch costs ~0.1 ms/call
    at small batches). `mixed` selects the two-limb qKS=2^35 key switch of
    the accelerated logQ=11 configs."""
    blind = build_pallas_rotate(N, Q, base_g, digits_g_eff, throw, n)
    if mixed:
        mkm64 = build_mkm_switch64(N, Q, q_ks, base_ks, digit_count, n, fmod)

        def mkm(a_t, b, ksk_bf):
            return mkm64(a_t, jnp.zeros_like(a_t), b, jnp.zeros_like(b),
                         ksk_bf)
    else:
        mkm = build_mkm_switch(N, Q, q_ks, base_ks, digit_count, n, fmod)
    q8 = np.uint32(Q // 8 + 1)
    q8neg = np.uint32(Q - (Q // 8 + 1))
    q_half = q >> 1
    q2 = (q1 + q_half) % q
    factor = (2 * N) // q
    uq = np.uint32(q)

    @jax.jit
    def pipe(a16, b16, bsk_pack, ksk_bf):
        # inputs ride the host<->device link as uint16 (q <= 2^16 for every
        # gate configuration) — half the transfer bytes of u32
        a = a16.astype(jnp.uint32)
        b = b16.astype(jnp.uint32)
        return _gate_core(a, b, bsk_pack, ksk_bf)

    def _make_pipe_pair(neg2: bool):
        # two raw ciphertexts; the gate's LWE combination runs in-graph
        # (binfhe-base-scheme.cpp:58-113 does this on the CPU per ct):
        # ct1 + ct2 for the window gates, 2*(ct1 - ct2) for XOR_FAST/
        # XNOR_FAST (selected by the static `neg2`). The host-side
        # u64 (a1+a2) % q over the whole batch costs more than 10% of an
        # iteration on a single-core host.
        @jax.jit
        def pipe_pair(a1_16, b1_16, a2_16, b2_16, bsk_pack, ksk_bf):
            a1 = a1_16.astype(jnp.uint32)
            a2 = a2_16.astype(jnp.uint32)
            b1 = b1_16.astype(jnp.uint32)
            b2 = b2_16.astype(jnp.uint32)
            if neg2:
                a = mm.mod_u32(mm.mod_u32(a1 + np.uint32(q) - a2, q) * 2, q)
                b = mm.mod_u32(mm.mod_u32(b1 + np.uint32(q) - b2, q) * 2, q)
            else:
                a = mm.mod_u32(a1 + a2, q)
                b = mm.mod_u32(b1 + b2, q)
            return _gate_core(a, b, bsk_pack, ksk_bf)

        return pipe_pair

    pipe_pairs = {False: _make_pipe_pair(False), True: _make_pipe_pair(True)}

    def _gate_core(a, b, bsk_pack, ksk_bf):
        B = a.shape[0]
        # (q - a) * 2N/q mod 2N (rgsw-acc-cggi.cpp:151-154)
        t = jnp.where(a == 0, a, uq - a)
        a_idx = (t * np.uint32(factor)).astype(jnp.int32)
        # test polynomial m[j*factor] = +-(Q/8+1) by window membership
        j = jax.lax.broadcasted_iota(jnp.uint32, (1, q_half), 1)
        temp = (b[:, None] + uq - j) % uq
        if q1 < q2:
            in_win = (temp >= np.uint32(q1)) & (temp < np.uint32(q2))
        else:
            in_win = ~((temp >= np.uint32(q2)) & (temp < np.uint32(q1)))
        vals = jnp.where(in_win, q8neg, q8)                       # [B, q/2]
        if factor > 1:
            m = jnp.concatenate(
                [vals[..., None],
                 jnp.zeros((B, q_half, factor - 1), jnp.uint32)], axis=-1)
            m = m.reshape(B, N)
        else:
            m = vals
        acc = jnp.stack([jnp.zeros((B, N), jnp.uint32), m], axis=1)
        acc = blind(acc, a_idx, bsk_pack)
        a_t, bb = transpose_extract(acc, Q)
        bb = mm.addmod(bb, q8, Q)
        a_out, b_out = mkm(a_t, bb, ksk_bf)
        # outputs are mod fmod = q <= 2^16: return u16 (halves D2H bytes)
        return a_out.astype(jnp.uint16), b_out.astype(jnp.uint16)

    return pipe, pipe_pairs


def _crt_combine_pair(o1, o2, q1: int, q2: int):
    """Garner CRT on device: residue lanes (o1 mod q1, o2 mod q2) -> uint32
    pair (lo, hi) of the value mod Q = q1*q2. Exact for q2 < q1 < 2^28."""
    c12 = pow(q2, -1, q1)
    c12_sh = int((c12 << 32) // q1)
    uq2 = np.uint32(q2)
    diff = mm.submod(o1, o2, q1)            # o2 < q2 < q1
    t = mm.mulmod_shoup(diff, np.uint32(c12), np.uint32(c12_sh), q1)
    lo = t * uq2 + o2                       # wrapping uint32
    carry = (lo < o2).astype(jnp.uint32)
    hi = mm.mulhi32(t, uq2) + carry
    return lo, hi


@functools.lru_cache(maxsize=None)
def build_func_acc_rns(N: int, q1: int, q2: int, ct_mod: int,
                       per_ct: bool = False, u32_in: bool = False):
    """Device-side functional test-polynomial builder for the RNS lanes
    (the batched BootstrapFuncCore, binfhe-base-scheme.cpp:1147-1192, done
    in-graph): m[j*(2N/ctMod)] = g[(b - j) mod ctMod] gathered from the
    tiny per-lane value tables — inputs ride the tunnel as u16 instead of
    full [B, 2, N] accumulators. With `per_ct`, g is a [B, ctMod] table and
    every ciphertext gathers from its own row (the multi-LUT EvalFunc
    overload, binfhe-base-scheme.cpp:791-924). With `u32_in`, inputs are
    device-resident u32 arrays whose values may exceed ct_mod (a raw
    modulus retag from a chained stage) and are reduced in-graph."""
    half = ct_mod >> 1
    factor = (2 * N) // ct_mod
    um = np.uint32(ct_mod)

    @jax.jit
    def build(b_in, a_in, g1, g2):
        b = _reduce_ct_mod(b_in, ct_mod) if u32_in else b_in.astype(jnp.uint32)
        a = _reduce_ct_mod(a_in, ct_mod) if u32_in else a_in.astype(jnp.uint32)
        B = b.shape[0]
        t = jnp.where(a == 0, a, um - a)
        a_idx = (t * np.uint32(factor)).astype(jnp.int32)
        j = jax.lax.broadcasted_iota(jnp.uint32, (1, half), 1)
        temp = (b[:, None] + um - j) % um                       # [B, half]
        accs = []
        for g in (g1, g2):
            if per_ct:
                vals = jnp.take_along_axis(g, temp.astype(jnp.int32), axis=1)
            else:
                vals = g[temp]                                  # [B, half]
            if factor > 1:
                m = jnp.concatenate(
                    [vals[..., None],
                     jnp.zeros((B, half, factor - 1), jnp.uint32)], axis=-1)
                m = m.reshape(B, N)
            else:
                m = vals
            accs.append(jnp.stack([jnp.zeros((B, N), jnp.uint32), m], axis=1))
        return accs[0], accs[1], a_idx

    return build


def _reduce_ct_mod(x, ct_mod: int):
    """u32 values (< 2^24 in every chain stage) reduced mod ct_mod in-graph;
    a mask when ct_mod is a power of two (it always is in the EvalSign/
    EvalDecomp modulus schedule: mod, q and 2*beta are all powers of two)."""
    x = x.astype(jnp.uint32)
    if ct_mod & (ct_mod - 1) == 0:
        return x & np.uint32(ct_mod - 1)
    return x % np.uint32(ct_mod)


@functools.lru_cache(maxsize=None)
def build_func_acc32(N: int, Q: int, ct_mod: int, per_ct: bool = False,
                     u32_in: bool = False):
    """Single-modulus device test-poly builder (the u32 and mixed paths —
    e.g. the accelerated logQ=11 EvalFloor configuration, Q a 27-bit prime):
    same in-graph gather as build_func_acc_rns but one lane mod Q."""
    half = ct_mod >> 1
    factor = (2 * N) // ct_mod
    um = np.uint32(ct_mod)

    @jax.jit
    def build(b_in, a_in, g):
        b = _reduce_ct_mod(b_in, ct_mod) if u32_in else b_in.astype(jnp.uint32)
        a = _reduce_ct_mod(a_in, ct_mod) if u32_in else a_in.astype(jnp.uint32)
        B = b.shape[0]
        t = jnp.where(a == 0, a, um - a)
        a_idx = (t * np.uint32(factor)).astype(jnp.int32)
        j = jax.lax.broadcasted_iota(jnp.uint32, (1, half), 1)
        temp = (b[:, None] + um - j) % um                       # [B, half]
        if per_ct:
            vals = jnp.take_along_axis(g, temp.astype(jnp.int32), axis=1)
        else:
            vals = g[temp]                                      # [B, half]
        if factor > 1:
            m = jnp.concatenate(
                [vals[..., None],
                 jnp.zeros((B, half, factor - 1), jnp.uint32)], axis=-1)
            m = m.reshape(B, N)
        else:
            m = vals
        acc = jnp.stack([jnp.zeros((B, N), jnp.uint32), m], axis=1)
        return acc, a_idx

    return build


# ---------------------------------------------------------------------------
# device-resident LWE chain glue (EvalFloor/EvalSign/EvalDecomp inter-
# bootstrap arithmetic in-graph — the host-side analogue in scheme.py costs
# ~30% of EvalSign wall time at batch 4096 through host u64 loops plus
# per-bootstrap tunnel round trips)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _build_addc(mod: int, c: int):
    """b -> (b + c) mod `mod` (lwe.add_const_eq, b-component only)."""
    @jax.jit
    def f(b):
        return (b + np.uint32(c % mod)) % np.uint32(mod)
    return f


@functools.lru_cache(maxsize=None)
def _build_subc(mod: int, c: int):
    @jax.jit
    def f(b):
        return (b + np.uint32(mod - (c % mod))) % np.uint32(mod)
    return f


@functools.lru_cache(maxsize=None)
def _build_sub(mod: int):
    """(ct1 - ct2) mod `mod`, elementwise on (a [B,n], b [B]) u32 pairs."""
    um = np.uint32(mod)

    @jax.jit
    def f(a1, b1, a2, b2):
        return (a1 + um - a2) % um, (b1 + um - b2) % um
    return f


@functools.lru_cache(maxsize=None)
def _build_mod_switch_pow2(old_mod: int, new_mod: int):
    """RoundqQ for power-of-two moduli: floor(0.5 + v*new/old) mod new
    == ((v + 2^(shift-1)) >> shift) & (new-1) with shift = log2(old/new) —
    bit-identical to modmath.round_q_Q (lwe-pke.cpp:41-46)."""
    assert old_mod & (old_mod - 1) == 0 and new_mod & (new_mod - 1) == 0
    assert new_mod < old_mod
    shift = old_mod.bit_length() - new_mod.bit_length()
    half = np.uint32(1 << (shift - 1))
    mask = np.uint32(new_mod - 1)

    @jax.jit
    def f(a, b):
        return ((a + half) >> np.uint32(shift)) & mask, \
               ((b + half) >> np.uint32(shift)) & mask
    return f


@functools.lru_cache(maxsize=None)
def build_rotate_extract_rns(N: int, q1: int, q2: int, base_g: int,
                             digits_g_eff: int, throw: int, n: int,
                             tiles: tuple[int, int] | None = None):
    """Rotation stage of the RNS pipeline (the TPU-native form of the
    accelerated 54-bit sets, params.from_gpu_style): single-limb two-lane
    Pallas rotation, in-graph Garner CRT recombination, transpose/extract.

    Kept as its own jit — EvalSign/EvalDecomp/EvalFunc hit many output
    moduli, and only the (cheap) MKM switch depends on fmod; splitting means
    the expensive Mosaic kernel compiles once per shape instead of once per
    fmod. The accumulator stays on device between the two jits."""
    from .pallas_rotate_rns import default_tiles
    BT, bti = tiles if tiles is not None else default_tiles()
    blind = build_pallas_rotate_rns(N, q1, q2, base_g, digits_g_eff, throw, n,
                                    BT, bti)
    Q = q1 * q2

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def rot(acc1, acc2, a_idx, bsk_rns):
        o1, o2 = blind(acc1, acc2, a_idx, bsk_rns)
        lo, hi = _crt_combine_pair(o1, o2, q1, q2)
        a_t, b = transpose_extract64((lo, hi), Q)
        return a_t[0], a_t[1], b[0], b[1]

    return rot


class DeviceLWE:
    """Device-resident LWE ciphertext batch for the fused functional chains:
    u32 component arrays padded to the backend's batch bucket, plus the true
    batch size. Values are residues mod `modulus` (or a raw retag of a larger
    modulus — the EvalDecomp digit convention, lwe.py set_modulus)."""

    __slots__ = ("a", "b", "modulus", "B")

    def __init__(self, a, b, modulus: int, B: int):
        self.a, self.b, self.modulus, self.B = a, b, modulus, B


class JaxBackend:
    """Implements the `scheme.Backend` protocol on JAX devices.

    With num_devices > 1 (or an explicit mesh), ciphertext batches are sharded
    over a ('batch',) mesh and keys are replicated per device — the TPU
    equivalent of the reference's multi-GPU round-robin with per-GPU key
    copies (bootstrapping.cu:1616-1638)."""

    def __init__(self, num_devices: int = 0, mesh=None):
        self.num_devices = num_devices
        self.mesh = mesh
        if mesh is None and num_devices > 1:
            from ..parallel.mesh import make_mesh
            self.mesh = make_mesh(num_devices)
        self._device_keys: dict[int, dict] = {}

    def _shard_pallas(self, fn, n_batch_args: int, n_out: int = 1):
        """Wrap a pallas-bearing pipeline for the ('batch',) mesh: XLA cannot
        partition a custom call, so shard_map runs it per shard with the
        first `n_batch_args` inputs batch-sharded and keys replicated — the
        exact analogue of the reference's per-GPU replicated-key round-robin
        (bootstrapping.cu:1616-1638)."""
        if self.mesh is None:
            return fn
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def spec(i):
            return P("batch") if i < n_batch_args else P()

        def wrapped(*args):
            in_specs = tuple(spec(i) for i in range(len(args)))
            out_specs = (P("batch"),) * n_out if n_out > 1 else P("batch")
            return shard_map(fn, mesh=self.mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)(*args)

        return wrapped

    def _shard_batch(self, x):
        if self.mesh is None:
            return jnp.asarray(x)
        from ..parallel.mesh import batch_sharding
        sh = batch_sharding(self.mesh, np.ndim(x))
        if jax.process_count() > 1:
            # multi-host: every process holds the same full host array (the
            # host pipeline is deterministic and replicated); build the global
            # array by slicing each device's shard out of it
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])
        return jax.device_put(x, sh)

    def _replicate(self, x):
        if self.mesh is None:
            return jnp.asarray(x)
        from ..parallel.mesh import replicated
        sh = replicated(self.mesh)
        if jax.process_count() > 1:
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])
        return jax.device_put(x, sh)

    @staticmethod
    def _to_host(x) -> np.ndarray:
        """Fetch a (possibly cross-process sharded) device array to every
        host: allgather over DCN when the mesh spans processes."""
        if jax.process_count() > 1 and not getattr(x, "is_fully_addressable", True):
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(jax.device_get(x))

    def _packed_ksk(self, ksk, n: int, q_ks: int, pack_fn):
        """Pack + upload the switching key, memoized ON the key object:
        contexts that share one LWESwitchingKey (multi-baseG maps, the
        accelerated logQ configs — see scheme.key_gen) share a single
        device-resident packed table instead of re-packing ~600 MB each
        and holding duplicate copies in HBM. SeededSwitchingKeys are
        regenerated and packed entirely in-graph (the A block never
        touches the host)."""
        tag = (pack_fn.__name__, q_ks, id(self.mesh))
        cache = getattr(ksk, "_device_pack", None)
        if cache is None:
            cache = {}
            object.__setattr__(ksk, "_device_pack", cache)
        if tag not in cache:
            if (isinstance(ksk, lwe.SeededSwitchingKey)
                    and pack_fn is pack_ksk64 and self.mesh is None):
                from .keyswitch64 import seeded_ksk_pack
                cache[tag] = seeded_ksk_pack(ksk)
            else:
                cache[tag] = self._replicate(pack_fn(
                    np.asarray(ksk.A).reshape(-1, n),
                    np.asarray(ksk.B, dtype=np.uint64).reshape(-1), q_ks))
        return cache[tag]

    # -- setup -------------------------------------------------------------

    @staticmethod
    def _is_small(params: BinFHEParams) -> bool:
        return params.lwe.Q < (1 << 31) and params.lwe.q_ks < (1 << 31)

    def _use_pallas(self, params: BinFHEParams) -> bool:
        """Use the fused Pallas kernel when on a real TPU (single device, or a
        ('batch',) mesh via shard_map with replicated keys) and the
        single-limb modulus is small enough for the lazy external product."""
        env = os.environ.get("TFHE_TPU_PALLAS", "")
        if env == "0":
            return False
        if params.rgsw.method != Method.GINX or not self._is_small(params):
            return False
        rg = params.rgsw
        d2 = 2 * (rg.digits_g - rg.num_digits_to_throw)
        fits = (rg.Q < (1 << 28) and (2 * rg.Q - 1) * d2 < (1 << 32)
                and rg.N % 128 == 0)
        if env == "1":
            return fits
        return fits and jax.default_backend() == "tpu"

    @staticmethod
    def _is_mixed(params: BinFHEParams) -> bool:
        """Q fits the single-limb rotation but qKS needs two limbs (the
        accelerated logQ=11 gate/floor configuration)."""
        p = params.lwe
        return (params.rgsw.method == Method.GINX and p.Q < (1 << 28)
                and (1 << 32) < p.q_ks < (1 << 40)
                and p.q_ks & (p.q_ks - 1) == 0
                and p.base_ks & (p.base_ks - 1) == 0)

    def _use_rns(self, params: BinFHEParams) -> bool:
        """RNS two-lane Pallas rotation for composite Q = q1*q2 (the
        TPU-native accelerated 54-bit sets): ~4x the two-limb path because
        every multiply is single-limb u32."""
        env = os.environ.get("TFHE_TPU_PALLAS", "")
        if env == "0" or self._is_small(params):
            return False
        rg = params.rgsw
        pr = rg.rns_primes
        if rg.method != Method.GINX or pr is None:
            return False
        q1, q2 = pr
        d2 = 2 * (rg.digits_g - rg.num_digits_to_throw)
        fits = (q2 < q1 < (1 << 28) and (2 * q1 - 1) * d2 < (1 << 32)
                and rg.base_g <= (1 << 27) and (rg.base_g >> 1) < q2
                and rg.N % 128 == 0)
        if env == "1":
            return fits
        return fits and jax.default_backend() == "tpu"

    def _use_pallas64(self, params: BinFHEParams) -> bool:
        env = os.environ.get("TFHE_TPU_PALLAS", "")
        if env == "0" or self._is_small(params):
            return False
        rg = params.rgsw
        d2 = 2 * (rg.digits_g - rg.num_digits_to_throw)
        fits = (rg.Q < (1 << 62) and 2 * rg.Q * d2 < (1 << 62)
                and rg.N % 128 == 0)
        if env == "1":
            return fits
        return fits and jax.default_backend() == "tpu"

    def supports(self, params: BinFHEParams) -> bool:
        if params.rgsw.method == Method.AP:
            # DM/AP device path (the reference's GPU refuses DM): small
            # moduli, and the one-hot selection table must fit in HBM
            if not self._is_small(params):
                return False
            rg = params.rgsw
            from .blindrotate_dm import dm_limbs
            table_bytes = (params.lwe.n * len(rg.digits_r) * rg.base_r
                           * dm_limbs(rg.Q) * 2 * rg.digits_g * 2 * rg.N * 2)
            return table_bytes < 6e9
        if params.rgsw.method != Method.GINX:
            return False
        if self._is_small(params):
            return True
        p = params.lwe
        if p.Q >= (1 << 54):
            return False
        # big-Q classic sets (STD192/STD128Q/STD192Q...): two-limb rotation
        # with the u32 key switch (any baseKS)
        if p.q_ks < (1 << 31):
            return True
        # accelerated sets: two-limb/RNS rotation with power-of-two qKS=2^35
        return ((1 << 32) < p.q_ks < (1 << 40)
                and p.q_ks & (p.q_ks - 1) == 0 and p.base_ks & (p.base_ks - 1) == 0)

    def setup(self, params: BinFHEParams, key) -> None:
        if not self.supports(params):
            raise NotImplementedError(
                "JaxBackend requires GINX with Q < 2^54 and either qKS < 2^31 "
                "(classic sets) or power-of-two qKS in (2^32, 2^40) "
                "(accelerated sets), or AP with small moduli; other "
                "configurations run on the host oracle backend")
        self._get_device_key(params, key)

    def _get_device_key(self, params: BinFHEParams, key) -> dict:
        cache_id = id(key.bsk_coeff)
        if cache_id in self._device_keys:
            return self._device_keys[cache_id]
        p = params.lwe
        Q = p.Q

        @functools.lru_cache(maxsize=1)
        def bsk_hat_of():
            # evaluation-domain BSkey (host, vectorized NTT); skipped entirely
            # on the RNS path, which transforms per-prime lanes instead
            return ref_ntt.forward(np.asarray(key.bsk_coeff, dtype=np.uint64), Q)

        if params.rgsw.method == Method.AP:
            dk = {
                "small": True,
                "dm_table": self._replicate(pack_dm_table(bsk_hat_of(), Q)),
                "ksk_bf": self._packed_ksk(key.ksk, p.n, p.q_ks, pack_ksk),
            }
        elif self._is_mixed(params):
            rg = params.rgsw
            d2 = 2 * (rg.digits_g - rg.num_digits_to_throw)
            pallas_ok = ((2 * rg.Q - 1) * d2 < (1 << 32) and rg.N % 128 == 0
                         and os.environ.get("TFHE_TPU_PALLAS", "") != "0"
                         and (jax.default_backend() == "tpu"
                              or os.environ.get("TFHE_TPU_PALLAS", "") == "1"))
            dk = {
                "small": False,
                "mixed": True,
                "mixed_pallas": pallas_ok,
                "bsk_pack": self._replicate(pack_bsk(bsk_hat_of(), Q)) if pallas_ok else None,
                "bsk": None if pallas_ok else self._replicate(bsk_hat_of().astype(np.uint32)),
                "bsk_sh": None if pallas_ok else self._replicate(mm.shoup(bsk_hat_of(), Q)),
                "ksk_bf": self._packed_ksk(key.ksk, p.n, p.q_ks, pack_ksk64),
            }
        elif self._is_small(params):
            use_pallas = self._use_pallas(params)
            dk = {
                "small": True,
                "bsk": None if use_pallas else self._replicate(bsk_hat_of().astype(np.uint32)),
                "bsk_sh": None if use_pallas else self._replicate(mm.shoup(bsk_hat_of(), Q)),
                "bsk_pack": self._replicate(pack_bsk(bsk_hat_of(), Q)) if use_pallas else None,
                "ksk_bf": self._packed_ksk(key.ksk, p.n, p.q_ks, pack_ksk),
            }
        else:
            use_pallas = self._use_pallas64(params)
            pack = pack_ksk if p.q_ks < (1 << 31) else pack_ksk64
            dk = {
                "small": False,
                "ksk_bf": self._packed_ksk(key.ksk, p.n, p.q_ks, pack),
            }
            if self._use_rns(params):
                q1, q2 = params.rgsw.rns_primes
                dk["bsk_rns"] = self._replicate(pack_bsk_rns(
                    np.asarray(key.bsk_coeff, dtype=np.uint64), q1, q2))
            elif use_pallas:
                dk["bsk_sh_pack"] = self._replicate(pack_bsk64(bsk_hat_of(), Q))
            else:
                b_lo, b_hi = mm64.pack_host(bsk_hat_of())
                s_lo, s_hi = mm64.shoup64(bsk_hat_of(), Q)
                dk.update({
                    "bsk_lo": self._replicate(b_lo), "bsk_hi": self._replicate(b_hi),
                    "bsk_sh_lo": self._replicate(s_lo), "bsk_sh_hi": self._replicate(s_hi),
                })
        self._device_keys[cache_id] = dk
        return dk

    # -- protocol ----------------------------------------------------------

    def _bucket(self, B: int) -> int:
        """Pad batch sizes to powers of two so jit compiles are reused (the
        blind-rotation graph costs minutes to compile); also keeps the batch
        divisible by any power-of-two mesh."""
        b = 8
        if self.mesh is not None:
            b = 8 * self.mesh.size   # keep every shard tile-aligned (>= 8)
        while b < B:
            b *= 2
        return b

    def eval_acc(self, params: BinFHEParams, key, acc_init: np.ndarray,
                 a_batch: np.ndarray, a_modulus: int) -> np.ndarray:
        dk = self._get_device_key(params, key)
        rg = params.rgsw
        N, Q = rg.N, rg.Q
        B = acc_init.shape[0]
        Bp = self._bucket(B)
        acc = np.zeros((Bp, 2, N), dtype=np.uint64)
        acc[:B] = np.asarray(acc_init, dtype=np.uint64)
        a_idx = np.zeros((Bp, params.lwe.n), dtype=np.int32)
        a_idx[:B] = self._scaled_indices(a_batch, a_modulus, N)
        if dk.get("dm_table") is not None:
            digs = np.zeros((Bp, params.lwe.n * len(rg.digits_r)), dtype=np.int32)
            digs[:B] = dm_digits(np.asarray(a_batch), a_modulus, rg.base_r,
                                 len(rg.digits_r))
            fn = build_dm_rotate(N, Q, rg.base_g, rg.digits_g, rg.base_r,
                                 params.lwe.n * len(rg.digits_r))
            out = fn(self._shard_batch(acc.astype(np.uint32)),
                     self._shard_batch(digs), dk["dm_table"])
            return self._to_host(out)[:B].astype(np.uint64)
        if dk["small"]:
            digits_eff = rg.digits_g - rg.num_digits_to_throw
            if dk.get("bsk_pack") is not None:
                fn = self._shard_pallas(
                    build_pallas_rotate(N, Q, rg.base_g, digits_eff,
                                        rg.num_digits_to_throw, params.lwe.n),
                    n_batch_args=2)
                out = fn(self._shard_batch(acc.astype(np.uint32)),
                         self._shard_batch(a_idx), dk["bsk_pack"])
            else:
                fn = build_blind_rotate(N, Q, rg.base_g, digits_eff,
                                        rg.num_digits_to_throw, params.lwe.n)
                out = fn(self._shard_batch(acc.astype(np.uint32)),
                         self._shard_batch(a_idx), dk["bsk"], dk["bsk_sh"])
            return self._to_host(out)[:B].astype(np.uint64)
        digits_eff = rg.digits_g - rg.num_digits_to_throw
        if dk.get("mixed"):
            if dk["mixed_pallas"]:
                fn = self._shard_pallas(
                    build_pallas_rotate(N, Q, rg.base_g, digits_eff,
                                        rg.num_digits_to_throw, params.lwe.n),
                    n_batch_args=2)
                out = fn(self._shard_batch(acc.astype(np.uint32)),
                         self._shard_batch(a_idx), dk["bsk_pack"])
            else:
                fn = build_blind_rotate(N, Q, rg.base_g, digits_eff,
                                        rg.num_digits_to_throw, params.lwe.n)
                out = fn(self._shard_batch(acc.astype(np.uint32)),
                         self._shard_batch(a_idx), dk["bsk"], dk["bsk_sh"])
            return self._to_host(out)[:B].astype(np.uint64)
        if dk.get("bsk_rns") is not None:
            from .pallas_rotate_rns import default_tiles
            q1, q2 = rg.rns_primes
            fn = self._shard_pallas(
                build_pallas_rotate_rns(N, q1, q2, rg.base_g, digits_eff,
                                        rg.num_digits_to_throw, params.lwe.n,
                                        *default_tiles()),
                n_batch_args=3, n_out=2)
            o1, o2 = fn(self._shard_batch((acc % np.uint64(q1)).astype(np.uint32)),
                        self._shard_batch((acc % np.uint64(q2)).astype(np.uint32)),
                        self._shard_batch(a_idx), dk["bsk_rns"])
            r1 = self._to_host(o1).astype(np.uint64)
            r2 = self._to_host(o2).astype(np.uint64)
            t = (r1 + np.uint64(q1) - r2 % np.uint64(q1)) % np.uint64(q1)
            t = t * np.uint64(pow(q2, -1, q1)) % np.uint64(q1)
            return (r2 + np.uint64(q2) * t)[:B]
        lo, hi = mm64.pack_host(acc)
        if dk.get("bsk_sh_pack") is not None:
            fn = self._shard_pallas(
                build_pallas_rotate64(N, Q, rg.base_g, digits_eff,
                                      rg.num_digits_to_throw, params.lwe.n),
                n_batch_args=3, n_out=2)
            out_lo, out_hi = fn(self._shard_batch(lo), self._shard_batch(hi),
                                self._shard_batch(a_idx), dk["bsk_sh_pack"])
        else:
            fn = build_blind_rotate64(N, Q, rg.base_g, digits_eff,
                                      rg.num_digits_to_throw, params.lwe.n)
            out_lo, out_hi = fn(self._shard_batch(lo), self._shard_batch(hi),
                                self._shard_batch(a_idx),
                                dk["bsk_lo"], dk["bsk_hi"], dk["bsk_sh_lo"], dk["bsk_sh_hi"])
        return mm64.unpack_host(self._to_host(out_lo),
                                self._to_host(out_hi))[:B]

    def mkm_switch(self, params: BinFHEParams, key, a_ext: np.ndarray,
                   b_ext: np.ndarray, fmod: int) -> lwe.LWECiphertext:
        dk = self._get_device_key(params, key)
        p = params.lwe
        B = a_ext.shape[0]
        Bp = self._bucket(B)
        a_pad = np.zeros((Bp, p.N), dtype=np.uint64)
        a_pad[:B] = np.asarray(a_ext, dtype=np.uint64)
        b_pad = np.zeros((Bp,), dtype=np.uint64)
        b_pad[:B] = np.asarray(b_ext, dtype=np.uint64)
        if dk["small"]:
            fn = build_mkm_switch(p.N, p.Q, p.q_ks, p.base_ks, p.digit_count_ks,
                                  p.n, int(fmod))
            a_out, b_out = fn(self._shard_batch(a_pad.astype(np.uint32)),
                              self._shard_batch(b_pad.astype(np.uint32)),
                              dk["ksk_bf"])
        else:
            fn = _mkm64_builder(p.N, p.Q, p.q_ks, p.base_ks, p.digit_count_ks,
                                p.n, int(fmod))
            alo, ahi = mm64.pack_host(a_pad)
            blo, bhi = mm64.pack_host(b_pad)
            a_out, b_out = fn(self._shard_batch(alo), self._shard_batch(ahi),
                              self._shard_batch(blo), self._shard_batch(bhi),
                              dk["ksk_bf"])
        return lwe.LWECiphertext(self._to_host(a_out)[:B].astype(np.uint64),
                                 self._to_host(b_out)[:B].astype(np.uint64),
                                 int(fmod))

    def _gate_fast_path(self, params: BinFHEParams, key, gate, q: int):
        """Common eligibility + pipeline lookup for the fused gate paths.
        Returns (pipe, pipe_pair, dk) or None when this configuration must
        fall back to the generic accumulator-upload path."""
        dk = self._get_device_key(params, key)
        mixed = bool(dk.get("mixed"))
        has_pack = dk.get("bsk_pack") is not None
        if not (dk["small"] or mixed) or not has_pack:
            return None
        p, rg = params.lwe, params.rgsw
        if q != p.q or (2 * rg.N) % q != 0 or q > (1 << 16):
            return None
        q1 = int(rg.gate_const(gate)) % q
        digits_eff = rg.digits_g - rg.num_digits_to_throw
        pipe, pipe_pairs = build_full_gate_pipeline(
            rg.N, rg.Q, rg.base_g, digits_eff, rg.num_digits_to_throw,
            p.n, p.q_ks, p.base_ks, p.digit_count_ks, int(q), q, q1,
            mixed=mixed)
        return pipe, pipe_pairs, dk

    def _pad_u16(self, x, Bp: int, q: int) -> np.ndarray:
        """Host array (or batch-1 scalar) -> u16 zero-padded to the batch
        bucket. A u16-stored input (the fused paths' own output dtype)
        passes through without a widening round-trip."""
        x = np.asarray(x)
        shape = (Bp,) + x.shape[1:]
        out = np.zeros(shape, dtype=np.uint16)
        B = x.shape[0]
        out[:B] = x if x.dtype == np.uint16 else x.astype(np.uint16)
        return out

    def gate_bootstrap(self, params: BinFHEParams, key, gate, ct,
                       fmod: int):
        """Fully-fused gate bootstrap from the prepped LWE batch (test
        polynomial built on device). Returns None when this configuration
        must fall back to the generic accumulator-upload path."""
        fp = self._gate_fast_path(params, key, gate, int(ct.modulus))
        if fp is None or int(fmod) != int(ct.modulus):
            return None
        pipe, _, dk = fp
        p = params.lwe
        B = ct.a.shape[0]
        Bp = self._bucket(B)
        fn = self._shard_pallas(pipe, n_batch_args=2, n_out=2)
        a_out, b_out = fn(self._shard_batch(self._pad_u16(ct.a, Bp, p.q)),
                          self._shard_batch(self._pad_u16(ct.b, Bp, p.q)),
                          dk["bsk_pack"], dk["ksk_bf"])
        return lwe.LWECiphertext(
            self._to_host(a_out)[:B], self._to_host(b_out)[:B], int(fmod))

    def gate_bootstrap_pair(self, params: BinFHEParams, key, gate, ct1, ct2,
                            neg2: bool, fmod: int):
        """Fused gate bootstrap from TWO raw ciphertexts: the gate's LWE
        combination (ct1+ct2, or 2*(ct1-ct2) when `neg2`) runs in-graph, so
        the host never touches a full-batch u64 array (the combination alone
        costs >10% of an iteration on a single-core host). Outputs stay u16
        (mod fmod = q <= 2^16).

        Large single-chip batches run as sequential chunk dispatches: jax
        dispatch is async, so chunk k+1's host prep/upload and chunk k's
        result pull overlap chunk k's kernel — the ~0.9 s/iter of host+
        transfer time at batch 16384 hides behind the 8.5 s rotation."""
        fp = self._gate_fast_path(params, key, gate, int(ct1.modulus))
        if fp is None or int(fmod) != int(ct1.modulus):
            return None
        _, pipe_pairs, dk = fp
        p = params.lwe
        B = ct1.a.shape[0]
        Bp = self._bucket(B)
        chunk = int(os.environ.get("TFHE_TPU_GATE_CHUNK", "4096"))
        if self.mesh is None and Bp > chunk and Bp % chunk == 0:
            fn = pipe_pairs[bool(neg2)]

            def chunk_u16(x, i0):
                out = np.zeros((chunk,) + np.shape(x)[1:], dtype=np.uint16)
                rows = max(0, min(chunk, B - i0))
                if rows:
                    src = np.asarray(x)[i0:i0 + rows]
                    out[:rows] = src if src.dtype == np.uint16 \
                        else src.astype(np.uint16)
                return out

            parts = []
            for i in range(0, Bp, chunk):
                # per-chunk prep AFTER the previous dispatch: the cast/pad
                # and upload of chunk k+1 ride under chunk k's kernel
                parts.append(fn(chunk_u16(ct1.a, i), chunk_u16(ct1.b, i),
                                chunk_u16(ct2.a, i), chunk_u16(ct2.b, i),
                                dk["bsk_pack"], dk["ksk_bf"]))
            a_out = np.concatenate([np.asarray(jax.device_get(o[0]))
                                    for o in parts])
            b_out = np.concatenate([np.asarray(jax.device_get(o[1]))
                                    for o in parts])
            return lwe.LWECiphertext(a_out[:B], b_out[:B], int(fmod))
        fn = self._shard_pallas(pipe_pairs[bool(neg2)],
                                n_batch_args=4, n_out=2)
        a_out, b_out = fn(self._shard_batch(self._pad_u16(ct1.a, Bp, p.q)),
                          self._shard_batch(self._pad_u16(ct1.b, Bp, p.q)),
                          self._shard_batch(self._pad_u16(ct2.a, Bp, p.q)),
                          self._shard_batch(self._pad_u16(ct2.b, Bp, p.q)),
                          dk["bsk_pack"], dk["ksk_bf"])
        return lwe.LWECiphertext(
            self._to_host(a_out)[:B], self._to_host(b_out)[:B], int(fmod))

    def _func_path(self, params: BinFHEParams, key):
        """Which fused functional pipeline this configuration supports:
        'rns' (composite 54-bit Q), 'mixed' (u32 rotation + 2^35 key switch,
        the accelerated logQ=11 sets), 'small' (u32 end to end), or None
        (host-accumulator fallback). Returns (path, device_key)."""
        dk = self._get_device_key(params, key)
        if self.mesh is not None or dk.get("dm_table") is not None:
            return None, dk
        if dk.get("bsk_rns") is not None:
            return "rns", dk
        if dk.get("bsk_pack") is not None:
            return ("mixed" if dk.get("mixed") else "small"), dk
        return None, dk

    def _func_bootstrap_core(self, params: BinFHEParams, key, path: str, dk,
                             gQ: np.ndarray, a_dev, b_dev, ct_mod: int,
                             fmod: int, per_ct: bool, u32_in: bool):
        """Shared device pipeline: in-graph test-poly build from the value
        table gQ (already scaled by Q//fmod, mod Q) -> blind rotation ->
        fused MKM switch. a_dev/b_dev are device (or uploadable host) arrays
        padded to the batch bucket: u16 residues mod ct_mod, or u32 chain
        values reduced in-graph when u32_in. Returns device (a, b) u32 mod
        fmod."""
        t0 = tic()
        p, rg = params.lwe, params.rgsw
        digits_eff = rg.digits_g - rg.num_digits_to_throw
        if path == "rns":
            q1, q2 = rg.rns_primes
            g1 = jnp.asarray((gQ % np.uint64(q1)).astype(np.uint32))
            g2 = jnp.asarray((gQ % np.uint64(q2)).astype(np.uint32))
            build = build_func_acc_rns(rg.N, q1, q2, ct_mod, per_ct, u32_in)
            acc1, acc2, a_idx = build(b_dev, a_dev, g1, g2)
            t0 = _prof_mark("func_bootstrap acc build", t0, acc1, acc2, a_idx)
            rot = build_rotate_extract_rns(rg.N, q1, q2, rg.base_g,
                                           digits_eff,
                                           rg.num_digits_to_throw, p.n)
            alo, ahi, blo, bhi = rot(acc1, acc2, a_idx, dk["bsk_rns"])
            t0 = _prof_mark("func_bootstrap rotate", t0, alo, ahi, blo, bhi)
            tail = build_tail64(p.N, p.Q, p.q_ks, p.base_ks, p.digit_count_ks,
                                p.n, int(fmod), False)
            a_out, b_out = tail(alo, ahi, blo, bhi, dk["ksk_bf"])
        else:
            g = jnp.asarray(gQ.astype(np.uint32))     # gQ < Q < 2^28
            build = build_func_acc32(rg.N, rg.Q, ct_mod, per_ct, u32_in)
            acc, a_idx = build(b_dev, a_dev, g)
            t0 = _prof_mark("func_bootstrap acc build", t0, acc, a_idx)
            rot = build_rotate_extract32(rg.N, rg.Q, rg.base_g, digits_eff,
                                         rg.num_digits_to_throw, p.n, True)
            a_t, bb = rot(acc, a_idx, dk["bsk_pack"])
            t0 = _prof_mark("func_bootstrap rotate", t0, a_t, bb)
            tail_b = build_tail64_from32 if path == "mixed" else build_tail32
            tail = tail_b(p.N, p.Q, p.q_ks, p.base_ks, p.digit_count_ks,
                          p.n, int(fmod), False)
            a_out, b_out = tail(a_t, bb, dk["ksk_bf"])
        _prof_mark("func_bootstrap tail", t0, a_out, b_out)
        return a_out, b_out

    def func_bootstrap(self, params: BinFHEParams, key, fv: np.ndarray,
                       ct, fmod: int):
        """Functional bootstrap with the test polynomial built ON device from
        the function-value table fv (= f(t) for t in [0, ctMod)) — either a
        shared [ctMod] table or a per-ciphertext [B, ctMod] table (the
        multi-LUT overload; values gathered in-graph per row instead of
        uploading host-built [B, 2, N] accumulators).
        Returns None when this configuration lacks the fast path (DM,
        multi-chip mesh, or oversized moduli) — the caller falls back to the
        host-built-accumulator route."""
        t0 = tic()
        path, dk = self._func_path(params, key)
        if path is None:
            return None
        p, rg = params.lwe, params.rgsw
        ct_mod = int(ct.modulus)
        if (2 * rg.N) % ct_mod or ct_mod > (1 << 16):
            return None
        Q = rg.Q
        scale = Q // int(fmod)
        B = ct.a.shape[0]
        Bp = self._bucket(B)
        fv = np.asarray(fv, dtype=np.uint64)
        per_ct = fv.ndim == 2
        gQ = (fv * np.uint64(scale)) % np.uint64(Q)   # exact: scale*v < 2^54
        if per_ct:                                    # pad rows to the bucket
            gp = np.zeros((Bp, ct_mod), dtype=np.uint64)
            gp[:B] = gQ
            gQ = gp
        # ct may be a raw retag from a larger modulus (set_modulus does not
        # re-reduce, lwe.py:37-40): reduce before the u16 cast
        um = np.uint64(ct_mod)
        a_pad = np.zeros((Bp, p.n), dtype=np.uint16)
        a_pad[:B] = (np.asarray(ct.a, dtype=np.uint64) % um).astype(np.uint16)
        b_pad = np.zeros((Bp,), dtype=np.uint16)
        b_pad[:B] = (np.asarray(ct.b, dtype=np.uint64) % um).astype(np.uint16)
        t0 = _prof_mark(f"func_bootstrap[baseG=2^{rg.base_g.bit_length()-1}] "
                        "host prep", t0)
        a_out, b_out = self._func_bootstrap_core(
            params, key, path, dk, gQ, a_pad, b_pad, ct_mod, int(fmod),
            per_ct, u32_in=False)
        out = lwe.LWECiphertext(self._to_host(a_out)[:B].astype(np.uint64),
                                 self._to_host(b_out)[:B].astype(np.uint64),
                                 int(fmod))
        _prof_mark("func_bootstrap host pull", t0)
        return out

    # -- device-resident functional chains (EvalFloor/Sign/Decomp) ---------

    def chain_supported(self, params: BinFHEParams, key) -> bool:
        """True when this configuration can run the device-resident
        inter-bootstrap chain (scheme.eval_floor/eval_sign/eval_decomp keep
        the ciphertext on device between bootstraps instead of pulling it
        to the host after every MKM switch)."""
        path, _ = self._func_path(params, key)
        return path is not None

    def lwe_upload(self, ct) -> DeviceLWE:
        """Host LWECiphertext batch -> padded device u32 arrays (one upload
        for the whole chain; every chain modulus is < 2^30)."""
        B = ct.a.shape[0]
        Bp = self._bucket(B)
        a = np.zeros((Bp, ct.a.shape[1]), dtype=np.uint32)
        a[:B] = np.asarray(ct.a, dtype=np.uint64).astype(np.uint32)
        b = np.zeros((Bp,), dtype=np.uint32)
        b[:B] = np.asarray(ct.b, dtype=np.uint64).astype(np.uint32)
        return DeviceLWE(jnp.asarray(a), jnp.asarray(b), int(ct.modulus), B)

    def lwe_download(self, dct: DeviceLWE):
        return lwe.LWECiphertext(
            np.asarray(jax.device_get(dct.a))[:dct.B].astype(np.uint64),
            np.asarray(jax.device_get(dct.b))[:dct.B].astype(np.uint64),
            dct.modulus)

    def func_bootstrap_dev(self, params: BinFHEParams, key, fv: np.ndarray,
                           dct: DeviceLWE, ct_mod: int,
                           fmod: int) -> DeviceLWE:
        """Functional bootstrap on a device-resident ciphertext: input values
        are reduced mod ct_mod in-graph (the raw-retag convention), output
        stays on device mod fmod. `fv` is a [ctMod] value table or [B, ctMod]
        for per-ciphertext LUTs. Callers must have checked chain_supported
        plus the modulus conditions ((2N) %% ct_mod == 0, ct_mod <= 2^16)."""
        path, dk = self._func_path(params, key)
        if path is None:
            raise RuntimeError("func_bootstrap_dev on unsupported config")
        rg = params.rgsw
        scale = rg.Q // int(fmod)
        fv = np.asarray(fv, dtype=np.uint64)
        per_ct = fv.ndim == 2
        gQ = (fv * np.uint64(scale)) % np.uint64(rg.Q)
        Bp = dct.a.shape[0]
        if per_ct:                                    # pad rows to the bucket
            gp = np.zeros((Bp, int(ct_mod)), dtype=np.uint64)
            gp[:gQ.shape[0]] = gQ
            gQ = gp
        # bound peak HBM at huge batches: run the bootstrap core over
        # sequential device slices (the work buffers — acc lanes, one-hot
        # key-switch transients — scale with the slice, keys are shared;
        # a 16384 batch runs as 2x8192 with no host round trip)
        chunk = int(os.environ.get("TFHE_TPU_FUNC_CHUNK", "8192"))
        if Bp > chunk:
            a_parts, b_parts = [], []
            for i in range(0, Bp, chunk):
                g_i = gQ[i:i + chunk] if per_ct else gQ
                a_o, b_o = self._func_bootstrap_core(
                    params, key, path, dk, g_i, dct.a[i:i + chunk],
                    dct.b[i:i + chunk], int(ct_mod), int(fmod),
                    per_ct=per_ct, u32_in=True)
                a_parts.append(a_o)
                b_parts.append(b_o)
            return DeviceLWE(jnp.concatenate(a_parts),
                             jnp.concatenate(b_parts), int(fmod), dct.B)
        a_out, b_out = self._func_bootstrap_core(
            params, key, path, dk, gQ, dct.a, dct.b, int(ct_mod), int(fmod),
            per_ct=per_ct, u32_in=True)
        return DeviceLWE(a_out, b_out, int(fmod), dct.B)

    def dev_add_const(self, dct: DeviceLWE, c: int) -> DeviceLWE:
        return DeviceLWE(dct.a, _build_addc(dct.modulus, int(c))(dct.b),
                         dct.modulus, dct.B)

    def dev_sub_const(self, dct: DeviceLWE, c: int) -> DeviceLWE:
        return DeviceLWE(dct.a, _build_subc(dct.modulus, int(c))(dct.b),
                         dct.modulus, dct.B)

    def dev_sub(self, d1: DeviceLWE, d2: DeviceLWE) -> DeviceLWE:
        a, b = _build_sub(d1.modulus)(d1.a, d1.b, d2.a, d2.b)
        return DeviceLWE(a, b, d1.modulus, d1.B)

    def dev_mod_switch(self, dct: DeviceLWE, new_mod: int) -> DeviceLWE:
        a, b = _build_mod_switch_pow2(dct.modulus, int(new_mod))(dct.a, dct.b)
        return DeviceLWE(a, b, int(new_mod), dct.B)

    def dev_retag(self, dct: DeviceLWE, new_mod: int) -> DeviceLWE:
        """Raw modulus retag (lwe.set_modulus): values unchanged."""
        return DeviceLWE(dct.a, dct.b, int(new_mod), dct.B)

    def bootstrap_pipeline(self, params: BinFHEParams, key, acc_init: np.ndarray,
                           a_batch: np.ndarray, a_modulus: int, fmod: int,
                           add_q8: bool) -> lwe.LWECiphertext:
        """Whole gate/functional bootstrap on device: shape-keyed rotation
        jit + fmod-specific tail jit, accumulator resident on device between
        the two (no host round trip, unlike the reference's D2H+H2D between
        EvalAcc_CUDA and MKMSwitch_CUDA)."""
        dk = self._get_device_key(params, key)
        p, rg = params.lwe, params.rgsw
        if dk.get("dm_table") is not None:
            acc_out = self.eval_acc(params, key, acc_init, a_batch, a_modulus)
            from ..ref.rgsw import poly_transpose
            a_t = poly_transpose(acc_out[:, 0, :], rg.Q)
            b = acc_out[:, 1, 0]
            if add_q8:
                b = (b + np.uint64(rg.Q // 8 + 1)) % np.uint64(rg.Q)
            return self.mkm_switch(params, key, a_t, b, fmod)
        B = acc_init.shape[0]
        Bp = self._bucket(B)
        acc = np.zeros((Bp, 2, rg.N), dtype=np.uint64)
        acc[:B] = np.asarray(acc_init, dtype=np.uint64)
        a_idx = np.zeros((Bp, p.n), dtype=np.int32)
        a_idx[:B] = self._scaled_indices(a_batch, a_modulus, rg.N)
        digits_eff = rg.digits_g - rg.num_digits_to_throw
        if dk["small"] or dk.get("mixed"):
            use_pallas = (dk.get("bsk_pack") is not None)
            rot = self._shard_pallas(build_rotate_extract32(
                rg.N, rg.Q, rg.base_g, digits_eff, rg.num_digits_to_throw,
                p.n, use_pallas), n_batch_args=2, n_out=2)
            key_args = ((dk["bsk_pack"],) if use_pallas
                        else (dk["bsk"], dk["bsk_sh"]))
            a_t, b = rot(self._shard_batch(acc.astype(np.uint32)),
                         self._shard_batch(a_idx), *key_args)
            # fmod-specific tail: cheap compile, no pallas inside; XLA
            # partitions it over the mesh from the sharded inputs
            tail_b = build_tail64_from32 if dk.get("mixed") else build_tail32
            tail = tail_b(p.N, p.Q, p.q_ks, p.base_ks, p.digit_count_ks,
                          p.n, int(fmod), bool(add_q8))
            a_out, b_out = tail(a_t, b, dk["ksk_bf"])
        elif dk.get("bsk_rns") is not None:
            q1, q2 = rg.rns_primes
            rot = self._shard_pallas(build_rotate_extract_rns(
                rg.N, q1, q2, rg.base_g, digits_eff,
                rg.num_digits_to_throw, p.n), n_batch_args=3, n_out=4)
            alo, ahi, blo, bhi = rot(
                self._shard_batch((acc % np.uint64(q1)).astype(np.uint32)),
                self._shard_batch((acc % np.uint64(q2)).astype(np.uint32)),
                self._shard_batch(a_idx), dk["bsk_rns"])
            tail = build_tail64(p.N, p.Q, p.q_ks, p.base_ks,
                                p.digit_count_ks, p.n, int(fmod),
                                bool(add_q8))
            a_out, b_out = tail(alo, ahi, blo, bhi, dk["ksk_bf"])
        else:
            lo, hi = mm64.pack_host(acc)
            use_pallas = dk.get("bsk_sh_pack") is not None
            rot = self._shard_pallas(build_rotate_extract64(
                rg.N, rg.Q, rg.base_g, digits_eff, rg.num_digits_to_throw,
                p.n, use_pallas), n_batch_args=3, n_out=4)
            key_args = ((dk["bsk_sh_pack"],) if use_pallas
                        else (dk["bsk_lo"], dk["bsk_hi"],
                              dk["bsk_sh_lo"], dk["bsk_sh_hi"]))
            alo, ahi, blo, bhi = rot(self._shard_batch(lo),
                                     self._shard_batch(hi),
                                     self._shard_batch(a_idx), *key_args)
            tail = build_tail64(p.N, p.Q, p.q_ks, p.base_ks,
                                p.digit_count_ks, p.n, int(fmod),
                                bool(add_q8))
            a_out, b_out = tail(alo, ahi, blo, bhi, dk["ksk_bf"])
        return lwe.LWECiphertext(self._to_host(a_out)[:B].astype(np.uint64),
                                 self._to_host(b_out)[:B].astype(np.uint64),
                                 int(fmod))

    # -- helpers -----------------------------------------------------------

    @staticmethod
    def _scaled_indices(a_batch: np.ndarray, a_modulus: int, N: int) -> np.ndarray:
        """(q - a) * (2N / q) mod 2N as int32 (rgsw-acc-cggi.cpp:151-154)."""
        a = np.asarray(a_batch, dtype=np.uint64) % np.uint64(a_modulus)
        factor = (2 * N) // a_modulus
        idx = ((np.uint64(a_modulus) - a) % np.uint64(a_modulus)) * np.uint64(factor)
        return (idx % np.uint64(2 * N)).astype(np.int32)
