"""Stage-group-fused Pallas kernel for the bit-sliced GF(2^128) additive NTT.

The per-stage kernels in ntt/pallas_kernels.py read and write the whole
array once per butterfly stage: at log_h=24 that is 24 x 2 x 256 MB of HBM
traffic (plus expanded twiddle-plane arrays on the low stages).  This module
is the TPU analogue of the reference's MAX_STAGES_PER_KERNEL stage-grouping
(src/ulvt/ntt/additive_ntt.cuh:222-247, utils/common.cuh:32): a single
pallas_call keeps a VMEM-resident tile across MANY stages, so the whole
transform needs only ceil(log_h / group_size) HBM round-trips.

Key idea — twiddles are free.  The reference computes each twiddle as an
XOR-subset-sum of ``constants[stage][m]`` over the set bits of the
butterfly-block indicator (calculate_twiddle, additive_ntt.cuh:59-77).
That sum is GF(2)-linear in the indicator bits, so bit ``i`` of the twiddle
is the *parity* of ``indicator & mask`` where
``mask[i] = sum_m bit_i(constants[stage][m]) << m``.  Inside the kernel the
indicator splits into a tile-local part (an iota over the tile axis) and a
per-instance part (the grid index), each needing only a (stages, 128)
uint32 mask array — the full twiddle bit-planes are regenerated in VMEM
with ~6 vector ops per stage and never touch HBM.

Stage grouping (batch index b has log_nb = log_h - 5 bits; stage s >= 5
pairs batches across bit s-5; stages s < 5 are lane-local):

  * bottom group: tile = 2^k consecutive batches -> covers high stages
    s = k+4 .. 5 AND all 5 lane-local low stages in one pass;
  * upper groups: tile = 2^k batches strided by 2^t0 (a (pre, 2^k, post)
    reshape — no gather) -> covers stages t0+k+4 .. t0+5.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import (HEIGHT, W, _LANE_MASKS, _mul_planes, _mul_vmem,
                             _mul_vmem_sl)

IPV = W // 32

# tile-size knobs: bottom tiles are (2^KB, 128) words; upper tiles are
# (2^KU, PT, 128).  Mosaic's scoped-VMEM stack holds ~25x the tile size
# through a stage-loop body: KB=10 bottom kernels hit 17.6M at 2^24 and
# KU=9/PT=8 upper kernels 16.8M against the 16.00M v5e limit; KB=9/KU=8
# compile at ~9M with no measurable runtime cost (the transform is
# ALU-bound; tile size only changes grid granularity).
KB = int(os.environ.get("BNTT_KB", "9"))
KU = int(os.environ.get("BNTT_KU", "8"))
PT = int(os.environ.get("BNTT_PT", "8"))

# Stage-loop unroll switches (Mosaic supports only rolled or FULLY
# unrolled loops).  Rolled bodies carry ONE multiply instantiation;
# full unroll instantiates one multiply per stage, trading compile time
# for Mosaic's cross-stage scheduling.  Round-3 device A/B at 2^24:
# base (both rolled) 125.0 ms / 34 s compile; LOW unrolled 116.3 ms /
# 53 s; HI unrolled 124.9 ms / 147 s (no runtime gain); both 116.9 ms.
# => unroll the 5-step low loop only.  (Round-1's fully per-stage
# unrolled bodies ran 104 ms but cost ~1000 s of compile; the remaining
# ~12 ms lives in the rolled hi-loop's scheduling, which full unroll of
# the CURRENT body does not recover.)
# BNTT_UNROLL_HI: 0 = rolled (default), -1 = full.  Round-4 A/B verdict
# (TPU_VALIDATION suite knob_ab): partial values are REJECTED by Mosaic
# ("Only unroll=num_steps and unroll=1 supported"), full unroll recovers
# nothing (each stage consumes the whole previous tile — no inter-stage
# ILP), and the Pease write-back itself is free (probe: 117.1 vs
# 116.0 ms).  Rolled is the measured optimum at flat compile.
UNROLL_HI = int(os.environ.get("BNTT_UNROLL_HI", "0"))
UNROLL_LOW = True     # lane/low-stage loop (5 steps, bottom group only)

# BNTT_WIDE2: hand-written 2-wide hi-loop body — TWO butterfly/multiply
# instantiations per fori_loop iteration (an odd leading stage peels off
# statically).  The one unroll form Mosaic's own knob cannot express
# (partial unroll values are rejected; see the round-4 knob_ab verdict):
# tests whether giving the scheduler a pair of dependent 15k-op multiply
# chains in one loop body recovers any of the ~12 ms residual vs SoL that
# full static unroll did not.  Round-5 measured verdict (knob_ab rows,
# both golden-PASS at 2^20, quiet chip): wide2 120.7 ms / 44.4 s compile
# vs baseline 115.3 ms / 26.9 s at 2^24 — the 2-wide body LOSES ~5 ms.
# That closes the last named unroll variant: each stage consumes the
# whole previous tile (no cross-stage ILP to expose), and the rolled
# 1-stage body at flat compile is the measured optimum of this kernel.
WIDE2 = os.environ.get("BNTT_WIDE2", "") == "1"

# TIMING PROBE ONLY (produces WRONG transforms — golden must FAIL): replace
# the constant-geometry interleave write-back with a plain contiguous
# concatenate of identical op volume minus the sublane shuffle.  Isolates
# how much of the hi-loop's time is the Pease rotation itself.
_PROBE_CONCAT = os.environ.get("BNTT_PROBE_CONCAT", "") == "1"

# A plane-major row-stage variant (lane-axis butterflies via pltpu.roll,
# no per-multiply 2-D transposes) was built in round 2 and A/B'd on the
# v5e in round 3: it compiled and passed golden, but measured SLOWER than
# this row-major body at every config (2^20: 7.66 vs 6.99 ms; 2^24:
# 140.4 vs 125.0 ms — pm_ab rows in TPU_VALIDATION.jsonl), so it was
# deleted.  The dynamic-shift rolls and lane select/blend chains cost
# more than the three 2-D tile transposes they replace.


def _bit_masks(constants, offset: int, count: int) -> np.ndarray:
    """mask[i] = sum_m bit_i(constants[offset+m]) << m   (shape (128,))."""
    out = np.zeros(W, dtype=np.uint32)
    for m in range(count):
        c = int(constants[offset + m])
        for i in range(W):
            if (c >> i) & 1:
                out[i] |= np.uint32(1 << m)
    return out


def _parity_planes(idx, mask):
    """Bit-planes of the XOR-subset-sum: 0xFFFFFFFF where parity(idx & mask).

    idx: uint32 (..., 1); mask: uint32 (..., 128) -> (..., 128) planes.
    """
    x = idx & mask
    x = x ^ (x >> 16)
    x = x ^ (x >> 8)
    x = x ^ (x >> 4)
    x = x ^ (x >> 2)
    x = x ^ (x >> 1)
    return jnp.uint32(0) - (x & jnp.uint32(1))


def plan_groups(log_nb: int) -> list[tuple[int, int, bool]]:
    """Split batch-index bits into (t0, k, include_low) groups, bottom-up."""
    groups = [(0, min(log_nb, KB), True)]
    rem = log_nb - groups[0][1]
    if rem > 0:
        # balanced chunks: ceil(rem/KU) groups of near-equal size.  A
        # greedy split leaves runt groups (k=1 at log_nb=19 with KU=8)
        # whose tiny-vector kernels compile SLOWER than full ones (56s vs
        # 11s measured) and add a whole extra Mosaic program.
        n = -(-rem // KU)
        t0 = groups[0][1]
        for i in range(n):
            k = rem // n + (1 if i < rem % n else 0)
            groups.append((t0, k, False))
            t0 += k
    return groups


def make_group_tables(rows, log_h: int, log_rate: int, t0: int, k: int,
                      include_low: bool):
    """Mask tables for one stage group.

    rows: precompute_subspace_evals(log_h, log_rate, 7) (python ints).
    Returns (mtile, minst, lanes) numpy arrays; stage order matches the
    kernel's execution order (high stages descending, then low 4..0).
    mtile/minst: (n_stages, 128) uint32; lanes: (5, 128) or None.

    This IS the sharded builder at log_d = 0 (no device bits: the p/coset
    mask split collapses to the contiguous instance mask and the d-table
    is identically zero).
    """
    mtile, minst, lanes, zero, _ = make_group_tables_sharded(
        rows, log_h, log_rate, t0, k, include_low, 0)
    return (mtile, minst, lanes, zero)


class _RefRows:
    """Adapter marking a Pallas Ref whose rows are read with dynamic
    starts inside the kernel (Mosaic lowers dynamic-start ref loads but
    not dynamic_slice on materialised vectors)."""

    __slots__ = ("ref",)

    def __init__(self, ref):
        self.ref = ref


def _row(t, st):
    """Dynamic row st of a (n_stages, 128) table, kept 2-D: (1, 128)."""
    if isinstance(t, _RefRows):
        return t.ref[pl.ds(st, 1), :]
    return jax.lax.dynamic_slice_in_dim(t, st, 1, axis=0)


def _group_body(xt, q, mtile, minst, lanes, dpl=None, *, log_h: int, k: int,
                pt: int, include_low: bool, zero_flags: tuple = (),
                mul=_mul_vmem_sl):
    """Stage-group math on one VMEM tile: xt (2^k, pt, 128), q uint32 scalar.

    Pure jnp — called from the Pallas kernel AND (jitted directly) from the
    CPU emulation used by the tests.

    Constant-geometry (Pease-style) stage loop: every stage pairs the TOP
    tile bit (u = xt[0::], v = xt[1::] of a (2, 2^(k-1), pt, 128) view) and
    writes back interleaved (row j of each half -> row 2j+b), which rotates
    the tile's index bits so the next stage's pairing bit is again on top;
    after k stages the rotation is the identity.  The butterfly-block bits
    (original index bits above the pairing bit — the only data-dependent
    part of the twiddle indicator, additive_ntt.cuh:59-77) land in the low
    ``st`` bits of the rotated index in exactly mtile's bit order, so the
    per-stage twiddle masks apply unchanged.  The payoff: the body carries
    ONE multiply instantiation inside a lax.fori_loop instead of one per
    stage — the straight-line 3^7-AND multiply is ~15k vector ops, and the
    per-stage unrolled chain (~15 copies at the bottom group) cost ~1000 s
    of Mosaic compile at 2^24 (BENCH_r01) for a transform that runs in
    105 ms.  Runtime op count is unchanged.

    zero_flags[st] marks stages whose twiddle is identically zero (only the
    global top stage at rate 0): handled as a static XOR-only butterfly
    before the loop (leading positions only — asserted).
    dpl: optional (n_stages, 128) per-shard twiddle-correction planes (the
    device-index bits of the indicator, GF(2)-linear like everything else —
    see parallel/ntt128_sharded.py).
    mul: the tile multiply.  The Pallas kernel uses the straight-line form;
    jitted CPU emulation (shard_map tests) passes the compact stacked form
    _mul_vmem — identical field math, ~100 ops instead of ~15k, which
    XLA:CPU can actually compile.
    """
    kk = 1 << k
    half = kk // 2
    jt = jax.lax.broadcasted_iota(jnp.uint32, (half, 1), 0)

    n_zero = 0
    while n_zero < len(zero_flags) and zero_flags[n_zero]:
        n_zero += 1
    assert not any(zero_flags[n_zero:]), (
        "only leading zero-twiddle stages are supported (the global top "
        "stage at rate 0)")
    assert n_zero <= k

    def _interleave(u2, v2):
        if _PROBE_CONCAT:        # timing probe: wrong geometry, same volume
            return jnp.concatenate(
                [u2.reshape(half, pt, W), v2.reshape(half, pt, W)],
                axis=0)
        # rotate write-back: (b, j) -> 2j + b
        return jnp.stack(
            [u2.reshape(half, pt, W), v2.reshape(half, pt, W)],
            axis=1).reshape(kk, pt, W)

    for _ in range(n_zero):              # w == 0: u' = u, v' = u ^ v
        x3 = xt.reshape(2, half * pt, W)
        xt = _interleave(x3[0], x3[0] ^ x3[1])

    def hi_body(st, xt):
        stu = st.astype(jnp.uint32) if hasattr(st, "astype") else jnp.uint32(st)
        x3 = xt.reshape(2, half * pt, W)
        u, v = x3[0], x3[1]
        blk = jt & ((jnp.uint32(1) << stu) - jnp.uint32(1))
        w = (_parity_planes(blk, _row(mtile, st))
             ^ _parity_planes(q, _row(minst, st)))
        if dpl is not None:
            w = w ^ _row(dpl, st)
        wB = jnp.broadcast_to(w[:, None, :], (half, pt, W))
        u2 = u ^ mul(wB.reshape(half * pt, W), v)
        return _interleave(u2, u2 ^ v)

    if k - n_zero > 0:
        steps = k - n_zero
        if WIDE2 and steps >= 2:
            # manual 2-wide body: an odd leading stage peels off with a
            # static index, then each iteration runs two full
            # butterfly+multiply stages back to back
            lead = steps % 2
            if lead:
                xt = hi_body(n_zero, xt)

            def hi2_body(it, xt):
                st = jnp.int32(n_zero + lead) + 2 * it
                return hi_body(st + 1, hi_body(st, xt))

            xt = jax.lax.fori_loop(0, (steps - lead) // 2, hi2_body, xt)
        else:
            unroll = (steps if UNROLL_HI == -1
                      else max(min(UNROLL_HI, steps), 1))
            xt = jax.lax.fori_loop(n_zero, k, hi_body, xt, unroll=unroll)

    if include_low:
        assert pt == 1
        xt = _low_stages128(xt.reshape(kk, W), q, mtile, minst, lanes, dpl,
                            k=k, log_h=log_h, mul=mul).reshape(kk, pt, W)
    return xt


def _low_stages128(xf, q, mtile, minst, lanes, dpl, *, k: int, log_h: int,
                   mul=_mul_vmem_sl):
    """The 5 lane-local (in-word) stages on a row-major (2^k, W) tile.

    Low stages are lane-local; only the v half of each batch needs a
    product, so PAIRS of batches pack their v-halves into one
    32-lane multiply — half the multiplies of the naive form.

    Constant geometry IN-WORD: every iteration pairs the top in-word bit
    (a STATIC shift-16 / 0xFFFF-mask butterfly), then a perfect
    out-shuffle of the 32 word bits (4 static delta swaps) rotates the
    in-word index so the next stage's bit is on top; 5 iterations restore
    the identity.  Static shifts matter: the traced-shift variant of this
    loop compiled ~20x slower under Mosaic.  The lanes table rows are
    pre-permuted per iteration by the same bit rotation
    (make_group_tables_sharded).
    """
    kk = 1 << k
    assert min(log_h - 1, 4) == 4, "fused path needs log_h >= 5"
    jtf = jax.lax.broadcasted_iota(jnp.uint32, (kk, 1), 0)
    um = jnp.uint32(0x0000FFFF)
    vm = jnp.uint32(0xFFFF0000)

    def _outshuffle(x):
        # bit p=b*16+j -> 2j+b (rotl of the 5-bit position index)
        for m, sh in ((0x0000FF00, 8), (0x00F000F0, 4),
                      (0x0C0C0C0C, 2), (0x22222222, 1)):
            t = ((x >> sh) ^ x) & jnp.uint32(m)
            x = x ^ t ^ (t << sh)
        return x

    def low_body(i, xf):
        st = k + i
        x2 = xf.reshape(kk // 2, 2, W)
        x0, x1 = x2[:, 0], x2[:, 1]
        wrow = (_parity_planes(jtf, _row(mtile, st))
                ^ _parity_planes(q, _row(minst, st))
                ^ _row(lanes, i))             # (kk, W)
        if dpl is not None:
            wrow = wrow ^ _row(dpl, st)
        w2 = wrow.reshape(kk // 2, 2, W)
        # composite: even batch's v-values in u-slots, odd batch's
        # in v-slots; twiddles arranged to match
        comp = ((x0 >> 16) & um) | (x1 & vm)
        wcmp = (w2[:, 0] & um) | ((w2[:, 1] & um) << 16)
        prod = mul(wcmp, comp)
        un0 = x0 ^ (prod & um)
        un1 = x1 ^ ((prod & vm) >> 16)
        y0 = (un0 & um) | ((x0 ^ (un0 << 16)) & vm)
        y1 = (un1 & um) | ((x1 ^ (un1 << 16)) & vm)
        y = jnp.stack([y0, y1], axis=1).reshape(kk, W)
        return _outshuffle(y)

    return jax.lax.fori_loop(0, 5, low_body, xf,
                             unroll=5 if UNROLL_LOW else 1)


def stage_group(x, mtile, minst, lanes, *, log_h: int, t0: int, k: int,
                include_low: bool, cosets: int, zero_flags: tuple = (),
                log_nb: int | None = None, dplanes=None,
                emulate: bool = False):
    """Run one stage group over x: (cosets, nb, 128) -> same shape.

    Covers high stages 5+t0+k-1 .. 5+t0 and, if include_low, low stages
    4..0.  One HBM read + one write of x; twiddles generated in VMEM.
    ``emulate=True`` runs the same tile math as a vmapped jnp program
    (CPU-testable) instead of a pallas_call.
    ``log_nb`` overrides the batch-bit count (a sharded caller passes its
    LOCAL batch count); ``dplanes`` (n_stages, 128) XORs a per-shard
    twiddle correction into every stage (see parallel/ntt128_sharded.py).
    """
    _, nb, _ = x.shape
    if log_nb is None:
        log_nb = log_h - 5
    pre = 1 << (log_nb - t0 - k)
    post = 1 << t0
    pt = min(PT, post)
    n_inst = cosets * pre
    kk = 1 << k

    x5 = x.reshape(n_inst, kk, post, W)
    body = functools.partial(_group_body, log_h=log_h, k=k, pt=pt,
                             include_low=include_low, zero_flags=zero_flags)

    if emulate:
        xt = x5.reshape(n_inst, kk, post // pt, pt, W).transpose(0, 2, 1, 3, 4)
        qs = jnp.arange(n_inst, dtype=jnp.uint32)
        # stacked multiply: identical field math, ~100 ops instead of the
        # 15k-op straight-line body — jitted CPU tests compile in seconds
        emu_kw = dict(mul=_mul_vmem)
        fn = jax.vmap(jax.vmap(
            lambda t, q: body(t, q, mtile, minst, lanes, dplanes, **emu_kw),
            in_axes=(0, None)), in_axes=(0, 0))
        out = fn(xt, qs)
        out = out.transpose(0, 2, 1, 3, 4).reshape(x5.shape)
        return out.reshape(x.shape)

    grid = (n_inst, post // pt)
    bspec = pl.BlockSpec((1, kk, pt, W), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec(mtile.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    lspec = (pl.BlockSpec(lanes.shape, lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
             if include_low else None)
    dspec = (pl.BlockSpec(dplanes.shape, lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
             if dplanes is not None else None)

    def kern(*refs):
        refs = list(refs)
        mtile_ref = _RefRows(refs.pop(0))
        minst_ref = _RefRows(refs.pop(0))
        lns = _RefRows(refs.pop(0)) if include_low else None
        dpl = _RefRows(refs.pop(0)) if dplanes is not None else None
        x_ref, out_ref = refs
        q = pl.program_id(0).astype(jnp.uint32)   # (coset << pre_bits) | pre
        out_ref[0] = body(x_ref[0], q, mtile_ref, minst_ref, lns, dpl)

    in_specs = ([mspec, mspec] + ([lspec] if include_low else [])
                + ([dspec] if dplanes is not None else []))
    args = ((mtile, minst) + ((lanes,) if include_low else ())
            + ((dplanes,) if dplanes is not None else ()))
    n_in = len(args) + 1
    # write each tile in place (the butterfly consumes its input block):
    # halves the double-buffered block footprint and the HBM allocations
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs + [bspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct(x5.shape, x5.dtype),
        input_output_aliases={n_in - 1: 0},
    )(*args, x5)
    return out.reshape(x.shape)


def apply_fused(data, tables, *, log_h: int, log_rate: int,
                emulate: bool = False):
    """Full transform: data (nb, 128) bit-sliced -> (cosets*nb, 128).

    tables: tuple of per-group (t0, k, include_low, mtile, minst, lanes)
    from build_tables(), ordered top group first (DIT: high stages first).
    """
    nb = data.shape[0]
    cosets = 1 << log_rate
    x = jnp.broadcast_to(data[None], (cosets, nb, W))
    for (t0, k, include_low, mtile, minst, lanes, zero_flags) in tables:
        x = stage_group(x, mtile, minst, lanes, log_h=log_h, t0=t0, k=k,
                        include_low=include_low, cosets=cosets,
                        zero_flags=zero_flags, emulate=emulate)
    return x.reshape(cosets * nb, W)


def build_tables(rows, log_h: int, log_rate: int):
    """Per-group mask tables, ordered for execution (top group first)."""
    out = []
    for (t0, k, include_low) in reversed(plan_groups(log_h - 5)):
        mtile, minst, lanes, zero_flags = make_group_tables(
            rows, log_h, log_rate, t0, k, include_low)
        out.append((t0, k, include_low,
                    jnp.asarray(mtile), jnp.asarray(minst),
                    None if lanes is None else jnp.asarray(lanes),
                    zero_flags))
    return tuple(out)


def _dtable(constants, offset: int, cnt: int, log_d: int) -> np.ndarray:
    """Doubling table of 128-bit indicator contributions of the device
    bits: row d = XOR over set bits m of d of constants[offset+m], as
    (2^log_d, 4) uint32 words (bits beyond cnt contribute nothing)."""
    tab = np.zeros((1, IPV), dtype=np.uint32)
    for m in range(max(cnt, 0)):
        c = int(constants[offset + m])
        cw = np.array([(c >> (32 * i)) & 0xFFFFFFFF for i in range(IPV)],
                      dtype=np.uint32)
        tab = np.concatenate([tab, tab ^ cw[None]])
    return np.tile(tab, (1 << (log_d - max(cnt, 0)), 1))


def make_group_tables_sharded(rows, log_h: int, log_rate: int, t0: int,
                              k: int, include_low: bool, log_d: int):
    """Mask tables for one LOCAL stage group of a block-sharded transform.

    Device d of 2^log_d holds batches [d*nb_l, (d+1)*nb_l); a local stage
    s = 5+t0+r sees the indicator
      coset << (log_h-1-s) | d << (m0+pre_bits_l) | p << m0 | tile_bits
    (p = the local pre index).  mtile is unchanged; minst packs the p part
    at q bits [0, pre_bits_l) and the coset part at [pre_bits_l, ...)
    (matching q = coset << pre_bits_l | p under shard_map); the d bits —
    GF(2)-linear like everything else — become a per-device 128-bit
    correction looked up in a (n_stages, 2^log_d, 4) doubling table and
    XORed into the kernel's parity planes (the ``dplanes`` operand).
    """
    log_nb_l = log_h - 5 - log_d
    pre_bits_l = log_nb_l - t0 - k
    mtile, minst, dtab = [], [], []

    def masks_split(s, base_off):
        nbits = log_h + log_rate - 1 - s
        p_cnt = max(min(pre_bits_l, nbits - base_off), 0)
        d_off = base_off + pre_bits_l
        d_cnt = max(min(log_d, nbits - d_off), 0)
        c_off = d_off + log_d
        c_cnt = max(nbits - c_off, 0)
        mi = (_bit_masks(rows[s], base_off, p_cnt)
              | (_bit_masks(rows[s], c_off, c_cnt) << np.uint32(pre_bits_l)))
        return mi, _dtable(rows[s], d_off, d_cnt, log_d)

    for r in range(k - 1, -1, -1):
        s = 5 + t0 + r
        m0 = k - 1 - r
        nbits = log_h + log_rate - 1 - s
        mtile.append(_bit_masks(rows[s], 0, min(m0, nbits)))
        mi, dt = masks_split(s, m0)
        minst.append(mi)
        dtab.append(dt)
    lanes = None
    if include_low:
        lane_list = []
        for s in range(min(log_h - 1, 4), -1, -1):
            nbits = log_h + log_rate - 1 - s
            lane_bits = min(4 - s, nbits)
            mtile.append(_bit_masks(rows[s], lane_bits,
                                    min(k, max(nbits - lane_bits, 0))))
            mi, dt = masks_split(s, lane_bits + k)
            minst.append(mi)
            dtab.append(dt)
            vals = np.zeros(32, dtype=object)
            for j in range(32):
                v = 0
                jj = j >> (s + 1)
                for m in range(lane_bits):
                    if (jj >> m) & 1:
                        v ^= rows[s][m]
                vals[j] = v
            planes = np.zeros(W, dtype=np.uint32)
            # constant-geometry kernel: at iteration i = 4-s the word bits
            # have been out-shuffled i times (content pos -> rotl5(pos)), so
            # physical bit p holds element rotr5^i(p) — permute the plane
            # bits to match (lanes_new bit p = twiddle of element rotr^i(p))
            it = 4 - s
            perm = [j for j in range(32)]
            for _ in range(it):
                perm = [((j >> 1) | ((j & 1) << 4)) & 31 for j in perm]
            for i in range(W):
                acc = 0
                for p in range(32):
                    acc |= ((int(vals[perm[p]]) >> i) & 1) << p
                planes[i] = acc
            lane_list.append(planes)
        lanes = np.stack(lane_list)
    mtile = np.stack(mtile)
    minst = np.stack(minst)
    dtab = np.stack(dtab)
    n_high = k
    zero = []
    for st in range(mtile.shape[0]):
        z = (not mtile[st].any() and not minst[st].any()
             and not dtab[st].any())
        if st >= n_high and lanes is not None:
            z = z and not lanes[st - n_high].any()
        zero.append(z)
    return (mtile, minst, lanes, tuple(zero), dtab)


def build_tables_sharded(rows, log_h: int, log_rate: int, log_d: int):
    """Per-LOCAL-group tables for a 2^log_d-way block-sharded transform,
    ordered for execution (top group first)."""
    out = []
    for (t0, k, include_low) in reversed(plan_groups(log_h - 5 - log_d)):
        mtile, minst, lanes, zero_flags, dtab = make_group_tables_sharded(
            rows, log_h, log_rate, t0, k, include_low, log_d)
        out.append((t0, k, include_low,
                    jnp.asarray(mtile), jnp.asarray(minst),
                    None if lanes is None else jnp.asarray(lanes),
                    zero_flags, jnp.asarray(dtab)))
    return tuple(out)
