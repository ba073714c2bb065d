"""Fused Pallas TPU kernels for the sumcheck round and fold.

The reference fuses the whole round into one kernel (compute_compositions,
sumcheck/core/kernels.cuh:5-102) plus a fold kernel (kernels.cu:9-31).  This
is the TPU analogue: one pallas_call per round computing every per-tile
composition product and accumulating XOR partial sums in VMEM, and one for
the challenge fold.

TPU-first improvements over a literal translation:

  * Interpolation points 0 and 1 fold a column to its lower / upper half
    (lower ^ p*(lower^upper) with p in {0,1}), so points[0] and points[1]
    are byproducts of the compositions already needed for the total sum —
    only points p >= 2 pay a fold+composition (the reference folds all
    points, kernels.cuh:41-83).  For COMPOSITION_SIZE=2 that is 3 full
    multiplies per tile instead of 5.
  * A fold at interpolation point p multiplies by a *constant* height-2
    subfield element, which is GF(2)-linear on each 4-plane chunk: it
    compiles to a handful of plane XORs selected by the 4x4 bit-matrix of
    mul-by-p (no ANDs at all), cf. the reference's per-chunk
    multiply_unrolled<2> (core.cu:45-48).
  * The challenge fold multiplies by a value constant across the whole
    array: its Karatsuba forward expansion runs in scalar registers.

Fixed-shape dispatch: the evaluation buffer keeps its full (C, B, 128)
shape for the whole protocol and the *live* row count arrives as a
scalar-prefetch argument; index maps clamp dead grid steps onto the last
live block (same block index on consecutive steps -> Pallas skips the DMA),
and predicated writes keep dead steps from touching the accumulators.  One
compile therefore serves every round of a protocol — the previous
per-round-shape variant paid one remote Mosaic compile per round (~20 s/
round through the axon tunnel, dwarfing the actual compute).  Rounds too
small to fill one tile fall back to the prover's jnp while_loop kernels
(also fixed-shape).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import tower_scalar as ts
from ..ntt.pallas_kernels import HEIGHT, W, _mul_planes

T = 1024          # batch rows per tile (scaled down per composition size)

# A/B overrides for the tile-size experiments (tools/sumcheck_tile_ab.py);
# production defaults live in round_tile / fold_tile below
_ROUND_T_ENV = os.environ.get("BNTT_ROUND_T", "")
_FOLD_T_ENV = os.environ.get("BNTT_FOLD_T", "")

# BNTT_ROUND_ROLL (default ON): roll the COLUMN loops of the round
# kernel with lax.fori_loop (dynamic-start ref reads, plane-stack (W, t)
# carries) so the Mosaic body holds 2 + n_extra multiply instantiations
# instead of (C+1)(C-1).  Round-5 device A/B at 2^24, equality-gated,
# default tiles (which a rolled-body re-sweep confirmed: 512 t=512 and
# 1024 lose or OOM): C=2 11.44 vs 11.63 ms (neutral), C=3 34.33 vs
# 36.29 (-5%), C=4 62.59 vs 75.08 (-17%) — confirming the C>=3 droop
# was code-size-induced schedule degradation (the unrolled C=4 body is
# ~15 x 15k vector ops).  BNTT_ROUND_ROLL=0 selects the unrolled body.
ROUND_ROLL = os.environ.get("BNTT_ROUND_ROLL", "1") == "1"


def _fold_matrix(p: int) -> tuple:
    """4x4 GF(2) matrix of mul-by-p in the height-2 subfield.

    rows[j] = tuple of k with bit j of (p * 2^k) set.
    """
    cols = [ts.multiply(p, 1 << k, 2) for k in range(4)]
    return tuple(
        tuple(k for k in range(4) if (cols[k] >> j) & 1) for j in range(4))


def _planes(tile):
    """(T, W) -> list of W (T,) plane vectors (one 2-D transpose)."""
    t = tile.T
    return [t[i] for i in range(W)]


def _fold_point_planes(low_pl, xh_pl, mat):
    """lower ^ M_p(xh) per 4-plane chunk, in plane-list space (pure XORs)."""
    out = []
    for idx in range(W):
        c, j = idx // 4, idx % 4
        v = low_pl[idx]
        for k in mat[j]:
            v = v ^ xh_pl[4 * c + k]
        out.append(v)
    return out


def _stack_t(pl_list):
    return jnp.stack(pl_list).T          # (T, W)


def _mul_planes_stacked(aT, bT):
    """Multiply two (W, t) plane-stacks -> (W, t) plane-stack."""
    pa = [aT[i] for i in range(W)]
    pb = [bT[i] for i in range(W)]
    return jnp.stack(_mul_planes(pa, pb, HEIGHT))


def _acc_tile_T(accT, t: int):
    """(W, t) plane-stack -> (8, W) XOR-reduced accumulator tile."""
    x = accT.T.reshape(t // 8, 8, W)
    while x.shape[0] > 1:
        half_n = x.shape[0] // 2
        x = x[:half_n] ^ x[half_n:]
    return x[0]


def _work_rolled(lo_ref, up_ref, acc_ref, i, *, c: int, t: int, mats):
    """BNTT_ROUND_ROLL variant of the round-kernel tile body: the column
    loops run as lax.fori_loop with dynamic-start ref reads, so the body
    carries 2 + n_extra multiply instantiations regardless of C (fold
    matrices stay STATIC per point — only columns roll)."""

    def col(ref, cc):
        return ref[pl.ds(cc, 1)][0]          # (t, W), dynamic start

    def comp_rolled(ref):
        def body(cc, accT):
            return _mul_planes_stacked(accT, col(ref, cc).T)

        return jax.lax.fori_loop(1, c, body, ref[0].T)

    def folded_T(lo_t, up_t, mat):
        loT = lo_t.T
        xhT = (lo_t ^ up_t).T
        lo_pl = [loT[k] for k in range(W)]
        xh_pl = [xhT[k] for k in range(W)]
        return jnp.stack(_fold_point_planes(lo_pl, xh_pl, mat))

    a_lo = _acc_tile_T(comp_rolled(lo_ref), t)
    a_up = _acc_tile_T(comp_rolled(up_ref), t)
    accs = [a_lo ^ a_up, a_lo, a_up]
    for mat in mats:
        f0 = folded_T(lo_ref[0], up_ref[0], mat)

        def body(cc, accT, mat=mat):
            return _mul_planes_stacked(
                accT, folded_T(col(lo_ref, cc), col(up_ref, cc), mat))

        accs.append(_acc_tile_T(jax.lax.fori_loop(1, c, body, f0), t))
    new = jnp.stack(accs)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = new

    @pl.when(i != 0)
    def _acc():
        acc_ref[:] = acc_ref[:] ^ new


def round_tile(c: int, b: int) -> int:
    """Row-tile size — MEASURED optimum per composition size (round-5
    sumcheck_tile_ab sweep at 2^24, equality-gated): the column-outer
    body fits t=512 at every c under the 16M scoped-VMEM budget, but the
    runtime optimum still shrinks with c (the c*t input blocks plus the
    2+n_extra running product lists compete with the multiply's ~510-plane
    live set for scheduling room): c=2 -> 512, c=3 -> 256, c=4 -> 128."""
    if _ROUND_T_ENV:
        return min(int(_ROUND_T_ENV), b // 2)
    return min({2: 512, 3: 256}.get(c, 128), b // 2)


@functools.partial(jax.jit, static_argnames=("num_points",))
def round_kernel(evals, rows, *, num_points: int):
    """One sumcheck round over the first `rows` rows of evals (C, B, 128).

    rows: traced int32, must be a multiple of 2 * round_tile(C, B) (the
    prover dispatches smaller rounds to its jnp while_loop kernel).
    Returns (1 + num_points, 128) batch sums [total, p0, p1, p2...].
    """
    c, b, _ = evals.shape
    t = round_tile(c, b)
    grid = b // (2 * t)
    live = rows // (2 * t)               # live tiles this round (>= 1)
    mats = [_fold_matrix(p) for p in range(2, num_points)]  # points >= 2

    # dead grid steps (i >= live) clamp onto the last live block: the block
    # index repeats on consecutive steps, so Pallas skips the re-fetch
    lo_spec = pl.BlockSpec(
        (c, t, W),
        lambda i, lv: (0, jnp.minimum(i, lv[0] - 1), 0),
        memory_space=pltpu.VMEM)
    up_spec = pl.BlockSpec(
        (c, t, W),
        lambda i, lv: (0, jnp.minimum(i + lv[0], 2 * lv[0] - 1), 0),
        memory_space=pltpu.VMEM)
    # accumulator tiles are pre-reduced to 8 sublane rows: keeps the
    # double-buffered output block tiny (grid > 1 doubles block footprints)
    acc_spec = pl.BlockSpec((1 + num_points, 8, W), lambda i, lv: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    def _acc_tile(pl_list):
        # log-step XOR fold over the major axis (lax.reduce has no Pallas
        # TPU lowering)
        x = _stack_t(pl_list).reshape(t // 8, 8, W)
        while x.shape[0] > 1:
            half_n = x.shape[0] // 2
            x = x[:half_n] ^ x[half_n:]
        return x[0]

    def kern(lv_ref, lo_ref, up_ref, acc_ref):
        i = pl.program_id(0)
        lv = lv_ref[0]

        @pl.when(i < lv)
        def _work():
            if ROUND_ROLL:
                _work_rolled(lo_ref, up_ref, acc_ref, i, c=c, t=t,
                             mats=mats)
                return
            # COLUMN-OUTER single pass: each column's plane lists are
            # built exactly once (two tile transposes per column — the
            # minimum) and feed the running products of every output at
            # once.  The live set is the 2 + n_extra running product
            # lists plus one column's lp/up/xh — ~c-independent, unlike
            # the round-4 eager form that held 3c lists simultaneously
            # and forced t down to 256/128 at C=3/4 (costing ~17-25% over
            # the per-multiply bound); a points-outer lazy form was also
            # measured and lost ~11% to re-transposing columns per point.
            comp_lo = comp_up = None
            accs_extra = [None] * len(mats)
            for cc in range(c):
                lp = _planes(lo_ref[cc])
                up = _planes(up_ref[cc])
                if mats:
                    xh = [a ^ b for a, b in zip(lp, up)]
                    for mi, mat in enumerate(mats):
                        f = _fold_point_planes(lp, xh, mat)
                        accs_extra[mi] = (f if cc == 0 else _mul_planes(
                            accs_extra[mi], f, HEIGHT))
                comp_lo = (lp if cc == 0
                           else _mul_planes(comp_lo, lp, HEIGHT))
                comp_up = (up if cc == 0
                           else _mul_planes(comp_up, up, HEIGHT))
            a_lo = _acc_tile(comp_lo)        # == fold at point 0
            a_up = _acc_tile(comp_up)        # == fold at point 1
            # total = XOR over BOTH halves: reduce-then-XOR equals
            # XOR-then-reduce and saves a 128-plane temporary list (the
            # c=3 t=512 kernel was 8 KB over the 16M scoped-VMEM limit
            # with the zip-XOR form)
            accs = [a_lo ^ a_up, a_lo, a_up]
            accs.extend(_acc_tile(a) for a in accs_extra)
            new = jnp.stack(accs)            # (1+P, 8, W)

            @pl.when(i == 0)
            def _init():
                acc_ref[:] = new

            @pl.when(i != 0)
            def _acc():
                acc_ref[:] = acc_ref[:] ^ new

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[lo_spec, up_spec],
        out_specs=acc_spec,
    )
    acc = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1 + num_points, 8, W), jnp.uint32),
    )(jnp.asarray(live, jnp.int32).reshape(1), evals, evals)
    return jax.lax.reduce(acc, jnp.uint32(0), jax.lax.bitwise_xor, (1,))


def fold_tile(c: int, b: int) -> int:
    """Fold-kernel row tile.  The fold is per-column independent, so at
    c >= 3 the kernel grids over (column, row-tile) with (1, t, 128)
    blocks — the block footprint never scales with c and t stays at the
    full T (the round-4 kernel blocked whole (c, t, 128) slabs and
    halved t at c>=3, costing 15-22% exactly where the reference
    struggles, kernels.cu:9-31; per-column sweep: t=1024 beats 512 beats
    256 at every c — 13.85/19.24 ms at C=3/4).  c=2 instead folds BOTH
    columns per grid step in a whole-(2, t, 128) block (fewer, larger
    steps win at small c: the per-column form cost ~7%); whole-block
    t=1024 OOMs scoped VMEM at 18.0M, so c=2 keeps t=512."""
    if _FOLD_T_ENV:
        return min(int(_FOLD_T_ENV), b // 2)
    return min(T if c >= 3 else T // 2, b // 2)


def fold_kernel_impl(evals, coeff_words, rows, *, shrink: bool = False):
    """Challenge fold of the first `rows` rows: (C, B, 128) ->
    (C, B//2 if shrink else B, 128) with rows//2 folded rows at the front
    (the stale tail is never read — same convention as the reference
    folding at original stride, kernels.cu:20-28).

    The prover shrinks exactly ONCE (the first fold), so the whole
    protocol compiles two shapes.  Writing a fresh (smaller) buffer — not
    aliasing in place — matters: evals feeds the kernel twice (lo and up
    views), so XLA must defensively copy around an in-place alias, and at
    2^28 evaluations that transient copy is 8 GB and OOMs the chip (the
    reference's 28-var run died the same way, SURVEY section 4).  Peak is
    instead in+out = 12 GB on the shrinking fold, 8 GB after.

    coeff_words: (4,) uint32 — the 128-bit challenge (constant across the
    array, so its bit-planes are scalars inside the kernel).
    rows: traced int32, multiple of 2 * fold_tile(C, B).
    """
    c, b, _ = evals.shape
    t = fold_tile(c, b)
    grid_b = b // (2 * t)
    live = rows // (2 * t)
    b_out = b // 2 if shrink else b

    # 128 scalar planes: bit i of the challenge -> 0 / 0xFFFFFFFF
    bits = (coeff_words[:, None] >> jnp.arange(32, dtype=jnp.uint32)) & 1
    planes = (jnp.uint32(0) - bits.reshape(W)).reshape(1, W)

    # blocking, measured per composition size (round-5 sweep):
    #   c == 2  -> whole-(c, t, 128) blocks, grid (row-tiles,): both
    #     columns fold in one step (fewer, larger grid steps — the
    #     per-column form costs ~7% at c=2 from doubled step count);
    #   c >= 3  -> per-column (1, t, 128) blocks, grid (c, row-tiles):
    #     the block footprint stays constant in c, so t never shrinks
    #     for larger compositions (the round-4 all-c whole-block form
    #     halved t at c>=3 and cost 15-22% there).
    per_col = c >= 3
    cb = 1 if per_col else c
    lo_spec = pl.BlockSpec(
        (cb, t, W),
        (lambda cc, i, lv: (cc, jnp.minimum(i, lv[0] - 1), 0)) if per_col
        else (lambda i, lv: (0, jnp.minimum(i, lv[0] - 1), 0)),
        memory_space=pltpu.VMEM)
    up_spec = pl.BlockSpec(
        (cb, t, W),
        (lambda cc, i, lv: (cc, jnp.minimum(i + lv[0], 2 * lv[0] - 1), 0))
        if per_col
        else (lambda i, lv: (0, jnp.minimum(i + lv[0], 2 * lv[0] - 1), 0)),
        memory_space=pltpu.VMEM)
    out_spec = lo_spec       # same blocking; dead steps revisit block lv-1
    w_spec = pl.BlockSpec(
        (1, W),
        (lambda cc, i, lv: (0, 0)) if per_col else (lambda i, lv: (0, 0)),
        memory_space=pltpu.VMEM)

    def kern(lv_ref, w_ref, lo_ref, up_ref, out_ref):
        i = pl.program_id(1 if per_col else 0)

        @pl.when(i < lv_ref[0])
        def _work():
            pa = [w_ref[0, i2] for i2 in range(W)]   # scalar planes
            for blk_c in range(cb):
                lo = lo_ref[blk_c]
                xh_pl = _planes(lo ^ up_ref[blk_c])
                prod = _mul_planes(pa, xh_pl, HEIGHT)
                out_ref[blk_c] = lo ^ _stack_t(prod)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c, grid_b) if per_col else (grid_b,),
        in_specs=[w_spec, lo_spec, up_spec],
        out_specs=out_spec,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, b_out, W), jnp.uint32),
    )(jnp.asarray(live, jnp.int32).reshape(1), planes, evals, evals)


# Deliberately NOT donated: evals feeds the kernel twice (lo and up
# views), so XLA guards a donated buffer with a full defensive copy —
# compiled memory analysis shows a buffer-sized temp (512 MB at 2^24
# C=2, one extra HBM read+write per fold) for the donated variant and
# temp=0 without donation, at identical peak (in + out either way).
# The protocol rebinds the buffer every round, so the old input is
# freed as soon as the fold completes regardless.
fold_kernel = jax.jit(fold_kernel_impl, static_argnames=("shrink",))


def round_emulate(evals, *, num_points: int):
    """CPU-testable jnp evaluation of the same round math."""
    c, rows, _ = evals.shape
    half = rows // 2
    lower, upper = evals[:, :half], evals[:, half:]

    def comp(cols):
        from ..fields import bitsliced as bf

        prod = cols[0]
        for cc in range(1, cols.shape[0]):
            prod = bf.multiply(prod, cols[cc], HEIGHT)
        return prod

    def red(x):
        return jax.lax.reduce(x, jnp.uint32(0), jax.lax.bitwise_xor, (0,))

    comp_lo, comp_up = comp(lower), comp(upper)
    out = [red(comp_lo ^ comp_up), red(comp_lo), red(comp_up)]
    xh = lower ^ upper
    for p in range(2, num_points):
        mat = _fold_matrix(p)
        xh4 = xh.reshape(c, half, W // 4, 4)
        folded = lower.reshape(c, half, W // 4, 4)
        acc = []
        for j in range(4):
            v = folded[..., j]
            for k in mat[j]:
                v = v ^ xh4[..., k]
            acc.append(v)
        folded = jnp.stack(acc, axis=-1).reshape(c, half, W)
        out.append(red(comp(folded)))
    return jnp.stack(out)
