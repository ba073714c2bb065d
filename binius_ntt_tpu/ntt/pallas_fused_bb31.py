"""Stage-group-fused Pallas kernel for the radix-2 BB31 NTT.

Same motivation as ntt/pallas_fused32.py: the per-stage jit path compiles
one XLA program per butterfly stage with superlinear compile cost at large
sizes (src ref: NTT<E>::apply launches one kernel per <= 11 stages,
src/ulvt/ntt/gpuntt.cuh:170-178).  This module runs the whole DIF ladder
(gpuntt.cuh:65-124) in ceil(log_n / group) pallas_calls with fixed tile
shapes — compile cost is size-independent and each pass reads/writes HBM
once.

Unlike the additive NTT, radix-2 twiddles are multiplicative powers (not
GF(2)-linear), so they cannot be regenerated from parity masks in VMEM.
Instead they are *streamed*: because the twiddle table is stored in
bit-reversed order (gpuntt.cuh:139-143), the stage-s vector is its first
n/2^(s+1) entries and every tile's share is a contiguous slice — each
stage's twiddles arrive through their own BlockSpec with a plain
(instance, 0) index map.  Lane-stage twiddles are host-expanded to full
(r, j) planes (one tile-read of HBM per lane stage, ~7 extra tile reads
for the bottom group) so the kernel never reshapes across lanes — Mosaic
rejects lane-splitting reshapes, so the repeat cannot move in-kernel;
row stages stream the compact slices (~1 extra tile read total).
Capacity cost of the expansion: the 7 lane tables each hold n words, so
an NTTRadix2 instance carries ~7n x 4 B of twiddle planes (3.5 GB at the
class's maximum log_n = 27; a forward+inverse pair ~7 GB) — within the
16 GB v5e budget at every size the constructor accepts, and bought a
2.9x transform speedup (PERF.md BB31 section).

Layout: element e = 128*r + j sits at row r, lane j of the (n/128, 128)
array (after the input bit-reversal gather, gpuntt.cuh:163-168).  DIF
stages ascend:

  * stages 0..6 pair lanes (bit s of j) — static pltpu.roll brings the
    partner onto its mate's lane, a lane-parity select routes adds to u
    lanes and (u-v)*w products to v lanes, all in the natural (rows,
    128) layout (mont_mul is elementwise, so nothing needs transposing);
  * stages >= 7 pair rows (bit s-7 of r) — bottom group covers the low
    row bits on consecutive-row tiles, upper groups stride (the same
    (pre, 2^k, post) reshape as the additive fused kernels).

Montgomery encode of the canonical input is folded into the bottom
kernel and decode into the last kernel, so neither costs an HBM pass.
The top stage multiplies by tw[0] = enc(1) and skips the multiply.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import baby_bear as bb

N_LANE = 7            # stages 0..6 are lane-local

# tile knobs: bottom tiles (2^KB, 128) words; upper tiles (2^KU, PT, 128).
# Mosaic's scoped-VMEM stack holds ~25 tile-sized temporaries through the
# stage chain (measured: KB=12 -> 53M scoped vs the 16M v5e limit), so
# tiles stay at 1MB despite the butterfly's tiny live set.
# KB=10 compiled at 2^20/2^24 but hit 20.5M scoped vmem at the single-
# instance boundary size 2^17 (Mosaic allocates more without grid
# pipelining headroom) — KB=9 holds everywhere.
KB = 9
KU = 8
PT = 8          # second-to-last block dim must be divisible by 8


def plan_groups_r2(log_rows: int) -> list[tuple[int, int, bool]]:
    """Split row-index bits into (t0, k, include_lanes) groups, in
    execution order (DIF ascends, so the lane-stage group comes first)."""
    groups = []
    kb = min(log_rows, KB)
    groups.append((0, kb, True))
    t0 = kb
    while t0 < log_rows:
        k = min(log_rows - t0, KU)
        groups.append((t0, k, False))
        t0 += k
    return groups


def build_tables_r2(tw_mont: np.ndarray, log_n: int):
    """Per-group streamed twiddle tables (host-side).

    tw_mont: the (n/2,) bit-reversed Montgomery twiddle table
    (gpuntt.cuh:139-143).  Returns groups in execution order:
    (t0, k, include_lanes, lane_tws tuple, row_tws tuple, skip_flags).
    """
    assert log_n >= 7
    n = 1 << log_n
    rows_total = n >> 7
    tw = np.asarray(tw_mont)
    out = []
    for (t0, k, include_lanes) in plan_groups_r2(log_n - 7):
        n_inst = rows_total >> (t0 + k)
        lane_tws = ()
        if include_lanes:
            r_tile = 1 << k          # bottom tile rows (consecutive)
            lane_list = []
            for s in range(N_LANE):
                nb = n >> (s + 1)
                m_hi = 1 << (6 - s)
                # full (r, j) twiddle planes: w[inst, r, j] =
                # tw[(inst*r_tile + r) * m_hi + (j >> (s+1))].  Expanding
                # on host costs one extra tile-read of HBM per stage but
                # lets the kernel butterfly lanes in the NATURAL (rows,
                # 128) layout with static rolls — the transposed
                # strided-sublane form this replaced measured ~12x slower
                # per stage than a row butterfly (bb31_profile rows).
                base = tw[:nb].reshape(n_inst, r_tile, m_hi)
                lane_list.append(jnp.asarray(
                    np.repeat(base, 1 << (s + 1), axis=2)))
            lane_tws = tuple(lane_list)
        row_list = []
        skip = []
        for rb in range(k):
            s = 7 + t0 + rb
            nb = n >> (s + 1)
            skip.append(nb == 1)     # top stage: tw[0] = enc(1), pure sub
            q = max(nb // n_inst, 1)
            # pre-broadcast across the 128 lanes: the kernel consumes
            # (q, 128) directly with a middle-axis insert only
            row_list.append(jnp.asarray(np.broadcast_to(
                tw[:nb].reshape(n_inst, q)[:, :, None],
                (n_inst, q, 128)).copy()))
        out.append((t0, k, include_lanes, lane_tws, tuple(row_list),
                    tuple(skip)))
    return tuple(out)


def _r2_body(xt, lane_tws, row_tws, *, k: int, pt: int, include_lanes: bool,
             skip: tuple, encode_in: bool, decode_out: bool,
             emulate: bool = False):
    """Stage-group math on one VMEM tile: xt (2^k, pt, 128).

    lane_tws[s]: (2^k, 128) expanded twiddle planes for lane stage s;
    row_tws[rb]: (2^(k-rb-1), 128) (>= length 1) for row stage rb.
    Pure jnp apart from pltpu.roll (jnp.roll under ``emulate``) — called
    from the Pallas kernel and the CPU emulation.
    """
    kk = 1 << k
    if encode_in:
        xt = bb.mont_mul(xt, jnp.uint32(bb.R2))

    def _roll(x, sh, axis=1):
        if emulate:
            return jnp.roll(x, sh, axis=axis)
        return pltpu.roll(x, sh, axis=axis)

    if include_lanes:
        assert pt == 1
        # lane butterflies in the NATURAL (rows, 128) layout: the partner
        # at lane distance 2^s arrives by a static cyclic roll, and the
        # lane-parity select keeps u lanes on the add and v lanes on the
        # multiply.  mont_mul is elementwise (prime field, not
        # bit-sliced), so no transpose is ever needed; the multiply runs
        # over the full tile but its u-lane results are discarded —
        # cheaper than the strided-sublane halves of the transposed form
        # it replaced (bb31_profile: 18.7 ms -> see PERF.md).
        xf = xt.reshape(kk, 128)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (1, 128), 1)

        for s in range(N_LANE):
            span = 1 << s
            is_u = (lane & jnp.uint32(span)) == 0
            p = _roll(xf, span)            # x[j - span] at lane j
            q = _roll(xf, 128 - span)      # x[j + span] at lane j
            big_v = bb.mont_mul(bb.sub(p, xf), lane_tws[s])
            xf = jnp.where(is_u, bb.add(xf, q), big_v)
        xt = xf.reshape(kk, pt, 128)

    if pt == 1:
        # Bottom-group row stages on the clean 2-D (kk, 128) view, same
        # roll+select scheme as the lane stages above.  The (kk, 1, 128)
        # pt=1 tile shape the previous form used pads every vreg 8x in
        # Mosaic: the identical 6 stages measured 1.07 ms tiled (.., 8,
        # 128) vs ~8 ms at pt=1 (bb31_profile experiments) — so never
        # give the compiler a unit minor-2 axis.  Compact twiddle tables
        # expand in VMEM by a sublane broadcast-reshape (w_plane[r] =
        # base[r >> (rb+1)]).
        xf = xt.reshape(kk, 128)
        riota = jax.lax.broadcasted_iota(jnp.uint32, (kk, 1), 0)
        for rb in range(k):
            span = 1 << rb
            is_u = (riota & jnp.uint32(span)) == 0
            p = _roll(xf, span, 0)             # x[r - span] at row r
            qv = _roll(xf, kk - span, 0)       # x[r + span] at row r
            d = bb.sub(p, xf)
            if skip[rb]:
                big_v = d                      # tw[0] = enc(1)
            else:
                q2 = kk >> (rb + 1)
                w = jnp.broadcast_to(
                    row_tws[rb][:q2][:, None, :],
                    (q2, kk // q2, 128)).reshape(kk, 128)
                big_v = bb.mont_mul(d, w)
            xf = jnp.where(is_u, bb.add(xf, qv), big_v)
        xt = xf.reshape(kk, pt, 128)
    else:
        for rb in range(k):
            q = kk >> (rb + 1)
            span = (1 << rb) * pt
            v4 = xt.reshape(q, 2, span, 128)
            u, v = v4[:, 0], v4[:, 1]
            big_u = bb.add(u, v)
            d = bb.sub(u, v)
            if skip[rb]:
                big_v = d                        # tw[0] = enc(1)
            else:
                w = row_tws[rb][:q][:, None, :]  # (q, 1, 128) pre-broadcast
                big_v = bb.mont_mul(d, w)
            xt = jnp.stack([big_u, big_v], axis=1).reshape(kk, pt, 128)

    if decode_out:
        xt = bb.mont_mul(xt, jnp.uint32(1))
    return xt


def stage_group_r2(x, lane_tws, row_tws, *, t0: int, k: int,
                   include_lanes: bool, skip: tuple, log_n: int,
                   encode_in: bool, decode_out: bool,
                   emulate: bool = False):
    """One stage group over x: (rows_total, 128) -> same shape."""
    rows_total = (1 << log_n) >> 7
    pre = rows_total >> (t0 + k)
    post = 1 << t0
    pt = min(PT, post)
    kk = 1 << k

    x5 = x.reshape(pre, kk, post, 128)
    body = functools.partial(_r2_body, k=k, pt=pt,
                             include_lanes=include_lanes, skip=skip,
                             encode_in=encode_in, decode_out=decode_out,
                             emulate=emulate)
    tab_arrays = list(lane_tws) + list(row_tws)
    n_lane = len(lane_tws)

    def split(tabs):
        return tabs[:n_lane], tabs[n_lane:]

    if emulate:
        xt = x5.reshape(pre, kk, post // pt, pt, 128).transpose(0, 2, 1, 3, 4)
        fn = jax.vmap(jax.vmap(
            lambda t, tabs: body(t, *split(tabs)),
            in_axes=(0, None)), in_axes=(0, 0))
        out = fn(xt, [a for a in tab_arrays])
        out = out.transpose(0, 2, 1, 3, 4).reshape(x5.shape)
        return out.reshape(x.shape)

    grid = (pre, post // pt)
    bspec = pl.BlockSpec((1, kk, pt, 128), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM)
    tspecs = [pl.BlockSpec((1,) + a.shape[1:],
                           lambda i, j, nd=a.ndim: (i,) + (0,) * (nd - 1),
                           memory_space=pltpu.VMEM) for a in tab_arrays]

    def kern(*refs):
        tab_refs, x_ref, out_ref = refs[:-2], refs[-2], refs[-1]
        tabs = [r[0] for r in tab_refs]
        out_ref[0] = body(x_ref[0], *split(tabs))

    n_in = len(tab_arrays) + 1
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=tspecs + [bspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct(x5.shape, x5.dtype),
        input_output_aliases={n_in - 1: 0},
    )(*tab_arrays, x5)
    return out.reshape(x.shape)


def split_tables_r2(tables):
    """(static_structure, array_pytree): the arrays must be passed as jit
    ARGUMENTS — closed over, they embed as program constants and the
    serialized MLIR blows the remote-compile request limit at 2^26+
    (HTTP 413; the streamed tables are O(n) words)."""
    static = tuple((t0, k, il, skip)
                   for (t0, k, il, _, _, skip) in tables)
    arrays = tuple((lane_tws, row_tws)
                   for (_, _, _, lane_tws, row_tws, _) in tables)
    return static, arrays


def apply_fused_r2(x, arrays, *, static, log_n: int, emulate: bool = False):
    """Full transform AFTER bit-reversal: x (n,) canonical uint32 ->
    (n,) canonical IN_ORDER output.  Encode/decode run inside the first/
    last kernels.  static/arrays from split_tables_r2(build_tables_r2())."""
    rows_total = (1 << log_n) >> 7
    xt = x.reshape(rows_total, 128)
    last = len(static) - 1
    for gi, ((t0, k, include_lanes, skip), (lane_tws, row_tws)) in enumerate(
            zip(static, arrays)):
        xt = stage_group_r2(
            xt, lane_tws, row_tws, t0=t0, k=k, include_lanes=include_lanes,
            skip=skip, log_n=log_n, encode_in=(gi == 0),
            decode_out=(gi == last), emulate=emulate)
    return xt.reshape(1 << log_n)
