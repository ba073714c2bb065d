"""Stage-group-fused Pallas kernel for the GF(2^32) additive NTT.

The compact per-stage path in ntt/additive.py compiles one XLA program per
butterfly stage; XLA:TPU compile time grows superlinearly with tensor size,
so the reference's own headline suite (additive NTT log_h up to 28,
src/ulvt/ntt/tests/test_ntt.cu:219-234) pays hours of one-time compiles at
the top sizes.  This module runs the whole transform as a handful of
pallas_calls with *fixed tile shapes* — compile cost is size-independent —
and, like ntt/pallas_fused.py for GF(2^128), keeps a VMEM-resident tile
across many stages so the transform needs only ~2-3 HBM round-trips.

Packed bit-sliced layout (PACK = 4 blocks per 128-lane row):

  * element e = 32*b + j: bits [4:0] = j (in-word), [6:5] = c, rest = r,
    where block b = 4*r + c;
  * a block of 32 GF(2^32) elements is 32 uint32 bit-planes
    (BitsliceUtils<32> semantics, src/ulvt/utils/bitslicing.cuh:32-47);
  * row r of the packed (nb/4, 128) array holds blocks 4r..4r+3 at lane
    groups [32c, 32c+32) — a plain reshape of the (nb, 32) sliced form.

Stage decomposition (DIT, stages log_h-1 .. 0, additive_ntt.cuh:138-154),
see _group_body32:

  * stages s >= 7 pair rows (bit s-7 of r) — sublane-axis butterflies on
    the row-major tile, multiplies through _mul32 (transpose to
    plane-major and back around each multiply);
  * stages 6 and 5 pair lane groups (bits of c) — major-axis butterflies
    on the plane-major slab view (one tile transpose for the whole low
    section, _cj_stages32);
  * stages s < 5 pair bits inside each word — the masked word-shift
    butterfly of ntt/additive_bitsliced.py.

A fully plane-major variant (row stages as lane-axis butterflies via
pltpu.roll, no per-multiply transposes) was built in round 2 and A/B'd on
the v5e in round 3: it compiled and passed golden but measured 1.5-1.6x
SLOWER than this form (2^24: 21.7 vs 13.7 ms; 2^20: 1.47 vs 0.97 ms —
pm_ab rows in TPU_VALIDATION.jsonl), so it was deleted: long-lane rolls
plus the select/blend chains cost more than the batched 2-D transposes
inside _mul32, which Mosaic handles well at (rows, 128) tile shapes.

Twiddles are GF(2)-linear in the indicator bits (calculate_twiddle,
additive_ntt.cuh:59-77), so each stage needs only a (32,) parity-mask
vector; full twiddle planes are regenerated in VMEM (see pallas_fused.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _mul_planes

W32 = 32
PACK = 4             # bit-sliced blocks packed per 128-lane row
N_LOW = 7            # stages 6..0 run in the plane-major section

# tile knobs (see pallas_fused.py): bottom tiles (2^KB, 128) words, upper
# tiles (2^KU, PT, 128).  Mosaic's scoped-vmem stack holds ~20x the tile
# through the stage chain: KU=9 (2MB upper tiles) hit 19.9M at 2^27 —
# 1MB tiles are the ceiling (cf. pallas_fused_bb31.py).
KB = 11
KU = 8
PT = 8

_LANE_MASKS = (0x55555555, 0x33333333, 0x0F0F0F0F, 0x00FF00FF, 0x0000FFFF)


def _bit_masks32(constants, offset: int, count: int) -> np.ndarray:
    """mask[i] = sum_m bit_i(constants[offset+m]) << m   (shape (32,))."""
    out = np.zeros(W32, dtype=np.uint32)
    for m in range(max(count, 0)):
        c = int(constants[offset + m])
        for i in range(W32):
            if (c >> i) & 1:
                out[i] |= np.uint32(1 << m)
    return out


def _mul32_pm(wa, vb):
    """Plane-major multiply: wa broadcastable to vb, both (..., 32, n).

    Like _mul32, the circuit runs on dense (size/128, 128) plane tiles:
    the natural (2, kk) planes of the low-stage section leave 6 of 8
    sublanes dead (mul32_shape_ab device A/B; PERF.md rule 6).  The
    reshape keeps the 128-lane minor axis intact (kk % 128 == 0), which
    Mosaic accepts; odd-size planes fall back to the natural shape."""
    shp = jnp.broadcast_shapes(wa.shape, vb.shape)
    bshape = shp[:-2] + shp[-1:]            # one bit-plane's shape
    size = int(np.prod(bshape))
    if size % 128 == 0:
        def planes(x):
            x = jnp.broadcast_to(x, shp)
            return [x[..., i, :].reshape(size // 128, 128)
                    for i in range(W32)]
        out = _mul_planes(planes(wa), planes(vb), 5)
        return jnp.stack([o.reshape(bshape) for o in out], axis=-2)
    pa = [wa[..., i, :] for i in range(W32)]
    pb = [vb[..., i, :] for i in range(W32)]
    out = _mul_planes(pa, pb, 5)
    return jnp.stack(out, axis=-2)


def _parity_pm(idx, mask):
    """Plane-major parity planes: idx (kk,), mask (32,) -> (32, kk)."""
    x = idx[None, :] & mask[:, None]
    x = x ^ (x >> 16)
    x = x ^ (x >> 8)
    x = x ^ (x >> 4)
    x = x ^ (x >> 2)
    x = x ^ (x >> 1)
    return jnp.uint32(0) - (x & jnp.uint32(1))


def _parity_scalar_pm(q, mask):
    """Parity planes of a scalar index: q uint32, mask (32,) -> (32, 1)."""
    x = q & mask
    x = x ^ (x >> 16)
    x = x ^ (x >> 8)
    x = x ^ (x >> 4)
    x = x ^ (x >> 2)
    x = x ^ (x >> 1)
    return (jnp.uint32(0) - (x & jnp.uint32(1)))[:, None]


def bitslice_lane_groups_pallas(xp, *, tile: int = 2048):
    """Pallas version of additive._bitslice_lane_groups: the 32x32 bit
    transpose within each aligned 32-lane group of (R, 128), as ONE kernel
    pass.  The jnp lane-roll ladder materialises ~10 full-array
    intermediates in HBM (rolls break XLA fusion) — 10+ GB at 2^28; here
    each tile stays in VMEM through all five levels."""
    n, _ = xp.shape
    t = min(tile, n)
    grid = (n // t,)
    bspec = pl.BlockSpec((t, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    def kern(x_ref, o_ref):
        v = x_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.uint32, (1, 128), 1)
        m = 0x0000FFFF
        j = 16
        while j:
            low = (lane & jnp.uint32(j)) == 0
            # pltpu.roll requires non-negative shifts: -j == 128 - j
            tl = ((v >> j) ^ pltpu.roll(v, 128 - j, 1)) & jnp.uint32(m)
            v = jnp.where(low, v ^ (tl << j), v ^ pltpu.roll(tl, j, 1))
            j >>= 1
            if j:
                m = (m ^ (m << j)) & 0xFFFFFFFF
        o_ref[:] = v

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        input_output_aliases={0: 0},
    )(xp)


def plan_groups32(log_nbr: int) -> list[tuple[int, int, bool]]:
    """Split packed-row index bits into (t0, k, include_low) groups."""
    groups = []
    kb = min(log_nbr, KB)
    groups.append((0, kb, True))
    t0 = kb
    while t0 < log_nbr:
        k = min(log_nbr - t0, KU)
        groups.append((t0, k, False))
        t0 += k
    return groups


def make_group_tables32(rows, log_h: int, log_rate: int, t0: int, k: int,
                        include_low: bool):
    """Parity-mask tables for one stage group (host-side, numpy).

    rows: precompute_subspace_evals(log_h, log_rate, 5) (python ints).
    Row-pairing stage s = 7 + t0 + rbit has indicator
    coset << (log_h-1-s) | (r >> (rbit+1) within-group bits first); the
    twiddle is c-independent, so one (32,) plane mask serves all slabs.
    """
    mtile, minst = [], []
    zero = []
    # high (row-pairing) stages s = 7+t0+k-1 .. 7+t0, descending.  Masks
    # are plane-major (32,) — the kernel consumes them via _parity_pm on
    # the tile's lane (= packed-row) index.
    for rbit in range(k - 1, -1, -1):
        s = 7 + t0 + rbit
        m0 = k - 1 - rbit          # tile bits in the butterfly-block index
        nbits = log_h + log_rate - 1 - s
        mt = _bit_masks32(rows[s], 0, min(m0, nbits))
        mi = _bit_masks32(rows[s], m0, max(nbits - m0, 0))
        mtile.append(mt)
        minst.append(mi)
        zero.append(not mt.any() and not mi.any())
    mtile = (np.stack(mtile) if mtile
             else np.zeros((0, W32), dtype=np.uint32))
    minst = (np.stack(minst) if minst
             else np.zeros((0, W32), dtype=np.uint32))

    if not include_low:
        return dict(mtile=mtile, minst=minst, zero=tuple(zero))

    # low stages 6..0: r enters the indicator at a stage-dependent offset,
    # c contributes per-lane-group constants, j contributes true bit-planes
    mlo_t = np.zeros((N_LOW, W32), dtype=np.uint32)
    mlo_i = np.zeros((N_LOW, W32), dtype=np.uint32)
    cpl = np.zeros((N_LOW, PACK, W32), dtype=np.uint32)
    lpl = np.zeros((N_LOW, W32), dtype=np.uint32)
    for i, s in enumerate(range(6, -1, -1)):
        if s > log_h - 1:
            zero.append(True)      # unreachable for log_h >= 7
            continue
        nbits = log_h + log_rate - 1 - s
        if s == 6:
            r_off = 0
            c_bits = ()
        elif s == 5:
            r_off = 1
            c_bits = (None, 0)     # c bit 1 -> indicator bit 0
        else:
            r_off = 6 - s
            c_bits = (4 - s, 5 - s)  # c bits 0,1 -> indicator bits 4-s,5-s
            lane_bits = min(4 - s, nbits)
            for j in range(32):
                v = 0
                jj = j >> (s + 1)
                for m in range(lane_bits):
                    if (jj >> m) & 1:
                        v ^= rows[s][m]
                for p in range(W32):
                    if (v >> p) & 1:
                        lpl[i, p] |= np.uint32(1 << j)
        mlo_t[i] = _bit_masks32(rows[s], r_off,
                                min(k, max(nbits - r_off, 0)))
        mlo_i[i] = _bit_masks32(rows[s], r_off + k,
                                max(nbits - r_off - k, 0))
        for c in range(PACK):
            v = 0
            for t, pos in enumerate(c_bits):
                if pos is None:
                    continue
                if (c >> t) & 1 and pos < nbits:
                    v ^= rows[s][pos]
            for p in range(W32):
                if (v >> p) & 1:
                    cpl[i, c, p] = np.uint32(0xFFFFFFFF)
        zero.append(not mlo_t[i].any() and not mlo_i[i].any()
                    and not cpl[i].any() and not lpl[i].any())

    return dict(mtile=mtile, minst=minst, mlo_t=mlo_t, mlo_i=mlo_i,
                cpl=cpl, lpl=lpl, zero=tuple(zero))



def _cj_stages32(xT, q, tabs, *, kk: int, st: int):
    """The c-bit (stages 6, 5) and in-word (4..0) section on the
    plane-major (PACK, 32, kk) view; returns the row-major tile.
    Shared by the plane-major and row-major group bodies."""
    zero = tabs["zero"]
    jt2 = jax.lax.broadcasted_iota(jnp.uint32, (kk,), 0)

    def low_w(i):
        return (_parity_pm(jt2, tabs["mlo_t"][i])
                ^ _parity_scalar_pm(q, tabs["mlo_i"][i]))

    # stage 6: pair c bit 1 -> axis 0 of the (2, 2, 32, kk) view
    x4 = xT.reshape(2, 2, W32, kk)
    u, v = x4[0], x4[1]
    if zero[st]:
        u2 = u
    else:
        u2 = u ^ _mul32_pm(low_w(0)[None], v)
    v2 = u2 ^ v
    xT = jnp.stack([u2, v2], axis=0).reshape(PACK, W32, kk)
    st += 1

    # stage 5: pair c bit 0 -> axis 1; twiddle depends on c bit 1
    x4 = xT.reshape(2, 2, W32, kk)
    u, v = x4[:, 0], x4[:, 1]
    if zero[st]:
        u2 = u
    else:
        cw = tabs["cpl"][1].reshape(2, 2, W32)[:, 0]       # (2, 32) by c1
        u2 = u ^ _mul32_pm(low_w(1)[None] ^ cw[:, :, None], v)
    v2 = u2 ^ v
    xT = jnp.stack([u2, v2], axis=1).reshape(PACK, W32, kk)
    st += 1

    # stages 4..0: in-word butterflies (masked word shifts).  Only the
    # u-slots of the product matter, so PAIRS along the c axis pack their
    # v-values into one composite multiply — half the multiplies of the
    # naive form (same trick as pallas_fused._group_body's low stages)
    for i, s in enumerate(range(4, -1, -1), start=2):
        shift = 1 << s
        um = jnp.uint32(_LANE_MASKS[s])
        vm = jnp.uint32((_LANE_MASKS[s] << shift) & 0xFFFFFFFF)
        x2 = xT.reshape(2, 2, W32, kk)
        x0, x1 = x2[:, 0], x2[:, 1]          # (2, 32, kk) by c parity
        if zero[st]:
            un0, un1 = x0, x1
        else:
            wt = (low_w(i)[None]
                  ^ tabs["cpl"][i][:, :, None]
                  ^ tabs["lpl"][i][None, :, None])
            w2 = wt.reshape(2, 2, W32, kk)
            w0, w1 = w2[:, 0], w2[:, 1]
            comp = ((x0 >> shift) & um) | (x1 & vm)
            wcmp = (w0 & um) | ((w1 & um) << shift)
            prod = _mul32_pm(wcmp, comp)
            un0 = x0 ^ (prod & um)
            un1 = x1 ^ ((prod & vm) >> shift)
        y0 = (un0 & um) | ((x0 ^ (un0 << shift)) & vm)
        y1 = (un1 & um) | ((x1 ^ (un1 << shift)) & vm)
        xT = jnp.stack([y0, y1], axis=1).reshape(PACK, W32, kk)
        st += 1

    return xT.reshape(128, kk).T.reshape(kk, 1, 128)


def _group_body32(xt, q, tabs, *, k: int, pt: int, include_low: bool,
                  zero: tuple, emulate: bool = False):
    """Stage-group math on one VMEM tile: xt (2^k, pt, 128), q uint32.

    Pure jnp — called from the Pallas kernel and (vmapped) from the CPU
    emulation used by the tests.  Row-pairing stages butterfly on the
    sublane axis with multiplies through _mul32 (plane-major transposes
    batched inside the multiply); this won the round-3 device A/B against
    the fully plane-major roll-based variant (see module docstring)."""
    kk = 1 << k
    jt = jax.lax.broadcasted_iota(jnp.uint32, (kk,), 0)

    st = 0
    for rbit in range(k - 1, -1, -1):
        blocks = 1 << (k - 1 - rbit)
        span = 1 << rbit
        xv = xt.reshape(blocks, 2, span * pt, 128)
        u = xv[:, 0].reshape(blocks * span * pt, 128)
        v = xv[:, 1].reshape(blocks * span * pt, 128)
        if zero[st]:
            u2 = u
        else:
            wpm = (_parity_pm(jt >> (rbit + 1), tabs["mtile"][st])
                   ^ _parity_scalar_pm(q, tabs["minst"][st]))   # (32, kk)
            wfull = jnp.tile(wpm.T, (1, PACK))                  # (kk, 128)
            # twiddle of the u element at tile index depends only on bits
            # above rbit -> one value per butterfly block
            wu = wfull.reshape(blocks, 2, span, 128)[:, 0]
            wB = jnp.broadcast_to(wu[:, :, None, :], (blocks, span, pt, 128))
            u2 = u ^ _mul32(wB.reshape(blocks * span * pt, 128), v)
        v2 = u2 ^ v
        xt = jnp.concatenate(
            [u2.reshape(blocks, 1, span * pt, 128),
             v2.reshape(blocks, 1, span * pt, 128)], axis=1
        ).reshape(kk, pt, 128)
        st += 1

    if not include_low:
        return xt

    assert pt == 1
    xT = xt.reshape(kk, 128).T.reshape(PACK, W32, kk)   # [c, p, r]
    return _cj_stages32(xT, q, tabs, kk=kk, st=st)


def _mul32(a, b):
    """Bit-sliced GF(2^32) multiply on packed (N, 128) rows: transposes to
    plane-major and runs the straight-line circuit on dense (4N/128, 128)
    bit planes.  The plane SHAPE matters: (PACK, N) planes leave 4 of 8
    sublanes dead (PERF.md rule 6 — Mosaic pads short minor-2 axes), and
    the round-3 device A/B (tools/mul32_shape_ab.py, suite mul32_shape_ab)
    measured the dense 2-D form at 1.36 vs 2.56 us per tile-multiply —
    1.88x — with the extra 3-D transposes included."""
    n = a.shape[0]
    if (PACK * n) % 128 == 0:
        def fwd(x):
            t = x.T.reshape(PACK, W32, n).transpose(1, 0, 2)   # (32, 4, n)
            return t.reshape(W32, (PACK * n) // 128, 128)
        at, bt = fwd(a), fwd(b)
        out = jnp.stack(_mul_planes([at[i] for i in range(W32)],
                                    [bt[i] for i in range(W32)], 5))
        return (out.reshape(W32, PACK, n).transpose(1, 0, 2)
                .reshape(PACK * W32, n).T)
    # tiny-tile fallback (n < 32): keep the (PACK, n) plane form
    at = a.T.reshape(PACK, W32, n)
    bt = b.T.reshape(PACK, W32, n)
    pa = [at[:, i] for i in range(W32)]
    pb = [bt[:, i] for i in range(W32)]
    out = _mul_planes(pa, pb, 5)
    return jnp.stack(out, axis=1).reshape(PACK * W32, n).T


def stage_group32(x, tabs, *, t0: int, k: int, include_low: bool,
                  cosets: int, log_nbr: int, emulate: bool = False):
    """One stage group over x: (cosets, nbr, 128) -> same shape."""
    pre = 1 << (log_nbr - t0 - k)
    post = 1 << t0
    pt = min(PT, post)
    n_inst = cosets * pre
    kk = 1 << k

    x5 = x.reshape(n_inst, kk, post, 128)
    body = functools.partial(_group_body32, k=k, pt=pt,
                             include_low=include_low, zero=tabs["zero"],
                             emulate=emulate)
    tab_arrays = [tabs["mtile"], tabs["minst"]]
    if include_low:
        tab_arrays += [tabs["mlo_t"], tabs["mlo_i"], tabs["cpl"], tabs["lpl"]]
    names = (["mtile", "minst"]
             + (["mlo_t", "mlo_i", "cpl", "lpl"] if include_low else []))

    if emulate:
        xt = x5.reshape(n_inst, kk, post // pt, pt, 128).transpose(
            0, 2, 1, 3, 4)
        qs = jnp.arange(n_inst, dtype=jnp.uint32)
        fn = jax.vmap(jax.vmap(
            lambda t, q: body(t, q, dict(zip(names, tab_arrays),
                                         zero=tabs["zero"])),
            in_axes=(0, None)), in_axes=(0, 0))
        out = fn(xt, qs)
        out = out.transpose(0, 2, 1, 3, 4).reshape(x5.shape)
        return out.reshape(x.shape)

    grid = (n_inst, post // pt)
    bspec = pl.BlockSpec((1, kk, pt, 128), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM)
    tspecs = [pl.BlockSpec(a.shape, lambda i, j, nd=a.ndim: (0,) * nd,
                           memory_space=pltpu.VMEM) for a in tab_arrays]

    def kern(*refs):
        tab_refs, x_ref, out_ref = refs[:-2], refs[-2], refs[-1]
        td = dict(zip(names, (r[:] for r in tab_refs)), zero=tabs["zero"])
        q = pl.program_id(0).astype(jnp.uint32)
        out_ref[0] = body(x_ref[0], q, td)

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


def apply_fused32(data, tables, *, log_h: int, log_rate: int,
                  emulate: bool = False):
    """Full transform: data (nbr, 128) packed-sliced -> (cosets*nbr, 128).

    tables: tuple of per-group (t0, k, include_low, tabs) from
    build_tables32(), ordered top group first (DIT: high stages first).
    """
    nbr = data.shape[0]
    cosets = 1 << log_rate
    log_nbr = log_h - 7
    x = jnp.broadcast_to(data[None], (cosets, nbr, 128))
    for (t0, k, include_low, tabs) in tables:
        x = stage_group32(x, tabs, t0=t0, k=k, include_low=include_low,
                          cosets=cosets, log_nbr=log_nbr, emulate=emulate)
    return x.reshape(cosets * nbr, 128)


def build_tables32(rows, log_h: int, log_rate: int):
    """Per-group mask tables, ordered for execution (top group first)."""
    assert log_h >= 7, "packed layout needs >= 4 bit-sliced blocks"
    out = []
    for (t0, k, include_low) in reversed(plan_groups32(log_h - 7)):
        tabs = make_group_tables32(rows, log_h, log_rate, t0, k, include_low)
        out.append((t0, k, include_low,
                    {kk: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
                     for kk, v in tabs.items()}))
    return tuple(out)
