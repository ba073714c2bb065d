"""Fused Pallas TPU kernels for the QM31 sumcheck round and fold.

The reference fuses the whole QM31 round into one kernel
(prime_field_sumcheck/core/kernels.cu:27-78: per-thread lazy u64 partial
sums + atomicAdd) and folds with a second kernel (kernels.cu:5-25).  This
is the TPU analogue of that pair, built the same way as the binary-field
fused round (sumcheck/pallas_round.py): one pallas_call per round with
partial sums accumulated in VMEM, one for the challenge fold, and
fixed-shape scalar-prefetch dispatch so ONE compile serves every round of
a protocol.

TPU-first choices (none of these exist in the reference):

  * **Planar component layout** ``(2, 4, B/128, 128)`` — each M31
    component of each column is its own contiguous bit-plane, so every
    field op runs on full (8, 128) vector registers.  The reference's
    AoS ``(2, B, 4)`` layout (qm31.cuh:8-18) would waste 31/32 lanes of
    every VPU op on TPU.
  * **Karatsuba at both extension levels**: a QM31 product costs 9 M31
    multiplies (3 CM31 Karatsuba muls, each 3 M31 Karatsuba muls) vs the
    reference's 16 schoolbook muls (cm31.cuh:48-53 has no Karatsuba
    either).  M31 multiplies dominate (each is 4 u32 limb products +
    the Mersenne fold), so this is a ~1.7x ALU cut on the hot path.
  * **Lazy-alias modular reduction tree** replacing atomicAdd: partial
    sums use the branchless fold ``(s + (s >> 31)) & P``, which may leave
    the ``P`` alias of zero; the alias self-corrects under further adds
    and is canonicalised once at the very end — bit-identical to the
    reference's deferred u64 accumulation (qm31.cuh:75-78) because
    addition mod P is associative/commutative.

Dispatch contract mirrors pallas_round.py: the buffer keeps its full
planar shape for the whole protocol, the live row count arrives as a
scalar-prefetch argument, dead grid steps clamp onto the last live block
(repeated block index -> Pallas skips the DMA) and are predicated off the
accumulators.  Rounds too small to fill one tile fall back to the
prover's jnp fixed-shape kernels on the AoS layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.m31 import P, m31_add, m31_mul, m31_sub

__all__ = [
    "LANES", "TB",
    "planar_from_aos", "aos_from_planar",
    "qm31_mul_planar", "round_kernel", "round_kernel_impl",
    "fold_kernel", "fold_kernel_impl",
    "round_emulate", "fold_emulate",
]

LANES = 128     # minor-axis width of the planar layout (one vreg row)
TB = 128        # planar rows per tile -> 16384 elements / tile / half


def _madd_lazy(a, b):
    """Alias-tolerant (a + b) mod P: may return P for 0; self-correcting
    under further adds (cf. _m31_add_monoid, sumcheck/prime_field.py)."""
    s = a + b
    return (s + (s >> 31)) & jnp.uint32(P)


def _canon(x):
    return jnp.where(x == jnp.uint32(P), jnp.uint32(0), x)


def _cm31_mul_kara(ax, ay, bx, by):
    """(ax + ay i)(bx + by i), i^2 = -1, via Karatsuba: 3 M31 muls.

    re = ax bx - ay by;  im = (ax + ay)(bx + by) - ax bx - ay by.
    """
    t0 = m31_mul(ax, bx)
    t1 = m31_mul(ay, by)
    t2 = m31_mul(m31_add(ax, ay), m31_add(bx, by))
    return m31_sub(t0, t1), m31_sub(t2, m31_add(t0, t1))


def qm31_mul_planar(a, b):
    """QM31 product over component 4-tuples of same-shape uint32 arrays.

    (u + vj)(s + tj) = (us + R vt) + ((u+v)(s+t) - us - vt) j, R = 2 + i
    (qm31.cuh:6,38-43) — 9 M31 multiplies total.
    """
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    us = _cm31_mul_kara(ax, ay, bx, by)
    vt = _cm31_mul_kara(az, aw, bz, bw)
    st = _cm31_mul_kara(m31_add(ax, az), m31_add(ay, aw),
                        m31_add(bx, bz), m31_add(by, bw))
    c_re = m31_sub(st[0], m31_add(us[0], vt[0]))
    c_im = m31_sub(st[1], m31_add(us[1], vt[1]))
    rvt_re = m31_sub(m31_add(vt[0], vt[0]), vt[1])
    rvt_im = m31_add(vt[0], m31_add(vt[1], vt[1]))
    return (m31_add(us[0], rvt_re), m31_add(us[1], rvt_im), c_re, c_im)


# ---- layout converters (called once per protocol + once at the tail) ----

def planar_from_aos(evals):
    """(2, B, 4) AoS -> (2, 4, B // LANES, LANES) planar, B % LANES == 0."""
    _, b, _ = evals.shape
    return jnp.transpose(evals, (0, 2, 1)).reshape(2, 4, b // LANES, LANES)


def aos_from_planar(planar):
    """Inverse of planar_from_aos."""
    _, _, r, _ = planar.shape
    return jnp.transpose(planar.reshape(2, 4, r * LANES), (0, 2, 1))


def _comp_tuple(ref, col):
    return tuple(ref[col, k] for k in range(4))


def round_kernel_impl(planar, rows, *, interpret: bool = False):
    """One QM31 sumcheck round over the first `rows` elements.

    planar: (2, 4, R, LANES); rows: traced int32 live element count,
    a power of two >= 2 * TB * LANES.  Returns the round polynomial at
    X = 0, 1, 2 as a canonical (3, 4) uint32 array
    (cf. get_round_coefficients, kernels.cu:27-78: p(2) column values are
    2*upper - lower, computed as (upper - lower) + upper).

    ``interpret=True`` runs the same kernel body (tiling, scalar-prefetch
    dispatch, dead-step predication included) in Pallas interpret mode so
    the CPU suite can pin it without a Mosaic compile.
    """
    _, _, r, _ = planar.shape
    grid = r // (2 * TB)
    live = rows // (2 * TB * LANES)     # live tiles (>= 1 by contract)

    lo_spec = pl.BlockSpec(
        (2, 4, TB, LANES),
        lambda i, lv: (0, 0, jnp.minimum(i, lv[0] - 1), 0),
        memory_space=pltpu.VMEM)
    up_spec = pl.BlockSpec(
        (2, 4, TB, LANES),
        lambda i, lv: (0, 0, jnp.minimum(i + lv[0], 2 * lv[0] - 1), 0),
        memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((3, 4, 8, LANES), lambda i, lv: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def _acc_plane(x):
        # (TB, LANES) -> (8, LANES) log-step lazy modular fold
        while x.shape[0] > 8:
            h = x.shape[0] // 2
            x = _madd_lazy(x[:h], x[h:])
        return x

    def kern(lv_ref, lo_ref, up_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i < lv_ref[0])
        def _work():
            lo0, lo1 = _comp_tuple(lo_ref, 0), _comp_tuple(lo_ref, 1)
            up0, up1 = _comp_tuple(up_ref, 0), _comp_tuple(up_ref, 1)
            # p(2) inputs: 2*up - lo == (up - lo) + up (kernels.cu:44-63)
            t0 = tuple(m31_add(m31_sub(u, l), u) for u, l in zip(up0, lo0))
            t1 = tuple(m31_add(m31_sub(u, l), u) for u, l in zip(up1, lo1))
            points = (qm31_mul_planar(lo0, lo1),
                      qm31_mul_planar(up0, up1),
                      qm31_mul_planar(t0, t1))
            new = jnp.stack([
                jnp.stack([_acc_plane(comp) for comp in pt]) for pt in points
            ])                                   # (3, 4, 8, LANES)

            @pl.when(i == 0)
            def _init():
                acc_ref[:] = new

            @pl.when(i != 0)
            def _acc():
                acc_ref[:] = _madd_lazy(acc_ref[:], new)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[lo_spec, up_spec],
        out_specs=acc_spec,
    )
    acc = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, 4, 8, LANES), jnp.uint32),
        interpret=interpret,
    )(jnp.asarray(live, jnp.int32).reshape(1), planar, planar)
    total = jax.lax.reduce(acc, jnp.uint32(0), _madd_lazy, (2, 3))
    return _canon(total)


round_kernel = jax.jit(round_kernel_impl)


def fold_kernel_impl(planar, challenge, rows, *, interpret: bool = False):
    """Challenge fold of the first `rows` elements, fixed shape:
    lower' = lower + (upper - lower) * challenge (kernels.cu:5-25), the
    stale upper region is never read again (same convention as the
    reference folding at original stride, kernels.cu:20-28).

    challenge: (4,) uint32 canonical QM31.  The buffer keeps its full
    planar shape for the whole protocol, so one compile serves every
    round; peak HBM is in + out = 2 buffers (`fold_kernel` deliberately
    does not donate — see the note at its definition).
    """
    _, _, r, _ = planar.shape
    grid = r // (2 * TB)
    live = rows // (2 * TB * LANES)
    ch_row = jnp.zeros((1, LANES), jnp.uint32).at[0, :4].set(challenge)

    lo_spec = pl.BlockSpec(
        (2, 4, TB, LANES),
        lambda i, lv: (0, 0, jnp.minimum(i, lv[0] - 1), 0),
        memory_space=pltpu.VMEM)
    up_spec = pl.BlockSpec(
        (2, 4, TB, LANES),
        lambda i, lv: (0, 0, jnp.minimum(i + lv[0], 2 * lv[0] - 1), 0),
        memory_space=pltpu.VMEM)
    ch_spec = pl.BlockSpec((1, LANES), lambda i, lv: (0, 0),
                           memory_space=pltpu.VMEM)

    def kern(lv_ref, ch_ref, lo_ref, up_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i < lv_ref[0])
        def _work():
            ch = tuple(ch_ref[0, k] for k in range(4))   # scalar components
            for col in range(2):
                lo = _comp_tuple(lo_ref, col)
                up = _comp_tuple(up_ref, col)
                diff = tuple(m31_sub(u, l) for u, l in zip(up, lo))
                prod = qm31_mul_planar(diff, ch)
                for k in range(4):
                    out_ref[col, k] = m31_add(lo[k], prod[k])

        # dead steps revisit block lv-1: rewrite it with its (already
        # folded) content so the write-back is idempotent
        @pl.when(i >= lv_ref[0])
        def _dead():
            out_ref[:] = out_ref[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[ch_spec, lo_spec, up_spec],
        out_specs=lo_spec,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(planar.shape, jnp.uint32),
        interpret=interpret,
    )(jnp.asarray(live, jnp.int32).reshape(1), ch_row, planar, planar)


# NOT donated for the same reason as pallas_round.fold_kernel: the
# planar buffer feeds the kernel twice (lo/up views), so donation makes
# XLA insert a full defensive copy (buffer-sized temp) per fold; the
# caller rebinds each round, freeing the old buffer anyway.
fold_kernel = jax.jit(fold_kernel_impl)


# ---- CPU-testable jnp twins of the same planar math ----

def round_emulate(planar, rows: int):
    """jnp evaluation of round_kernel's math (full-array, no tiling)."""
    r_live = rows // LANES
    half = r_live // 2
    lo = planar[:, :, :half]
    up = planar[:, :, half:r_live]
    lo0, lo1 = tuple(lo[0]), tuple(lo[1])
    up0, up1 = tuple(up[0]), tuple(up[1])
    t0 = tuple(m31_add(m31_sub(u, l), u) for u, l in zip(up0, lo0))
    t1 = tuple(m31_add(m31_sub(u, l), u) for u, l in zip(up1, lo1))
    points = (qm31_mul_planar(lo0, lo1),
              qm31_mul_planar(up0, up1),
              qm31_mul_planar(t0, t1))
    out = jnp.stack([jnp.stack(pt) for pt in points])   # (3, 4, half, LANES)
    return _canon(jax.lax.reduce(out, jnp.uint32(0), _madd_lazy, (2, 3)))


def fold_emulate(planar, challenge, rows: int):
    """jnp evaluation of fold_kernel's math (full-array, no tiling)."""
    r_full = planar.shape[2]
    r_live = rows // LANES
    half = r_live // 2
    lo = planar[:, :, :half]
    up = planar[:, :, half:r_live]
    ch = tuple(jnp.asarray(challenge, jnp.uint32)[k] for k in range(4))
    cols = []
    for col in range(2):
        diff = tuple(m31_sub(up[col, k], lo[col, k]) for k in range(4))
        prod = qm31_mul_planar(diff, ch)
        cols.append(jnp.stack(
            [m31_add(lo[col, k], prod[k]) for k in range(4)]))
    folded = jnp.stack(cols)                            # (2, 4, half, LANES)
    return jnp.concatenate([folded, planar[:, :, half:r_full]], axis=2)
