"""Pallas TPU kernels for bit-sliced GF(2^128) butterflies.

Why Pallas here: the jnp stacked-Karatsuba multiply materialises its level
concatenations in HBM — measured ~100x above the bandwidth floor at 2^20
(137 ms vs a ~1.3 ms floor).  Inside a Pallas kernel the whole 3^7-AND
multiply pipeline lives in VMEM: HBM traffic drops to one read + one write
of the tile.

Kernels:
  * ``butterfly_high``: one additive-NTT stage with batch-pair butterflies
    (stage >= 5).  Grid over (pair groups x batch tiles); each instance
    loads a (TB, 128) u-tile and v-tile, expands the group's single 128-bit
    twiddle into bit-planes in VMEM, computes u' = u ^ w*v, v' = u' ^ v.
  * ``butterfly_low``: one in-batch stage (stage < 5): per-batch twiddle
    planes = bit-broadcast(batch part) ^ lane-plane constant, then the
    masked lane-shift butterfly (see ntt/additive_bitsliced.py).
  * ``mul_tiles``: standalone bit-sliced multiply over (N, 128) arrays
    (used by the sumcheck round kernel).

The multiply body is the same level-synchronous Karatsuba as
fields/bitsliced.py, evaluated on (TB, K*W) flattened tiles so every VPU op
runs with >= 128 dense lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HEIGHT = 7
W = 128
TB = 256  # batch rows per tile: 256 x 128 x 4B = 128 KB per operand

_LANE_MASKS = (0x55555555, 0x33333333, 0x0F0F0F0F, 0x00FF00FF, 0x0000FFFF)


def _alpha_planes(z, h: int):
    """Straight-line multiply-by-alpha over a Python list of plane tiles."""
    if h == 0:
        return list(z)
    half = 1 << (h - 1)
    z0, z1 = z[:half], z[half:]
    t = _alpha_planes(z1, h - 1)
    return list(z1) + [x ^ y for x, y in zip(z0, t)]


def _mul_planes(A, B, h: int):
    """Straight-line Karatsuba over Python lists of plane tiles.

    This IS the reference's generated circuit (multiply_unrolled<h>,
    binary_tower_unrolled*.cu) — emitted by tracing instead of by the
    codegen tool; every statement is one full-width VPU op on a plane tile.
    Peak live set is ~510 planes at h=7 (measured), so a 1024-batch tile
    keeps all intermediates in VMEM.
    """
    if h == 0:
        return [A[0] & B[0]]
    half = 1 << (h - 1)
    a0, a1 = A[:half], A[half:]
    b0, b1 = B[:half], B[half:]
    z0 = _mul_planes(a0, b0, h - 1)
    z2 = _mul_planes(a1, b1, h - 1)
    zm = _mul_planes([x ^ y for x, y in zip(a0, a1)],
                     [x ^ y for x, y in zip(b0, b1)], h - 1)
    z2a = _alpha_planes(z2, h - 1)
    lo = [x ^ y for x, y in zip(z0, z2)]
    hi = [m ^ l ^ a for m, l, a in zip(zm, lo, z2a)]
    return lo + hi


def _mul_vmem_sl(a, b, height: int = HEIGHT):
    """Straight-line multiply on (TB, 2^height) tiles via plane lists."""
    w = 1 << height
    at = a.T  # (W, TB)
    bt = b.T
    pa = [at[i] for i in range(w)]
    pb = [bt[i] for i in range(w)]
    out = _mul_planes(pa, pb, height)
    return jnp.stack(out).T


def _mul_alpha_pm(x, h: int):
    """Planes-major multiply-by-alpha on (..., 2^h, tb) slices (axis -2)."""
    if h == 0:
        return x
    half = x.shape[-2] // 2
    x0, x1 = x[..., :half, :], x[..., half:, :]
    return jnp.concatenate([x1, x0 ^ _mul_alpha_pm(x1, h - 1)], axis=-2)


def _mul_vmem(a, b, height: int = HEIGHT):
    """Stacked Karatsuba on (TB, 2^height) VMEM tiles.

    Works planes-major internally — bit-planes on the sublane axis, the
    batch tile on the lane axis — because Mosaic supports sublane-axis
    concatenation at any granularity but not minor-axis offset mixing
    (probed empirically; the batch-major form failed to compile).
    """
    tb, w = a.shape
    assert w == 1 << height
    A = a.T  # (W, TB): plane i is row i
    B = b.T
    k = 1
    for _ in range(height):
        wd = A.shape[0] // k
        va = A.reshape(k, wd, tb)
        vb = B.reshape(k, wd, tb)
        a0, a1 = va[:, : wd // 2], va[:, wd // 2:]
        b0, b1 = vb[:, : wd // 2], vb[:, wd // 2:]
        # block order: [all z0 operands | all z2 operands | all middles]
        A = jnp.concatenate([a0, a1, a0 ^ a1], axis=0).reshape(-1, tb)
        B = jnp.concatenate([b0, b1, b0 ^ b1], axis=0).reshape(-1, tb)
        k *= 3
    z = A & B  # (3^height, TB): every leaf AND in one full-width op

    for d in range(1, height + 1):
        k //= 3
        wd = 1 << (d - 1)
        zv = z.reshape(3, k, wd, tb)
        z0, z2, zm = zv[0], zv[1], zv[2]
        lo = z0 ^ z2
        hi = zm ^ lo ^ _mul_alpha_pm(z2, d - 1)
        z = jnp.concatenate([lo, hi], axis=1).reshape(k * 2 * wd, tb)
    return z.reshape(w, tb).T


def _expand_w4(w4):
    """(4,) compact words -> (1, 128) all-ones/zeros planes (in VMEM)."""
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (4, 32), 1)
    bits = (w4[:, None] >> shifts) & jnp.uint32(1)
    return (jnp.uint32(0) - bits).reshape(1, W)


def _butterfly_high_kernel(w4_ref, u_ref, v_ref, u_out, v_out):
    wp = _expand_w4(w4_ref[0])
    u = u_ref[:]
    v = v_ref[:]
    u2 = u ^ _mul_vmem(jnp.broadcast_to(wp, v.shape), v)
    u_out[:] = u2
    v_out[:] = u2 ^ v


@functools.partial(jax.jit, static_argnames=("interpret",))
def butterfly_high(u, v, w4, *, interpret: bool = False):
    """One high stage over paired batch tiles.

    u, v: (G, db, 128) — the two halves of each pair group;
    w4: (G, 4) compact twiddles.  Returns (u2, v2) with the same shapes.
    """
    g, db, _ = u.shape
    tb = min(TB, db)
    grid = (g, db // tb)
    bspec = pl.BlockSpec((1, tb, W), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((1, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)

    def kern(w4_ref, u_ref, v_ref, u_out, v_out):
        _butterfly_high_kernel(
            w4_ref, u_ref.at[0], v_ref.at[0], u_out.at[0], v_out.at[0])

    u2, v2 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[wspec, bspec, bspec],
        out_specs=(bspec, bspec),
        out_shape=(jax.ShapeDtypeStruct(u.shape, u.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        interpret=interpret,
    )(w4, u, v)
    return u2, v2


@functools.partial(jax.jit, static_argnames=("stage", "interpret"))
def butterfly_low(x, a4, lane_planes, *, stage: int, interpret: bool = False):
    """One low stage (in-batch lane butterflies).

    x: (nb, 128); a4: (nb, 4) batch-part twiddles; lane_planes: (128,).
    """
    nb, _ = x.shape
    tb = min(TB, nb)
    grid = (nb // tb,)
    shift = 1 << stage
    umask = _LANE_MASKS[stage]
    vmask = (umask << shift) & 0xFFFFFFFF

    def kern(x_ref, a4_ref, lp_ref, out_ref):
        xt = x_ref[:]
        a4 = a4_ref[:]                       # (tb, 4)
        shifts = jax.lax.broadcasted_iota(jnp.uint32, (4, 32), 1)
        bits = (a4[:, :, None] >> shifts[None]) & jnp.uint32(1)
        wp = (jnp.uint32(0) - bits).reshape(tb, W) ^ lp_ref[:][None, :]
        un = xt ^ _mul_vmem(wp, xt >> shift)
        out_ref[:] = (un & jnp.uint32(umask)) | (
            (xt ^ (un << shift)) & jnp.uint32(vmask))

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, a4, lane_planes)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mul_tiles(a, b, *, interpret: bool = False):
    """Standalone bit-sliced multiply of (N, 128) arrays via VMEM tiles."""
    n, _ = a.shape
    tb = min(TB, n)
    grid = (n // tb,)
    bspec = pl.BlockSpec((tb, W), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def kern(a_ref, b_ref, out_ref):
        out_ref[:] = _mul_vmem(a_ref[:], b_ref[:])

    return pl.pallas_call(
        kern, grid=grid, in_specs=[bspec, bspec], out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        interpret=interpret,
    )(a, b)
