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
TB = 1024  # batch rows per tile: full 8x128 VPU rows per plane op

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


def butterfly_high(x, wp, *, interpret: bool = False):
    """One high stage, fused: x (G, 2, db, 128) pairs in one array.

    wp: (G, 1, 128) bit-plane-expanded twiddles (one per group).
    Writes u' = u ^ w*v into [:, 0] and v' = u' ^ v into [:, 1].
    Tiles adapt to the pair distance: large db tiles within one group,
    small db packs TB//db groups per kernel instance.
    """
    g, _, db, _ = x.shape
    if db >= TB:
        gb, tb = 1, TB
    else:
        gb, tb = min(TB // db, g), db
    grid = (g // gb, db // tb)
    bspec = pl.BlockSpec((gb, 2, tb, W), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((gb, 1, W), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    def kern(wp_ref, x_ref, out_ref):
        ut = x_ref[:, 0].reshape(gb * tb, W)
        vt = x_ref[:, 1].reshape(gb * tb, W)
        wt = jnp.broadcast_to(wp_ref[:], (gb, tb, W)).reshape(gb * tb, W)
        u2 = ut ^ _mul_vmem_sl(wt, vt)
        out_ref[:, 0] = u2.reshape(gb, tb, W)
        out_ref[:, 1] = (u2 ^ vt).reshape(gb, tb, W)

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[wspec, bspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(wp, x)


def butterfly_low(x, wp, *, stage: int, interpret: bool = False):
    """One low stage (in-batch lane butterflies).

    x: (nb, 128); wp: (nb, 128) fully-expanded per-batch twiddle planes
    (bit-broadcast of the batch part XOR the lane-part constant, expanded
    outside the kernel — Mosaic rejects the in-kernel (tb//32,128)->(tb,4)
    lane-to-sublane reshape).
    """
    nb, _ = x.shape
    tb = min(TB, nb)
    grid = (nb // tb,)
    shift = 1 << stage
    umask = _LANE_MASKS[stage]
    vmask = (umask << shift) & 0xFFFFFFFF
    bspec = pl.BlockSpec((tb, W), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def kern(x_ref, wp_ref, out_ref):
        xt = x_ref[:]
        un = xt ^ _mul_vmem_sl(wp_ref[:], xt >> shift)
        out_ref[:] = (un & jnp.uint32(umask)) | (
            (xt ^ (un << shift)) & jnp.uint32(vmask))

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bspec, bspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, wp)


def mul_tiles(a, b, *, interpret: bool = False):
    """Standalone bit-sliced multiply of (N, 128) arrays via VMEM tiles."""
    n, _ = a.shape
    tb = min(TB, n)
    grid = (n // tb,)
    bspec = pl.BlockSpec((tb, W), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def kern(a_ref, b_ref, out_ref):
        out_ref[:] = _mul_vmem_sl(a_ref[:], b_ref[:])

    return pl.pallas_call(
        kern, grid=grid, in_specs=[bspec, bspec], out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        interpret=interpret,
    )(a, b)
