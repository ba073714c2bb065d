"""Device A/B of bit-plane SHAPES for the bit-sliced GF(2^128) multiply.

The round-3 GF(2^32) shape A/B (tools/mul32_shape_ab.py) showed the plane
SHAPE the straight-line circuit runs on decides occupancy: short or 1-D
minor-2 axes leave sublanes dead (PERF.md rule 6).  The GF(2^128) kernel
(`pallas_kernels._mul_vmem_sl`) runs its 3^7-AND circuit on 1-D ``(TB,)``
planes (rows of ``a.T``).  This tool times the identical circuit at three
plane shapes inside one Pallas kernel — pure reindexings of the same math,
equality asserted on device:

  cur   planes (TB,) 1-D         — what _mul_vmem_sl ships today
  p2d   planes (TB/128, 128)     — dense (8,128)-tile occupancy via a
                                   minor-axis split of a.T
  pmaj  planes (1, TB) 2-D       — explicit unit minor-2 axis (the rule-6
                                   pathology spelled out, for scale)

Usage: python tools/mul128_shape_ab.py [chain] [log_rows] [tile]
Emits suite "mul128_shape_ab" rows to TPU_VALIDATION.jsonl.

Reference counterpart: the generated straight-line circuit the shapes
feed is the same math as multiply_unrolled<7>
(src/ulvt/field/circuit_generator/unrolled/binary_tower_unrolled7.cu).
"""

import functools
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
REPORT = os.path.join(_REPO, "TPU_VALIDATION.jsonl")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from binius_ntt_tpu.ntt.pallas_kernels import _mul_planes
from binius_ntt_tpu.utils.benchlib import device_time

W = 128
H = 7


def mul_cur(a, b):
    """Shipped shape: planes are 1-D rows of the transposed tile."""
    at, bt = a.T, b.T
    out = _mul_planes([at[i] for i in range(W)],
                      [bt[i] for i in range(W)], H)
    return jnp.stack(out).T


def mul_p2d(a, b):
    """Dense 2-D planes: split the batch axis to full (8,128) tiles."""
    tb = a.shape[0]
    at = a.T.reshape(W, tb // 128, 128)
    bt = b.T.reshape(W, tb // 128, 128)
    out = _mul_planes([at[i] for i in range(W)],
                      [bt[i] for i in range(W)], H)
    return jnp.stack(out).reshape(W, tb).T


def mul_pmaj(a, b):
    """Explicit (1, TB) planes — the unit minor-2 pathology, for scale."""
    tb = a.shape[0]
    at = a.T.reshape(W, 1, tb)
    bt = b.T.reshape(W, 1, tb)
    out = _mul_planes([at[i] for i in range(W)],
                      [bt[i] for i in range(W)], H)
    return jnp.stack(out).reshape(W, tb).T


VARIANTS = {"cur": mul_cur, "p2d": mul_p2d, "pmaj": mul_pmaj}


def make_fn(name, rows, tile, chain):
    mul = VARIANTS[name]

    def kern(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        for _ in range(chain):
            a = mul(a, b)
        o_ref[...] = a

    return jax.jit(functools.partial(
        pl.pallas_call(
            kern,
            grid=(rows // tile,),
            in_specs=[pl.BlockSpec((tile, W), lambda i: (i, 0))] * 2,
            out_specs=pl.BlockSpec((tile, W), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, W), jnp.uint32),
        )))


def emit(rec):
    rec["ts"] = round(time.time(), 1)
    with open(REPORT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    log_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    rows = 1 << log_rows
    if tile % 128 or rows % tile:
        raise SystemExit(
            f"tile ({tile}) must be a multiple of 128 (mul_p2d's minor-axis "
            f"split) and divide rows ({rows}) (the pallas grid); got "
            f"rows % tile = {rows % tile}, tile % 128 = {tile % 128}")

    rng = np.random.default_rng(7)
    a = rng.integers(0, 1 << 32, (rows, W), dtype=np.uint32)
    b = rng.integers(0, 1 << 32, (rows, W), dtype=np.uint32)
    da, db = jnp.asarray(a), jnp.asarray(b)

    ref = None
    ref_name = None    # which surviving variant the equality pins against
    for name in VARIANTS:
        fn = make_fn(name, rows, tile, chain)
        try:
            out = np.asarray(fn(da, db))
        except Exception as e:  # Mosaic lowering rejections are evidence too
            emit({"suite": "mul128_shape_ab", "variant": name,
                  "chain": chain, "rows": rows, "tile": tile,
                  "error": f"{type(e).__name__}: "
                           + str(e).splitlines()[0][:160]})
            continue
        if ref is None:
            ref, ref_name = out, name
        eq = bool((out == ref).all())
        dt = device_time(fn, da, db)
        per_mul = dt / (chain * rows / tile)  # seconds per tile-multiply
        emit({"suite": "mul128_shape_ab", "variant": name, "chain": chain,
              "rows": rows, "tile": tile, "equal": eq, "ref": ref_name,
              "s_per_call": round(dt, 6),
              "us_per_tile_mul": round(per_mul * 1e6, 3)})
        assert eq, name


if __name__ == "__main__":
    main()
