"""Device A/B of bit-plane SHAPES for the packed GF(2^32) multiply.

PERF.md design rule 6 ("never give Mosaic a unit minor-2 axis") came from
the BB31 pt=1 pathology (8x padding).  The packed GF(2^32) multiply
(`pallas_fused32._mul32`) runs its ~650-op straight-line circuit on
(PACK=4, n) plane tiles — a 4-sublane axis that the same rule predicts
Mosaic pads 2x.  This tool measures the identical circuit at three plane
shapes inside one Pallas kernel (all three are pure reindexings of the
same math — equality is asserted on CPU and on device):

  cur   planes (4, n)            — what _mul32 ships today
  p2d   planes (4n/128, 128)     — full (8,128)-tile occupancy via a 3-D
                                   transpose on each side of the circuit
  flat  planes (4n,) 1-D         — the shape the GF(2^128) kernel uses
                                   (its planes are 1-D rows of a.T)

Usage: python tools/mul32_shape_ab.py [chain] [log_rows]
Emits suite "mul32_shape_ab" rows to TPU_VALIDATION.jsonl.
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from binius_ntt_tpu.ntt.pallas_kernels import _mul_planes
from binius_ntt_tpu.utils.benchlib import device_time

PACK, W32 = 4, 32


def mul_cur(a, b):
    n = a.shape[0]
    at = a.T.reshape(PACK, W32, n)
    bt = b.T.reshape(PACK, W32, n)
    out = _mul_planes([at[:, i] for i in range(W32)],
                      [bt[:, i] for i in range(W32)], 5)
    return jnp.stack(out, axis=1).reshape(PACK * W32, n).T


def mul_p2d(a, b):
    n = a.shape[0]

    def fwd(x):
        t = x.T.reshape(PACK, W32, n).transpose(1, 0, 2)   # (32, 4, n)
        return t.reshape(W32, (PACK * n) // 128, 128)

    at, bt = fwd(a), fwd(b)
    out = jnp.stack(_mul_planes([at[i] for i in range(W32)],
                                [bt[i] for i in range(W32)], 5))
    return (out.reshape(W32, PACK, n).transpose(1, 0, 2)
            .reshape(PACK * W32, n).T)


def mul_flat(a, b):
    n = a.shape[0]
    at = a.T.reshape(PACK, W32, n)
    bt = b.T.reshape(PACK, W32, n)
    out = _mul_planes([at[:, i].reshape(-1) for i in range(W32)],
                      [bt[:, i].reshape(-1) for i in range(W32)], 5)
    return jnp.stack([o.reshape(PACK, n) for o in out],
                     axis=1).reshape(PACK * W32, n).T


VARIANTS = {"cur": mul_cur, "p2d": mul_p2d, "flat": mul_flat}


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
            in_specs=[pl.BlockSpec((tile, 128), lambda i: (i, 0))] * 2,
            out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.uint32),
        )))


def emit(rec):
    rec["ts"] = round(time.time(), 1)
    with open("TPU_VALIDATION.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    log_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    rows = 1 << log_rows

    rng = np.random.default_rng(7)
    a = rng.integers(0, 1 << 32, (rows, 128), dtype=np.uint32)
    b = rng.integers(0, 1 << 32, (rows, 128), dtype=np.uint32)
    da, db = jnp.asarray(a), jnp.asarray(b)

    ref = None
    for name in VARIANTS:
        fn = make_fn(name, rows, tile, chain)
        try:
            out = np.asarray(fn(da, db))
        except Exception as e:  # Mosaic lowering rejections are evidence too
            emit({"suite": "mul32_shape_ab", "variant": name, "chain": chain,
                  "rows": rows, "tile": tile,
                  "error": f"{type(e).__name__}: "
                           + str(e).splitlines()[0][:160]})
            continue
        if ref is None:
            ref = out
        eq = bool((out == ref).all())
        dt = device_time(fn, da, db)
        per_mul = dt / (chain * rows / tile)  # seconds per tile-multiply
        emit({"suite": "mul32_shape_ab", "variant": name, "chain": chain,
              "rows": rows, "tile": tile, "equal": eq,
              "s_per_call": round(dt, 6),
              "us_per_tile_mul": round(per_mul * 1e6, 3)})
        assert eq, name


if __name__ == "__main__":
    main()
