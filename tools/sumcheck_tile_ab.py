"""Equality-gated tile A/B for the fused sumcheck round/fold kernels
(round-5 item: close the C>=3 efficiency gap, VERDICT.md weak #4).

Knobs are read from the environment at module import (BNTT_ROUND_T /
BNTT_FOLD_T — see sumcheck/pallas_round.py), so each variant runs in its
OWN process.  For every composition size the row carries an equality gate
(round kernel vs round_emulate; fold kernel vs the validated jnp tiled
fold, live region) at full AND half occupancy, so a tile choice that
silently breaks the scalar-prefetch clamping is visible in the row.

cf. the reference's fixed BLOCKS=2048/THREADS=32 sumcheck geometry
(src/ulvt/sumcheck/utils/constants.hpp:8-9) — this is the measurement
loop that tunes the TPU analogue of that table.

Usage: python tools/sumcheck_tile_ab.py [num_vars] [comps...]
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

REPORT = os.path.join(_REPO, "TPU_VALIDATION.jsonl")


def main() -> None:
    import jax.numpy as jnp
    import numpy as np

    from binius_ntt_tpu.layout.bitslicing import repeat_value_bitsliced
    from binius_ntt_tpu.sumcheck import pallas_round as pr
    from binius_ntt_tpu.sumcheck.prover import (
        BITS_WIDTH, INTS_PER_VALUE, Sumcheck, _fold_kernel_tiled)
    from binius_ntt_tpu.utils.benchlib import device_time, setup_compile_cache
    from binius_ntt_tpu.utils.mt19937 import mt19937_stream

    setup_compile_cache()
    num_vars = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    comps = [int(a) for a in sys.argv[2:]] or [2, 3, 4]
    from binius_ntt_tpu.sumcheck import pallas_round as _pr

    knobs = {"round_t": os.environ.get("BNTT_ROUND_T", "default"),
             "fold_t": os.environ.get("BNTT_FOLD_T", "default"),
             "round_roll": int(_pr.ROUND_ROLL)}
    # fold-only mode: skip the round compile+timing (a fold-tile sweep
    # would otherwise pay ~2 needless Mosaic compiles per config)
    fold_only = os.environ.get("BNTT_AB_FOLD_ONLY", "") == "1"

    for comp in comps:
        # equality gate at a small size (fast through the tunnel)
        nv_eq = 16
        evals = mt19937_stream(5 + comp, INTS_PER_VALUE * (1 << nv_eq) * comp)
        s = Sumcheck(evals, comp, nv_eq)
        rows = (1 << nv_eq) // 32
        buf = s._device_evals
        ch = np.asarray(mt19937_stream(11, INTS_PER_VALUE), dtype=np.uint32)
        chj = jnp.asarray(ch)
        coeff_batch = jnp.asarray(repeat_value_bitsliced(ch, BITS_WIDTH))

        ok = True
        for live_rows in (rows, rows // 2):
            # both kernels require live_rows >= 2 * tile (>= one live
            # tile; the prover's dispatch enforces the same) — a smaller
            # live count clamps the index maps to block -1 and crashes
            if live_rows < 2 * pr.round_tile(comp, rows) or \
                    live_rows < 2 * pr.fold_tile(comp, rows):
                continue
            if not fold_only:
                want = np.asarray(pr.round_emulate(
                    buf[:, :live_rows], num_points=comp + 1))
                got = np.asarray(pr.round_kernel(
                    buf, jnp.int32(live_rows), num_points=comp + 1))
                ok = ok and bool(np.array_equal(got, want))
            f_ref = np.asarray(_fold_kernel_tiled(
                buf, coeff_batch, jnp.int32(live_rows)))
            f_pl = np.asarray(pr.fold_kernel(buf, chj, jnp.int32(live_rows)))
            ok = ok and bool(np.array_equal(
                f_pl[:, : live_rows // 2], f_ref[:, : live_rows // 2]))

        # steady-state timing at the target size, full occupancy
        evals = mt19937_stream(7, INTS_PER_VALUE * (1 << num_vars) * comp)
        s = Sumcheck(evals, comp, num_vars)
        rows = (1 << num_vars) // 32
        buf = s._device_evals
        t_round = None
        if not fold_only:
            t_round = device_time(lambda: pr.round_kernel(
                buf, jnp.int32(rows), num_points=comp + 1))
        state = {"buf": buf}

        def fold_step():
            state["buf"] = pr.fold_kernel(state["buf"], chj, jnp.int32(rows))
            return state["buf"]

        t_fold = device_time(fold_step)
        row = {"suite": "sumcheck_tile_ab", "num_vars": num_vars,
               "composition": comp, **knobs, "equality_pass": ok,
               "round_ms": (None if t_round is None
                            else round(t_round * 1e3, 4)),
               "fold_ms": round(t_fold * 1e3, 4),
               "ts": round(time.time(), 1)}
        with open(REPORT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
        del s, buf, state


if __name__ == "__main__":
    main()
