"""Phase-level device profile of the fused BB31 radix-2 NTT.

VERDICT r2 item 5: if the 4-limb mont_mul remeasure still sits well above
the ~7 ms ALU estimate at 2^24, attribute the residual with measurements,
not guesses.  Times, each in isolation on device-resident inputs:

  * full forward transform (the headline number),
  * the input bit-reversal permutation alone (two row-gathers around a
    dense transpose, radix2._bitrev_split),
  * the fused stage ladder alone (post-bit-reversal, encode/decode
    included),
  * each stage group alone (bottom lane-stage group vs upper row groups),
  * the raw mont_mul tile throughput at the same shape (ALU reference).

Appends JSON lines (suite bb31_profile) to TPU_VALIDATION.jsonl.

Usage:  python tools/bb31_profile.py [log_n]
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPORT = os.path.join(os.path.dirname(__file__), "..", "TPU_VALIDATION.jsonl")


def _emit(rec):
    rec = {"suite": "bb31_profile", **rec, "ts": round(time.time(), 1)}
    with open(REPORT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    from binius_ntt_tpu.utils.benchlib import device_time, setup_compile_cache

    setup_compile_cache()
    import jax
    import jax.numpy as jnp

    from binius_ntt_tpu.fields import baby_bear as bb
    from binius_ntt_tpu.ntt import pallas_fused_bb31 as pfb
    from binius_ntt_tpu.ntt.radix2 import NTTRadix2, _bitrev_split

    ntt = NTTRadix2(137, 27, log_n)     # same generator as the golden tests
    rng = np.random.default_rng(3)
    xd = jnp.asarray(rng.integers(0, bb.P, size=1 << log_n, dtype=np.uint32))
    jax.block_until_ready(xd)

    t = device_time(lambda: ntt.apply(xd))
    _emit({"phase": "full_forward", "log_n": log_n, "ms": round(t * 1e3, 4)})

    t = device_time(lambda: _bitrev_split(
        xd, ntt._rev_a, ntt._rev_b, log_n=log_n))
    _emit({"phase": "bitrev_only", "log_n": log_n, "ms": round(t * 1e3, 4)})

    xrev = _bitrev_split(xd, ntt._rev_a, ntt._rev_b, log_n=log_n)
    jax.block_until_ready(xrev)
    t = device_time(lambda: ntt._apply_fused(xrev, ntt._fused_arrays))
    _emit({"phase": "stages_only", "log_n": log_n, "ms": round(t * 1e3, 4)})

    # per-group attribution (bottom = lane stages + KB row stages with
    # Montgomery encode; uppers = KU row stages each)
    static, arrays = pfb.split_tables_r2(pfb.build_tables_r2(
        np.asarray(ntt._tw_mont), log_n))
    rows_total = (1 << log_n) >> 7
    xt = xrev.reshape(rows_total, 128)
    last = len(static) - 1
    for gi, ((t0, k, il, skip), (lane_tws, row_tws)) in enumerate(
            zip(static, arrays)):
        fn = jax.jit(functools.partial(
            pfb.stage_group_r2, t0=t0, k=k, include_lanes=il, skip=skip,
            log_n=log_n, encode_in=(gi == 0), decode_out=(gi == last)))
        t = device_time(lambda: fn(xt, lane_tws, row_tws))
        _emit({"phase": f"group{gi}_t0={t0}_k={k}"
                        f"{'_lanes' if il else ''}",
               "log_n": log_n, "ms": round(t * 1e3, 4)})

    # ALU reference: one mont_mul over the same (rows, 128) shape
    y = jnp.asarray(rng.integers(0, bb.P, size=(rows_total, 128),
                                 dtype=np.uint32))
    mm = jax.jit(bb.mont_mul)
    t = device_time(lambda: mm(xt, y))
    _emit({"phase": "mont_mul_pass", "log_n": log_n,
           "ms": round(t * 1e3, 4)})


if __name__ == "__main__":
    main()
