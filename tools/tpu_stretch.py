"""Stretch configs: the sizes the reference could not reach.

  * 2^28-point bit-sliced GF(2^128) additive NTT on ONE chip (BASELINE
    config 5's size; the reference never runs >2^24 over F_{2^128}).
  * Additive GF(2^32) NTT at 2^29 / 2^30 (the reference's [.slow] tag,
    src/ulvt/ntt/tests/test_ntt.cu:231-234).
  * 2^28-evaluation sumcheck, composition 2 (the reference's 28-var run
    FAILED on a 16 GB GPU, ntt/result.txt tail; SURVEY section 4).

Appends JSON lines to TPU_VALIDATION.jsonl.  Usage:
    python tools/tpu_stretch.py [ntt128_28|additive_29_30|sumcheck_28]
"""
import json, sys, time
import numpy as np

sys.path.insert(0, "tests"); sys.path.insert(0, ".")
from binius_ntt_tpu.utils.benchlib import setup_compile_cache
setup_compile_cache()

import os
REPORT = os.path.join(os.path.dirname(__file__), "..", "TPU_VALIDATION.jsonl")


def emit(rec):
    rec["ts"] = round(time.time(), 1)
    with open(REPORT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def ntt128_28():
    """2^28-point GF(2^128) transform on ONE chip: 4 GB of state, so the
    timing chain donates its buffer (transform-of-transform: same compute,
    peak HBM ~1 copy; a non-donating harness held input + output + copy
    and exhausted the 16 GB)."""
    import functools

    import jax, jax.numpy as jnp
    from binius_ntt_tpu.ntt import pallas_fused as pf
    from binius_ntt_tpu.ntt.additive import precompute_subspace_evals
    from binius_ntt_tpu.ntt.pallas_kernels import HEIGHT
    from binius_ntt_tpu.utils.benchlib import device_time

    log_h = 28
    nb = (1 << log_h) // 32
    rows = precompute_subspace_evals(log_h, 0, HEIGHT)
    tables = pf.build_tables(rows, log_h, 0)
    fn = jax.jit(functools.partial(pf.apply_fused, tables=tables,
                                   log_h=log_h, log_rate=0),
                 donate_argnums=(0,))
    rng = np.random.default_rng(9)
    state = {"buf": jnp.asarray(
        rng.integers(0, 2 ** 32, size=(nb, 128), dtype=np.uint32))}
    jax.block_until_ready(state["buf"])

    def step():
        state["buf"] = fn(state["buf"])
        return state["buf"]

    best = device_time(step, reps=2)
    emit({"suite": "ntt128_perf", "log_h": log_h,
          "seconds": round(best, 5),
          "butterflies_per_s": round(log_h * (1 << (log_h - 1)) / best)})


def additive_29_30():
    import hashlib
    from golden_hashes import ADDITIVE_NTT_HASHES
    from binius_ntt_tpu.ntt.additive import AdditiveNTT
    from binius_ntt_tpu.utils.mt19937 import mt19937_stream

    for log_h in (29, 30):
        want = ADDITIVE_NTT_HASHES.get(0, {}).get(log_h)
        if want is None:
            print(f"no golden for log_h={log_h}; skipping", flush=True)
            continue
        x = mt19937_stream(0xDEADBEEF + log_h, 1 << log_h)
        t0 = time.time()
        out = np.asarray(AdditiveNTT(log_h, 0).apply(x))
        got = hashlib.md5(out.astype("<u4").tobytes()).hexdigest()
        emit({"suite": "additive_ntt32", "log_h": log_h, "rate": 0,
              "golden": want, "got": got, "pass": got == want,
              "wall_s": round(time.time() - t0, 2)})
        del out, x


def sumcheck_28():
    from binius_ntt_tpu.layout.bitslicing import bitslice_transpose
    from binius_ntt_tpu.sumcheck.prover import INTS_PER_VALUE, Sumcheck
    from binius_ntt_tpu.sumcheck.verifier import (
        evaluate_univariate_given_points, words_to_int)

    num_vars, comp = 28, 2
    rng0 = np.random.default_rng(123)
    b = (1 << num_vars) // 32
    # generate per-column already-bitsliced host-side (numpy) to skip the
    # on-device transpose (peak-HBM discipline: state is 8 GB of 16 GB)
    evals = rng0.integers(0, 2 ** 32,
                          size=(comp, b, 128), dtype=np.uint32)
    evals = np.ascontiguousarray(bitslice_transpose(evals))
    t0 = time.time()
    s = Sumcheck(evals.reshape(-1), comp, num_vars, data_is_transposed=True)
    setup_s = time.time() - t0
    del evals
    rng = np.random.default_rng(7)
    claim, ok = None, True
    t0 = time.time()
    rts = []
    for rnd in range(num_vars):
        t1 = time.time()
        total, pts = s.round_messages()
        if claim is not None:
            ok = ok and (words_to_int(total) == claim)
        ok = ok and (words_to_int(total)
                     == words_to_int(pts[0]) ^ words_to_int(pts[1]))
        ch = rng.integers(0, 2 ** 32, size=4, dtype=np.uint32)
        claim = evaluate_univariate_given_points(
            words_to_int(ch), [words_to_int(p) for p in pts], comp + 1)
        s.move_to_next_round(ch)
        rts.append(time.time() - t1)
        print(f"round {rnd}: {rts[-1]:.2f}s ok={ok}", flush=True)
    emit({"suite": "sumcheck128", "num_vars": num_vars, "composition": comp,
          "pass": bool(ok), "setup_s": round(setup_s, 2),
          "protocol_s": round(time.time() - t0, 2),
          "round0_s": round(rts[0], 4),
          "mean_round_s": round(float(np.mean(rts)), 4)})


if __name__ == "__main__":
    {"ntt128_28": ntt128_28, "additive_29_30": additive_29_30,
     "sumcheck_28": sumcheck_28}[sys.argv[1]]()
