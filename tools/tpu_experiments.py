"""Post-sweep perf experiments (run serially on the free TPU).

  1. sumcheck round/fold kernel timing breakdown at 2^20 / 2^24
  2. fused128 KB=11 A/B (aliasing halved the block footprint)
  3. fused32 KB=12 A/B

Prints JSON lines; nothing is appended to TPU_VALIDATION.jsonl.
"""
import json, sys, time
import numpy as np

sys.path.insert(0, "tests"); sys.path.insert(0, ".")
from binius_ntt_tpu.utils.benchlib import setup_compile_cache, device_time, _force
setup_compile_cache()
import jax
import jax.numpy as jnp


def sumcheck_breakdown():
    from binius_ntt_tpu.sumcheck.prover import INTS_PER_VALUE, Sumcheck
    from binius_ntt_tpu.sumcheck import pallas_round as pr
    from binius_ntt_tpu.utils.mt19937 import mt19937_stream

    for num_vars in (20, 24):
        comp = 2
        evals = mt19937_stream(7, INTS_PER_VALUE * (1 << num_vars) * comp)
        s = Sumcheck(evals, comp, num_vars)
        rows = (1 << num_vars) // 32
        ch = jnp.asarray(mt19937_stream(11, 4), dtype=jnp.uint32)
        r = device_time(lambda: pr.round_kernel(
            s._device_evals, jnp.int32(rows), num_points=comp + 1), reps=6)
        state = {"buf": s._device_evals}

        def fold_step():
            state["buf"] = pr.fold_kernel(state["buf"], ch, jnp.int32(rows))
            return state["buf"]

        f = device_time(fold_step, reps=6)
        print(json.dumps({"exp": "sumcheck_breakdown", "num_vars": num_vars,
                          "round_s": round(r, 6), "fold_s": round(f, 6)}),
              flush=True)
        del s


def fused128_kb11():
    from binius_ntt_tpu.layout.bitslicing import bitslice_transpose
    from binius_ntt_tpu.ntt import pallas_fused as pf
    from binius_ntt_tpu.ntt.additive_bitsliced import AdditiveNTT128
    from binius_ntt_tpu.utils.mt19937 import mt19937_stream

    log_h = 24
    words = mt19937_stream(0xDEADBEEF + log_h, (1 << log_h) * 4)
    x = jnp.asarray(words.reshape(-1, 128))
    sliced = jax.jit(bitslice_transpose)(x)
    jax.block_until_ready(sliced)
    for kb, ku in ((10, 9), (11, 9), (11, 10)):
        pf.KB, pf.KU = kb, ku
        try:
            ntt = AdditiveNTT128(log_h, 0, use_fused=True)
            ref = np.asarray(ntt.apply_sliced(sliced))[:8, :8]
            best = device_time(lambda: ntt.apply_sliced(sliced), reps=3)
            print(json.dumps({"exp": "fused128_tiles", "kb": kb, "ku": ku,
                              "seconds": round(best, 5)}), flush=True)
        except Exception as e:
            print(json.dumps({"exp": "fused128_tiles", "kb": kb, "ku": ku,
                              "error": str(e)[:200]}), flush=True)
    pf.KB, pf.KU = 10, 9


def fused32_kb12():
    from binius_ntt_tpu.ntt import pallas_fused32 as pf32
    from binius_ntt_tpu.ntt.additive import AdditiveNTT
    from binius_ntt_tpu.utils.mt19937 import mt19937_stream

    log_h = 24
    x = jnp.asarray(mt19937_stream(0xDEADBEEF + log_h, 1 << log_h))
    jax.block_until_ready(x)
    for kb, ku in ((11, 9), (12, 9), (12, 10)):
        pf32.KB, pf32.KU = kb, ku
        try:
            ntt = AdditiveNTT(log_h, 0, use_fused=True)
            _force(ntt.apply(x))
            best = device_time(lambda: ntt.apply(x), reps=3)
            print(json.dumps({"exp": "fused32_tiles", "kb": kb, "ku": ku,
                              "seconds": round(best, 5)}), flush=True)
        except Exception as e:
            print(json.dumps({"exp": "fused32_tiles", "kb": kb, "ku": ku,
                              "error": str(e)[:200]}), flush=True)
    pf32.KB, pf32.KU = 11, 9


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "sumcheck"):
        sumcheck_breakdown()
    if which in ("all", "f128"):
        fused128_kb11()
    if which in ("all", "f32"):
        fused32_kb12()
