"""On-device validation of the fused GF(2^32) NTT kernel and the
fixed-shape sumcheck round/fold kernels (golden hashes + verifier oracle)."""
import hashlib, json, sys, time
import numpy as np

sys.path.insert(0, "tests"); sys.path.insert(0, ".")
from binius_ntt_tpu.utils.benchlib import setup_compile_cache
setup_compile_cache()

def md5(a):
    return hashlib.md5(np.asarray(a).astype("<u4").tobytes()).hexdigest()

# --- fused32 goldens -------------------------------------------------------
from golden_hashes import ADDITIVE_NTT_HASHES
from binius_ntt_tpu.ntt.additive import AdditiveNTT
from binius_ntt_tpu.utils.mt19937 import mt19937_stream

for (log_h, rate) in [(12, 0), (12, 2), (16, 0), (16, 2), (20, 0), (20, 2)]:
    want = ADDITIVE_NTT_HASHES[rate][log_h]
    x = mt19937_stream(0xDEADBEEF + log_h + rate, 1 << log_h)
    ntt = AdditiveNTT(log_h, rate, use_fused=True)
    assert ntt.use_fused
    t0 = time.time()
    got = md5(ntt.apply(x))
    print(json.dumps({"suite": "fused32_golden", "log_h": log_h,
                      "rate": rate, "pass": got == want,
                      "wall_s": round(time.time() - t0, 2)}), flush=True)

# steady-state timing at 2^20 and 2^24 rate 0
import jax
from binius_ntt_tpu.utils.benchlib import device_time, _force
for log_h in (20, 24):
    ntt = AdditiveNTT(log_h, 0, use_fused=True)
    x = jax.numpy.asarray(mt19937_stream(0xDEADBEEF + log_h, 1 << log_h))
    jax.block_until_ready(x)
    _force(ntt.apply(x))
    best = device_time(lambda: ntt.apply(x), reps=4)
    print(json.dumps({"suite": "fused32_perf", "log_h": log_h,
                      "seconds": round(best, 5),
                      "butterflies_per_s": round(log_h * (1 << (log_h - 1)) / best)}),
          flush=True)

# --- fixed-shape sumcheck kernels: full protocol vs verifier oracle --------
from binius_ntt_tpu.sumcheck.prover import INTS_PER_VALUE, Sumcheck
from binius_ntt_tpu.sumcheck.verifier import (
    evaluate_univariate_given_points, words_to_int)

for num_vars, comp in [(18, 2), (18, 3)]:
    evals = mt19937_stream(41 + num_vars + comp,
                           INTS_PER_VALUE * (1 << num_vars) * comp)
    s = Sumcheck(evals, comp, num_vars)
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
    print(json.dumps({"suite": "sumcheck_fixedshape", "num_vars": num_vars,
                      "composition": comp, "pass": bool(ok),
                      "protocol_s": round(time.time() - t0, 2),
                      "mean_round_s": round(float(np.mean(rts)), 4),
                      "min_round_s": round(float(np.min(rts)), 4)}),
          flush=True)
