"""One-config knob A/B for the fused GF(2^128) NTT (round-4 item 2).

Knobs are read from the environment at module import (BNTT_UNROLL_HI,
BNTT_KB / BNTT_KU / BNTT_PT, BNTT_PROBE_CONCAT — see ntt/pallas_fused.py),
so each variant runs in its OWN process; tools/run_round4_perf_ab.sh is
the driver.  Emits one JSON row (suite "knob_ab") per run with the knob
values, the steady-state 2^24 seconds, the compile wall, and a 2^20
golden digest verdict so a knob that silently breaks bit-exactness is
visible in the row itself (the BNTT_PROBE_CONCAT probe MUST fail it).

cf. the reference's hand-tuned launch table (src/ulvt/ntt/nttconf.cu:1-190)
— this is the measurement loop that would regenerate such a table.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

REPORT = os.path.join(_REPO, "TPU_VALIDATION.jsonl")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from binius_ntt_tpu.layout.bitslicing import bitslice_transpose
    from binius_ntt_tpu.ntt import pallas_fused as pf
    from binius_ntt_tpu.ntt.additive_bitsliced import AdditiveNTT128
    from binius_ntt_tpu.utils.benchlib import device_time, setup_compile_cache
    from binius_ntt_tpu.utils.mt19937 import mt19937_stream
    from golden_hashes_oracle import ADDITIVE_NTT128_HASHES
    import hashlib

    setup_compile_cache()
    log_h = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    knobs = {"KB": pf.KB, "KU": pf.KU, "PT": pf.PT,
             "unroll_hi": pf.UNROLL_HI, "wide2": int(pf.WIDE2),
             "probe_concat": pf._PROBE_CONCAT}

    # bit-exactness gate at 2^20 (fast; covers all three group kinds)
    gh = 20
    words = mt19937_stream(0xDEADBEEF + gh, (1 << gh) * 4)
    out = np.asarray(AdditiveNTT128(gh, 0).apply(words))
    got = hashlib.md5(out.astype("<u4").tobytes()).hexdigest()
    golden_ok = got == ADDITIVE_NTT128_HASHES[0][gh]
    del words, out

    ntt = AdditiveNTT128(log_h, 0)
    xh = mt19937_stream(0xDEADBEEF + log_h, (1 << log_h) * 4).reshape(-1, 128)
    sliced = jax.jit(bitslice_transpose)(jnp.asarray(xh))
    jax.block_until_ready(sliced)
    t0 = time.time()
    jax.block_until_ready(ntt.apply_sliced(sliced))
    compile_s = time.time() - t0
    best = device_time(lambda: ntt.apply_sliced(sliced), reps=4)

    row = {"suite": "knob_ab", "log_h": log_h, **knobs,
           "golden20_pass": bool(golden_ok),
           "seconds": round(best, 6), "compile_s": round(compile_s, 1),
           "butterflies_per_s": round(log_h * (1 << (log_h - 1)) / best, 0),
           "ts": round(time.time(), 1)}
    with open(REPORT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
