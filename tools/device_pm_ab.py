"""Golden-checked steady-state device timing of the fused NTT kernels.

    python tools/device_pm_ab.py ntt128 20
    python tools/device_pm_ab.py ntt32  24 [rm] [rate]

Checks the oracle golden digest for the size (bit-exactness through the
whole Mosaic lowering), then reports time-to-first-result and warm
steady-state per-transform time on a device-resident input.  Appends a
JSON line to TPU_VALIDATION.jsonl (suite pm_ab).

History: this tool ran the round-3 plane-major vs row-major A/B whose
rows are committed in TPU_VALIDATION.jsonl.  Row-major won every config
(ntt32 2^24: 13.7 vs 21.7 ms; ntt128 2^24: 125.0 vs 140.4 ms) and the
plane-major bodies were deleted — only the 'rm' variant remains.
"""

import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPORT = os.path.join(os.path.dirname(__file__), "..", "TPU_VALIDATION.jsonl")


def _digest(arr) -> str:
    return hashlib.md5(np.asarray(arr).astype("<u4").tobytes()).hexdigest()


def main():
    which, log_h = sys.argv[1], int(sys.argv[2])
    variant = sys.argv[3] if len(sys.argv) > 3 else "rm"
    rate = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    if variant != "rm":
        raise SystemExit(
            "plane-major bodies were deleted after losing the round-3 "
            "device A/B (see pm_ab rows in TPU_VALIDATION.jsonl)")
    from binius_ntt_tpu.utils.benchlib import device_time, setup_compile_cache

    setup_compile_cache()
    from golden_hashes_oracle import ADDITIVE_NTT128_HASHES
    from golden_hashes import ADDITIVE_NTT_HASHES
    from binius_ntt_tpu.utils.mt19937 import mt19937_stream

    import jax
    import jax.numpy as jnp

    # Timed runs use a DEVICE-RESIDENT input: timing apply(host_numpy)
    # re-pays a multi-second H2D transfer through the tunnel every rep
    # (~64 MB at 2^24), burying the kernel-time difference the A/B exists
    # to measure.  time_to_first_result_s still includes the transfer.
    t0 = time.time()
    if which == "ntt128":
        from binius_ntt_tpu.layout.bitslicing import bitslice_transpose
        from binius_ntt_tpu.ntt.additive_bitsliced import AdditiveNTT128

        x = mt19937_stream(0xDEADBEEF + log_h + rate, (1 << log_h) * 4)
        ntt = AdditiveNTT128(log_h, rate, use_fused=True)
        out = np.asarray(ntt.apply(x))
        compile_s = time.time() - t0
        want = ADDITIVE_NTT128_HASHES.get(rate, {}).get(log_h)
        sliced = jax.jit(bitslice_transpose)(jnp.asarray(x.reshape(-1, 128)))
        jax.block_until_ready(sliced)
        run = lambda: ntt.apply_sliced(sliced)  # noqa: E731
        stages = log_h
    elif which == "ntt32":
        from binius_ntt_tpu.ntt.additive import AdditiveNTT

        x = mt19937_stream(0xDEADBEEF + log_h + rate, 1 << log_h)
        ntt = AdditiveNTT(log_h, rate, use_fused=True)
        out = np.asarray(ntt.apply(x))
        compile_s = time.time() - t0
        want = ADDITIVE_NTT_HASHES.get(rate, {}).get(log_h)
        xd = jnp.asarray(x)
        jax.block_until_ready(xd)
        run = lambda: ntt.apply(xd)  # noqa: E731
        stages = log_h
    else:
        raise SystemExit(f"unknown target {which}")

    got = _digest(out)
    # No committed digest for this size/rate => SKIPPED, not PASS — a PASS
    # here would overstate device validation evidence for unpinned configs.
    ok = want is None or got == want
    golden = "SKIPPED" if want is None else ("PASS" if got == want else "FAIL")
    secs = device_time(run)
    rec = {
        "suite": "pm_ab", "target": which, "variant": variant,
        "log_h": log_h, "rate": rate, "golden": golden,
        "digest": got, "time_to_first_result_s": round(compile_s, 2),
        "seconds": round(secs, 6),
        "butterflies_per_s": round(stages * (1 << (log_h - 1)) / secs, 3),
        "ts": round(time.time(), 1),
    }
    with open(REPORT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
