#!/bin/bash
# Round-4 perf A/B at 2^24 GF(2^128) (VERDICT item 2) — one process per
# variant (knobs are read at import).  Run on a QUIET chip only: timing
# rows taken during device contention are worthless (PERF.md §1).
set -x
cd "$(dirname "$0")/.."
log=round4_perf_ab.log
{
  echo "=== perf A/B start $(date -u +%FT%TZ)"
  # 1. baseline re-measure (also warms the compile cache for bench.py)
  timeout 1200 python tools/ntt128_knob_ab.py 24
  # 2-3. partial unroll of the hi stage loop (round-3 only tried full)
  timeout 1800 env BNTT_UNROLL_HI=2 python tools/ntt128_knob_ab.py 24
  timeout 1800 env BNTT_UNROLL_HI=3 python tools/ntt128_knob_ab.py 24
  # 4. interleave-cost probe (WRONG transform by design: golden20 must FAIL;
  #    isolates the Pease-rotation write-back cost in the hi loop)
  timeout 1200 env BNTT_PROBE_CONCAT=1 python tools/ntt128_knob_ab.py 24
  # 5. two-pass plan: one k=10 upper group instead of two k=5 groups
  timeout 1800 env BNTT_KU=10 BNTT_PT=2 python tools/ntt128_knob_ab.py 24
  echo "=== perf A/B done $(date -u +%FT%TZ)"
} >> "$log" 2>&1
