#!/bin/bash
# Round-5 device queue — serialized (ONE real chip; concurrent processes
# interleave executions and corrupt K-vs-1 timing estimates, PERF.md
# "Round-3 measurement hygiene").  Each step under its own timeout so a
# wedged tunnel init (observed 2026-08-20: PJRT init hangs while a fresh
# probe succeeds) costs one step, not the queue.
cd "$(dirname "$0")/.." || exit 1
log() { echo "=== $(date -u +%H:%M:%S) $* ==="; }

# official steady-state sumcheck rows at the new kernels/tiles
log sumcheck_perf
timeout 2400 python tools/tpu_validation.py sumcheck_perf 20 2
timeout 2400 python tools/tpu_validation.py sumcheck_perf 24 2
timeout 2400 python tools/tpu_validation.py sumcheck_perf 24 3
timeout 2400 python tools/tpu_validation.py sumcheck_perf 24 4
timeout 4800 python tools/tpu_validation.py sumcheck_perf 28 2

# full protocols with the verifier oracle (end-to-end at the new kernels)
log sumcheck_protocols
timeout 4800 python tools/tpu_validation.py sumcheck 20
timeout 7200 python tools/tpu_validation.py sumcheck 24

# clean per-phase segmentation (replaces the round-4 rows that swallowed
# a tunnel stall into memcpy_ms)
log sumcheck_phases
timeout 4800 python tools/tpu_validation.py sumcheck_phases 20 24

# cold/warm first-result latency (3 child processes per target)
log coldstart
timeout 7200 python tools/coldstart.py

# flagship [.slow] tail: 2^29 r0 GF(2^128) on device (8.6 GB state)
log ntt128_golden_29
timeout 10800 python tools/tpu_validation.py ntt128_golden 29 29 0

# headline bench last: leaves .jax_cache warm at the final kernels
log bench
timeout 3600 python bench.py 24
log done
