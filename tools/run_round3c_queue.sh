#!/usr/bin/env bash
# Third round-3 follow-on: final evidence at the current kernels.
# Usage: tools/run_round3c_queue.sh [WAIT_PID]
set -u
cd "$(dirname "$0")/.."
LOG=tools/device_queue.log
STATUS=tools/device_queue_status.txt

if [ $# -ge 1 ]; then
    echo "=== round3c queue waiting on pid $1" | tee -a "$LOG"
    while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== round3c queue start $(date -u +%H:%M:%S)" | tee -a "$LOG"

step () {
    local name="$1" tmo="$2"; shift 2
    echo "=== [$(date -u +%H:%M:%S)] $name: $*" | tee -a "$LOG"
    timeout "$tmo" "$@" >> "$LOG" 2>&1
    local rc=$?
    echo "$name rc=$rc" | tee -a "$STATUS"
}

# QM31 full protocol on device with the fused planar path (round-1's row
# predates the Pallas kernels and was compile-dominated)
step r3c_qm31_proto  3600 python tools/tpu_validation.py prime 24

# large-size GF(2^128) perf rows with the current (UNROLL_LOW) kernels
step r3c_ntt128_26   5400 python tools/tpu_validation.py ntt128 26 27
step r3c_ntt128_28   7200 python tools/tpu_validation.py ntt128 28 28

# golden re-pins at the current kernels (rows predating the round-3
# kernel changes)
step r3c_bb31_tail   5400 python tools/tpu_validation.py bb31 25 27
step r3c_g128_tail   5400 python tools/tpu_validation.py ntt128_golden 23 25
step r3c_rates       3600 python tools/tpu_validation.py rates

# final headline bench
step r3c_bench       7200 python bench.py 24

echo "=== round3c queue done $(date -u +%H:%M:%S)" | tee -a "$LOG"
