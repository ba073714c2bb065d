#!/usr/bin/env bash
# Second round-3 follow-on: completes the steady-state perf matrix on a
# quiet chip after tools/run_round3_queue.sh exits.
# Usage: tools/run_round3b_queue.sh [WAIT_PID]
set -u
cd "$(dirname "$0")/.."
LOG=tools/device_queue.log
STATUS=tools/device_queue_status.txt

if [ $# -ge 1 ]; then
    echo "=== round3b queue waiting on pid $1" | tee -a "$LOG"
    while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== round3b queue start $(date -u +%H:%M:%S)" | tee -a "$LOG"

step () {
    local name="$1" tmo="$2"; shift 2
    echo "=== [$(date -u +%H:%M:%S)] $name: $*" | tee -a "$LOG"
    timeout "$tmo" "$@" >> "$LOG" 2>&1
    local rc=$?
    echo "$name rc=$rc" | tee -a "$STATUS"
}

# steady-state sumcheck matrix (the reference benches 20/24/28 x C 2/3/4,
# sumcheck/bench/benchmark.cu:71-84; 28 at C=2 runs in the r3 queue)
step r3b_sc20_c2     3600 python tools/tpu_validation.py sumcheck_perf 20 2
step r3b_sc24_c3     5400 python tools/tpu_validation.py sumcheck_perf 24 3
step r3b_sc24_c4     5400 python tools/tpu_validation.py sumcheck_perf 24 4

# BB31 phase attribution on a quiet chip (VERDICT r2 item 5)
step r3b_bb31prof24  3600 python tools/bb31_profile.py 24
step r3b_bb31prof20  1800 python tools/bb31_profile.py 20

# field-op throughput re-take with the 4-limb mont_mul, quiet chip
step r3b_fieldops    3600 python tools/tpu_validation.py fieldops

echo "=== round3b queue done $(date -u +%H:%M:%S)" | tee -a "$LOG"
