#!/usr/bin/env bash
# Round-3 follow-on device queue: runs after the round-2 queue
# (tools/run_device_queue.sh) fully exits, so every timing below sees a
# quiet chip — the round-2 queue's pm_ab rows were taken concurrently
# with other device work and are contention-polluted.
#
# Usage: tools/run_round3_queue.sh [WAIT_PID]
# If WAIT_PID is given, blocks until that process exits first.
set -u
cd "$(dirname "$0")/.."
LOG=tools/device_queue.log
STATUS=tools/device_queue_status.txt

if [ $# -ge 1 ]; then
    echo "=== round3 queue waiting on pid $1" | tee -a "$LOG"
    while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== round3 queue start $(date -u +%H:%M:%S)" | tee -a "$LOG"

step () {
    local name="$1" tmo="$2"; shift 2
    echo "=== [$(date -u +%H:%M:%S)] $name: $*" | tee -a "$LOG"
    timeout "$tmo" "$@" >> "$LOG" 2>&1
    local rc=$?
    echo "$name rc=$rc" | tee -a "$STATUS"
}

# 1. clean fused-NTT steady-state timings (device-resident inputs, quiet
# chip).  HISTORICAL NOTE: this queue originally also ran the 'pm'
# variants; the plane-major bodies lost that A/B (rows committed in
# TPU_VALIDATION.jsonl) and were deleted, so device_pm_ab now rejects
# any variant other than 'rm'.
step r3_ntt32_20   1200 python tools/device_pm_ab.py ntt32 20 rm
step r3_ntt32_24   1800 python tools/device_pm_ab.py ntt32 24 rm
step r3_ntt128_20  1800 python tools/device_pm_ab.py ntt128 20 rm
step r3_ntt128_24  2400 python tools/device_pm_ab.py ntt128 24 rm

# 2. QM31 fused-round steady state (new in round 3)
step r3_qm31_perf    3600 python tools/tpu_validation.py qm31_perf 24

# 3. capacity endpoint: 2^28-eval sumcheck steady-state round at C=2
#    (8.6 GB buffers on the 16 GB chip; C=4 needs sharding — see SCALING.md)
step r3_sc28_perf    7200 python tools/tpu_validation.py sumcheck_perf 28 2

echo "=== round3 queue done $(date -u +%H:%M:%S)" | tee -a "$LOG"
