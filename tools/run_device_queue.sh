#!/usr/bin/env bash
# Sequential runner for DEVICE_QUEUE.md — kick off once when the axon
# tunnel returns.  One TPU process at a time (the tunnel serves a single
# chip); every step under its own timeout; failures are recorded and the
# queue continues.  Output: tools/device_queue.log + per-step rc lines in
# tools/device_queue_status.txt; suites append to TPU_VALIDATION.jsonl.
set -u
cd "$(dirname "$0")/.."
LOG=tools/device_queue.log
STATUS=tools/device_queue_status.txt
: > "$STATUS"

step () {
    local name="$1" tmo="$2"; shift 2
    echo "=== [$(date -u +%H:%M:%S)] $name: $*" | tee -a "$LOG"
    timeout "$tmo" "$@" >> "$LOG" 2>&1
    local rc=$?
    echo "$name rc=$rc" | tee -a "$STATUS"
}

# 1. plane-major A/B (rm first so the cache comparison stays clean)
step pm_ntt32_20_rm  2400 python tools/device_pm_ab.py ntt32 20 rm
step pm_ntt32_20_pm  2400 python tools/device_pm_ab.py ntt32 20 pm
step pm_ntt32_24_rm  2400 python tools/device_pm_ab.py ntt32 24 rm
step pm_ntt32_24_pm  2400 python tools/device_pm_ab.py ntt32 24 pm
step pm_ntt128_20_rm 3600 python tools/device_pm_ab.py ntt128 20 rm
step pm_ntt128_20_pm 3600 python tools/device_pm_ab.py ntt128 20 pm
step pm_ntt128_24_rm 3600 python tools/device_pm_ab.py ntt128 24 rm
step pm_ntt128_24_pm 3600 python tools/device_pm_ab.py ntt128 24 pm

# 2. GF(2^128) golden range (VERDICT item 2)
step ntt128_golden  10800 python tools/tpu_validation.py ntt128_golden 1 26

# 3. rate 1/3/4 value pins (VERDICT item 8)
step rates           3600 python tools/tpu_validation.py rates

# 4. committed steady-state sumcheck benchmark (VERDICT item 3)
step sumcheck_perf   7200 python tools/tpu_validation.py sumcheck_perf 24 2

# 5. BB31 remeasure with the 4-limb-product Montgomery multiply
step bb31_golden     7200 python tools/tpu_validation.py bb31 20 27

# 6. headline bench
step bench           7200 python bench.py 24

echo "=== queue done $(date -u +%H:%M:%S)" | tee -a "$LOG"
cat "$STATUS"
