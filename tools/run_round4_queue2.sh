#!/bin/bash
# Round-4 device queue #2 (after the golden tail + perf A/B):
#   * sumcheck per-phase rows (reference bench segmentation, VERDICT §missing 6)
#   * warm-cache 28-var protocol wall (VERDICT item 3 target: <= 400 s)
#   * headline bench on a quiet chip with a warm cache
set -x
cd "$(dirname "$0")/.."
log=round4_queue2.log
{
  echo "=== queue2 start $(date -u +%FT%TZ)"
  timeout 2400 python tools/tpu_validation.py sumcheck_phases 20 24
  timeout 3600 python tools/tpu_validation.py sumcheck 28
  timeout 1800 python bench.py
  echo "=== queue2 done $(date -u +%FT%TZ)"
} >> "$log" 2>&1
