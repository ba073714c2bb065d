#!/bin/bash
# Round-4 device queue: flagship golden tail + r2 tail + rate re-pins.
# Serialized — one real chip. Each step has its own generous timeout so a
# hung tunnel can't eat the round.
set -x
cd "$(dirname "$0")/.."
log=round4_queue.log
{
  echo "=== queue start $(date -u +%FT%TZ)"
  # rates re-pinned 2026-08-18 post-round-3 kernels (defaults unchanged
  # since — 3664f24 only added env-gated knobs), so that step is dropped.
  timeout 3600 python tools/tpu_validation.py ntt128_golden 27 27 0
  timeout 5400 python tools/tpu_validation.py ntt128_golden 28 28 0
  timeout 3600 python tools/tpu_validation.py ntt128_golden 25 26 2
  timeout 5400 python tools/tpu_validation.py ntt128_golden 27 27 2
  echo "=== queue done $(date -u +%FT%TZ)"
} >> "$log" 2>&1
