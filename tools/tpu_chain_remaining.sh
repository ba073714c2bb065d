#!/bin/bash
# Remaining full-range validation chain (run serially; fused32 makes the
# additive sizes cheap).  Usage: bash tools/tpu_chain_remaining.sh
set -x
cd /root/repo
timeout 4000 python tools/tpu_validation.py additive 25 28   # r0+r2 (28 r0 only)
timeout 4000 python tools/tpu_validation.py sumcheck 24
