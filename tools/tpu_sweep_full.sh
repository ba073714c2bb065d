#!/bin/bash
# Full-range revalidation on the fused default paths + warm-cache perf.
# Serial: one TPU process at a time.  Each step tolerates failures.
cd /root/repo
set -x
timeout 5000 python tools/tpu_validation.py additive 11 28
timeout 5000 python tools/tpu_validation.py bb31 11 27
timeout 3000 python tools/tpu_validation.py sumcheck 20
timeout 3000 python tools/tpu_validation.py sumcheck 24
timeout 3000 python bench.py 24
