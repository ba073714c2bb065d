#!/bin/bash
# Chain 2: rate-2 additive sweep + 26-28, fused bb31 full range (KB=9),
# QM31 on device, bb31 roundtrip, warm sumcheck numbers, stretch sizes,
# tile experiments, final bench.
cd /root/repo
set -x
timeout 7000 python tools/tpu_validation.py additive 11 28
timeout 7000 python tools/tpu_validation.py bb31 11 27
timeout 2000 python tools/tpu_validation.py prime 24
timeout 2000 python tools/tpu_validation.py bb31_roundtrip 24
timeout 3000 python tools/tpu_validation.py sumcheck 20
timeout 3000 python tools/tpu_validation.py sumcheck 24
timeout 3000 python tools/tpu_stretch.py ntt128_28
timeout 7000 python tools/tpu_stretch.py additive_29_30
timeout 7000 python tools/tpu_stretch.py sumcheck_28
timeout 4000 python tools/tpu_experiments.py
timeout 3000 python bench.py 24
