#!/bin/bash
# Chain 3: full additive re-sweep (lane-roll conversion invalidated the
# fused32 cache; rate-2 + 27/28 now reachable with KU=8), bb31 26-27,
# field ops, stretch retries (donating ntt128_28 chain, additive 29/30,
# shrink-fold sumcheck_28), warm sumchecks, final bench.
cd /root/repo
set -x
timeout 9000 python tools/tpu_validation.py additive 11 28
timeout 4000 python tools/tpu_validation.py bb31 26 27
timeout 2000 python tools/tpu_validation.py fieldops
timeout 3000 python tools/tpu_stretch.py ntt128_28
timeout 7000 python tools/tpu_stretch.py additive_29_30
timeout 7000 python tools/tpu_stretch.py sumcheck_28
timeout 3000 python tools/tpu_validation.py sumcheck 20
timeout 3000 python tools/tpu_validation.py sumcheck 24
timeout 3000 python bench.py 24
