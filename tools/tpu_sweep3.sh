#!/bin/bash
# Chain 3: finish chain 2's casualties — additive rate-2 full range and
# rate-0 27/28 (KU=8 fix), bb31 26-27 (tables-as-args fix), field ops,
# final bench.
cd /root/repo
set -x
timeout 9000 python tools/tpu_validation.py additive 11 28
timeout 4000 python tools/tpu_validation.py bb31 24 27
timeout 2000 python tools/tpu_validation.py fieldops
timeout 3000 python bench.py 24
