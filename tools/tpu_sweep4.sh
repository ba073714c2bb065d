#!/bin/bash
# Chain 4 (final): Pallas lane-roll conversion goldens at the sizes the
# jnp ladder couldn't reach (26-27 rate 2, 28 rate 0) + the rest of
# 24-28 on the final code state; fixed fieldops; final bench + render.
cd /root/repo
set -x
timeout 9000 python tools/tpu_validation.py additive 24 28
timeout 2500 python tools/tpu_validation.py fieldops
timeout 3000 python bench.py 24
python tools/render_validation.py
