#!/bin/bash
# Chain 4 (final): revalidate the Pallas lane-roll conversion path on
# device (it replaces the jnp ladder that OOMed at 2^26 rate 2 / 2^28),
# re-render docs, final bench.
cd /root/repo
set -x
timeout 9000 python tools/tpu_validation.py additive 24 28
timeout 2000 python tools/tpu_validation.py fieldops
timeout 7000 python tools/tpu_stretch.py additive_29_30
timeout 3000 python bench.py 24
python tools/render_validation.py
