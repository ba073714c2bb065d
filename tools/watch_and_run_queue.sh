#!/usr/bin/env bash
# Poll the axon TPU tunnel; when a device probe succeeds, run the
# sequential device work queue (DEVICE_QUEUE.md) exactly once.
# Probe = PJRT client init under timeout (the outage mode is a hang,
# not an error).  One TPU process at a time: the probe exits before
# the queue starts.
set -u
cd "$(dirname "$0")/.."
LOG=tools/watch_queue.log
echo "=== watcher start $(date -u +%F' '%H:%M:%S)" | tee -a "$LOG"
while true; do
    if timeout 120 python - <<'EOF' >> "$LOG" 2>&1
import jax
d = jax.devices()
print("probe ok:", d)
EOF
    then
        echo "=== tunnel up $(date -u +%H:%M:%S); starting queue" | tee -a "$LOG"
        bash tools/run_device_queue.sh
        echo "=== queue finished $(date -u +%H:%M:%S)" | tee -a "$LOG"
        break
    fi
    echo "probe failed $(date -u +%H:%M:%S); retry in 180s" >> "$LOG"
    sleep 180
done
