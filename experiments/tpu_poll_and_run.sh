#!/bin/bash
# Poll the axon TPU tunnel; the moment it answers, run the queued
# measurements (experiments/tpu_pending.sh). Strictly one client: the
# probe and the runs are sequential. Writes status to /tmp/tpu_poll.log.
cd "$(dirname "$0")/.."
echo "[poll] start $(date -u +%H:%M:%S)" >> /tmp/tpu_poll.log
while true; do
  if timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "[poll] tunnel UP $(date -u +%H:%M:%S)" >> /tmp/tpu_poll.log
    touch /tmp/tpu_up
    bash experiments/tpu_pending.sh >> /tmp/tpu_poll.log 2>&1
    echo "[poll] pending runs done $(date -u +%H:%M:%S)" >> /tmp/tpu_poll.log
    touch /tmp/tpu_pending_done
    exit 0
  fi
  echo "[poll] down $(date -u +%H:%M:%S)" >> /tmp/tpu_poll.log
  sleep 180
done
