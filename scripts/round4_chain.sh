#!/bin/bash
# Wait for the 4096-item retrain to finish (ckpt_000100000 lands), then run
# the recovery battery. Keeps the chip pipeline self-driving: train -> sweep
# -> protocol pair -> ablations, each leg committing its artifact.
set -u
cd /root/repo

RUN=save/synthetic_unet_m
TRAIN_PID=$(cat /tmp/train_m5.pid 2>/dev/null || echo "")

echo "waiting for $RUN/ckpt_000100000 (train pid ${TRAIN_PID:-?})"
while :; do
  [ -d "$RUN/ckpt_000100000" ] && break
  if [ -n "$TRAIN_PID" ] && ! kill -0 "$TRAIN_PID" 2>/dev/null; then
    # trainer exited without the final checkpoint: run the battery against
    # whatever landed rather than hanging forever
    echo "trainer exited early; proceeding with latest checkpoint"
    break
  fi
  sleep 60
done
# let the final save settle
sleep 30

bash scripts/round4_battery4.sh
