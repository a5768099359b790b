#!/bin/bash
# Round-4 follow-up TPU queue. Waits for the EMA-256 fid_vs_steps sweep
# (PID in /tmp/sweep_ema256.pid or passed as $1) to free the chip, then:
#   1. mixed-step int8 experiment (which steps must stay float),
#   2. drop-observations fid_vs_steps sweep (is the FID drift specific to
#      imputation-constrained sampling?).
# Each leg logs under /tmp/ and is cheap (~10-30 min); artifacts land in
# save/synthetic_unet_m for the builder to inspect and commit.
set -u
cd /root/repo
PID="${1:-$(cat /tmp/sweep_ema256.pid 2>/dev/null || echo "")}"
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 60; done
fi
sleep 10
echo "=== chip free; queue starts $(date) ==="

echo "--- 1/2 mixed-step int8 experiment ---"
timeout 3600 python scripts/mixed_int8_exp.py --batch 32 \
  --k_list 50,250 > /tmp/mixed_exp_tpu.log 2>&1
echo "exit=$? (mixed int8)"

echo "--- 2/2 drop-observations fid sweep ---"
timeout 3600 python scripts/fid_vs_steps.py \
  --run_dir save/synthetic_unet_m --guidance_param 1.0 \
  --num_samples 256 --use_ema true --drop_observations true \
  --out save/synthetic_unet_m/fid_vs_steps_dropobs.json \
  > /tmp/sweep_dropobs.log 2>&1
echo "exit=$? (dropobs sweep)"
echo "=== queue done $(date) ==="
