#!/bin/bash
# Round-3 post-training TPU battery. Waits for the gate-checkpoint trainer
# (save/synthetic_unet_m, PID in /tmp/train_m.pid) to finish, then runs the
# measurement queue sequentially on the freed chip. Logs under /tmp/r3_*.log.
# The wo_mm legs use the LATEST checkpoint present (the trainer may be
# stopped early on a shared-session time budget; TrainLoop auto-resumes).
set -u
cd /root/repo
PID=$(cat /tmp/train_m.pid 2>/dev/null || echo "")
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 120; done
fi
sleep 20
echo "=== trainer done; battery starts $(date) ==="
CKPT=$(ls -d save/synthetic_unet_m/ckpt_* 2>/dev/null | sort | tail -1)
# guard against the trainer dying before its first save: an empty
# --model_path falls back to random init inside load_model_for_sampling
# and every wo_mm leg would "measure" an untrained model with exit=0.
[ -n "$CKPT" ] || { echo "FATAL: no gate checkpoint found; aborting battery"; exit 1; }
echo "gate checkpoint: $CKPT"

echo "--- 1/8 fid vs steps sweep ---"
timeout 3600 python scripts/fid_vs_steps.py --run_dir save/synthetic_unet_m \
  --guidance_param 2.5 --out save/synthetic_unet_m/fid_vs_steps.json \
  > /tmp/r3_fid_sweep.log 2>&1
echo "exit=$? (fid sweep)"

echo "--- 2/8 wo_mm protocol bf16 ---"
timeout 3600 python -m condmdi_tpu.evals.run --eval_mode wo_mm \
  --edit_mode benchmark_sparse --guidance_param 2.5 --num_samples 64 \
  --use_ema false --model_path "$CKPT" \
  > /tmp/r3_womm_bf16.log 2>&1
echo "exit=$? (wo_mm bf16)"

echo "--- 3/8 wo_mm protocol int8_static ---"
timeout 3600 python -m condmdi_tpu.evals.run --eval_mode wo_mm \
  --edit_mode benchmark_sparse --guidance_param 2.5 --num_samples 64 \
  --use_ema false --precision_mode int8_static --model_path "$CKPT" \
  > /tmp/r3_womm_int8.log 2>&1
echo "exit=$? (wo_mm int8)"

echo "--- 4/8 headline bench ---"
timeout 3600 python bench.py > /tmp/r3_bench.log 2>&1
echo "exit=$? (bench)"

echo "--- 5/8 bf16 UNet fused-resblock end-to-end ---"
BENCH_MODEL=unet BENCH_FUSED=1 timeout 3600 python bench.py \
  > /tmp/r3_bench_fused.log 2>&1
echo "exit=$? (bench fused)"

echo "--- 6/8 bf16 UNet unfused control ---"
BENCH_MODEL=unet timeout 3600 python bench.py > /tmp/r3_bench_bf16.log 2>&1
echo "exit=$? (bench bf16)"

echo "--- 7/8 resblock microbench ---"
timeout 1800 python scripts/resblock_microbench.py --iters 400 \
  > /tmp/r3_resblock.log 2>&1
echo "exit=$? (resblock)"

echo "--- 8/8 conv suite ---"
timeout 1800 python scripts/conv_microbench.py --suite unet --iters 800 \
  > /tmp/r3_conv_suite.log 2>&1
echo "exit=$? (conv suite)"

echo "=== battery done $(date) ==="
