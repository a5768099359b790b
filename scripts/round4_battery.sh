#!/bin/bash
# Round-4 TPU battery. Hygiene rules learned from round 3 (VERDICT weak #5):
#   * every leg COMMITS its artifact immediately — a killed battery loses
#     one leg, not the round;
#   * the gate checkpoint is guarded (ADVICE r3 medium): no checkpoint, no
#     protocol legs — the silent random-init fallback must never produce a
#     plausible-looking report again;
#   * quality legs first (the round-4 centerpiece), perf legs after.
# Waits for the trainer (PID in /tmp/train_m4.pid) to finish first.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

RUN=save/synthetic_unet_m
WOMM_SAMPLES=${WOMM_SAMPLES:-256}
GUID=2.5

PID=$(cat /tmp/train_m4.pid 2>/dev/null || echo "")
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 120; done
fi
sleep 15
echo "=== trainer done; battery starts $(date) ==="

CKPT=$(ls -d $RUN/ckpt_* 2>/dev/null | sort | tail -1)
if [ -z "$CKPT" ]; then
  echo "FATAL: no gate checkpoint under $RUN — aborting all protocol legs"
  exit 1
fi
# the protocol is meaningless on an unconditioned model (round-3 post-mortem)
python - <<'EOF' || exit 1
import json
a = json.load(open("save/synthetic_unet_m/args.json"))
assert a.get("keyframe_conditioned"), "gate run is NOT keyframe-conditioned"
EOF
echo "gate checkpoint: $CKPT"

commit () {  # commit <msg> <paths...>
  msg=$1; shift
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg" && echo "[committed] $msg" || echo "[nothing to commit] $msg"
}

echo "--- 1/11 fid vs steps sweep (protocol guidance) ---"
timeout 5400 python scripts/fid_vs_steps.py --run_dir $RUN \
  --guidance_param $GUID --out $RUN/fid_vs_steps.json \
  > /tmp/r4_fid_sweep.log 2>&1
echo "exit=$? (fid sweep)"
commit "round 4: fid/keyframe-error vs training steps sweep (conditioned gate ckpt)" \
  $RUN/fid_vs_steps.json $RUN/args.json $RUN/progress.csv

echo "--- 2/11 EMA-vs-raw check at the final checkpoint ---"
timeout 1800 python -m condmdi_tpu.evals.run --eval_mode debug \
  --edit_mode benchmark_sparse --guidance_param $GUID --num_samples 32 \
  --use_ema true --model_path "$CKPT" --output_dir /tmp/r4_ema_out \
  > /tmp/r4_ema_check.log 2>&1
echo "exit=$? (ema check; compare /tmp/r4_ema_out vs sweep tail)"

echo "--- 3/11 wo_mm protocol bf16 (${WOMM_SAMPLES} samples) ---"
timeout 7200 python -m condmdi_tpu.evals.run --eval_mode wo_mm \
  --edit_mode benchmark_sparse --guidance_param $GUID \
  --num_samples $WOMM_SAMPLES --use_ema true --model_path "$CKPT" \
  > /tmp/r4_womm_bf16.log 2>&1
echo "exit=$? (wo_mm bf16)"
commit "round 4: wo_mm protocol report (bf16, ${WOMM_SAMPLES} samples, EMA)" \
  $RUN/eval_benchmark_sparse_wo_mm.json

echo "--- 4/11 wo_mm protocol int8_static ---"
timeout 7200 python -m condmdi_tpu.evals.run --eval_mode wo_mm \
  --edit_mode benchmark_sparse --guidance_param $GUID \
  --num_samples $WOMM_SAMPLES --use_ema true --precision_mode int8_static \
  --model_path "$CKPT" > /tmp/r4_womm_int8.log 2>&1
echo "exit=$? (wo_mm int8)"
commit "round 4: wo_mm protocol report (int8_static) — protocol delta gate artifacts complete" \
  $RUN/eval_benchmark_sparse_wo_mm_int8_static.json

echo "--- 5/11 drop-observation ablation (debug mode) ---"
timeout 1800 python -m condmdi_tpu.evals.run --eval_mode debug \
  --edit_mode benchmark_sparse --guidance_param $GUID --num_samples 64 \
  --use_ema true --drop_observations true --model_path "$CKPT" \
  > /tmp/r4_dropobs.log 2>&1
echo "exit=$? (drop-obs ablation)"
commit "round 4: drop-observation ablation report (conditioning causally used)" \
  $RUN/eval_benchmark_sparse_debug_dropobs.json

echo "--- 6/11 headline bench (int8_static) ---"
timeout 3600 python bench.py > /tmp/r4_bench.log 2>&1
echo "exit=$? (bench)"

echo "--- 7/11 bf16 fused-resblock end-to-end + unfused control ---"
BENCH_MODEL=unet BENCH_FUSED=1 timeout 3600 python bench.py > /tmp/r4_bench_fused.log 2>&1
echo "exit=$? (bench fused)"
BENCH_MODEL=unet timeout 3600 python bench.py > /tmp/r4_bench_bf16.log 2>&1
echo "exit=$? (bench bf16)"

echo "--- 8/11 bf16 tight-pad lever (BENCH_PAD=200) ---"
BENCH_MODEL=unet BENCH_PAD=200 timeout 3600 python bench.py > /tmp/r4_bench_pad200.log 2>&1
echo "exit=$? (bench pad200)"
BENCH_MODEL=unet_int8_static BENCH_PAD=200 timeout 3600 python bench.py > /tmp/r4_bench_int8_pad200.log 2>&1
echo "exit=$? (bench int8 pad200)"

echo "--- 9/11 resblock microbench ---"
timeout 1800 python scripts/resblock_microbench.py --iters 400 > /tmp/r4_resblock.log 2>&1
echo "exit=$? (resblock)"

echo "--- 10/11 conv suite ---"
timeout 1800 python scripts/conv_microbench.py --suite unet --iters 800 > /tmp/r4_conv_suite.log 2>&1
echo "exit=$? (conv suite)"

echo "--- 11/11 mm_short protocol ---"
timeout 10800 python -m condmdi_tpu.evals.run --eval_mode mm_short \
  --edit_mode benchmark_sparse --guidance_param $GUID --num_samples 64 \
  --use_ema true --model_path "$CKPT" > /tmp/r4_mm_short.log 2>&1
echo "exit=$? (mm_short)"
commit "round 4: mm_short protocol report (multimodality at protocol shape)" \
  $RUN/eval_benchmark_sparse_mm_short.json

echo "=== battery done $(date) ==="
