#!/bin/bash
# Round-4 regeneration battery: re-derive every load-bearing protocol
# artifact with the deterministically-seeded eval CLIs (seed_all), so the
# committed reports re-derive bit-close on the SAME platform (the repro
# test's tight tier) instead of only surviving the loose cross-platform
# band. Each leg commits its artifact immediately (VERDICT r3 weak #5:
# measurement must not be the last thing in the round).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

RUN=save/synthetic_unet_m
CKPT=$(ls -d $RUN/ckpt_* 2>/dev/null | sort | tail -1)
[ -n "$CKPT" ] || { echo "FATAL: no gate checkpoint"; exit 1; }
python - <<EOF || { echo "FATAL: gate run is not keyframe-conditioned"; exit 1; }
import json; assert json.load(open("$RUN/args.json")).get("keyframe_conditioned")
EOF

commit () {
  msg=$1; shift
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg" && echo "[committed] $msg" || echo "[nothing to commit] $msg"
}

echo "--- regen 1/6: wo_mm bf16 g1.0 (1000 samples) ---"
timeout 7200 python -m condmdi_tpu.evals.run --eval_mode wo_mm \
  --edit_mode benchmark_sparse --guidance_param 1.0 --num_samples 1000 \
  --use_ema true --model_path "$CKPT" > /tmp/r4b3_womm_bf16.log 2>&1
echo "exit=$? (wo_mm bf16 g1)"
commit "regen wo_mm bf16 g1.0 report under deterministic eval seeding" \
  $RUN/eval_benchmark_sparse_wo_mm.json

echo "--- regen 2/6: wo_mm int8_static g1.0 (delta-gate pair) ---"
timeout 7200 python -m condmdi_tpu.evals.run --eval_mode wo_mm \
  --edit_mode benchmark_sparse --guidance_param 1.0 --num_samples 1000 \
  --use_ema true --precision_mode int8_static --model_path "$CKPT" \
  > /tmp/r4b3_womm_int8.log 2>&1
echo "exit=$? (wo_mm int8 g1)"
commit "regen wo_mm int8_static g1.0 report (delta-gate pair) under deterministic seeding" \
  $RUN/eval_benchmark_sparse_wo_mm_int8_static.json

echo "--- regen 3/6: drop-observation ablation ---"
timeout 1800 python -m condmdi_tpu.evals.run --eval_mode debug \
  --edit_mode benchmark_sparse --guidance_param 1.0 --num_samples 64 \
  --use_ema true --drop_observations true --model_path "$CKPT" \
  > /tmp/r4b3_dropobs.log 2>&1
echo "exit=$? (drop-obs)"
commit "regen drop-observation ablation under deterministic seeding" \
  $RUN/eval_benchmark_sparse_debug_dropobs.json

echo "--- regen 4/6: mm_short (protocol multimodality) ---"
timeout 3600 python -m condmdi_tpu.evals.run --eval_mode mm_short \
  --edit_mode benchmark_sparse --guidance_param 2.5 --num_samples 64 \
  --use_ema true --model_path "$CKPT" > /tmp/r4b3_mm.log 2>&1
echo "exit=$? (mm_short)"
commit "regen mm_short protocol report under deterministic seeding" \
  $RUN/eval_benchmark_sparse_mm_short.json

echo "--- regen 5/6: wo_mm bf16 g2.5 (256 samples, protocol-parity point) ---"
timeout 3600 python -m condmdi_tpu.evals.run --eval_mode wo_mm \
  --edit_mode benchmark_sparse --guidance_param 2.5 --num_samples 256 \
  --use_ema true --model_path "$CKPT" --output_dir /tmp/r4b3_g25 \
  > /tmp/r4b3_womm_bf16_g25.log 2>&1
echo "exit=$? (wo_mm bf16 g2.5)"
[ -f /tmp/r4b3_g25/eval_benchmark_sparse_wo_mm.json ] && \
  cp /tmp/r4b3_g25/eval_benchmark_sparse_wo_mm.json $RUN/eval_benchmark_sparse_wo_mm_g2.5.json
commit "regen wo_mm bf16 g2.5 report under deterministic seeding" \
  $RUN/eval_benchmark_sparse_wo_mm_g2.5.json

echo "--- regen 6/6: wo_mm int8_static g2.5 ---"
timeout 3600 python -m condmdi_tpu.evals.run --eval_mode wo_mm \
  --edit_mode benchmark_sparse --guidance_param 2.5 --num_samples 256 \
  --use_ema true --precision_mode int8_static --model_path "$CKPT" \
  --output_dir /tmp/r4b3_g25 > /tmp/r4b3_womm_int8_g25.log 2>&1
echo "exit=$? (wo_mm int8 g2.5)"
[ -f /tmp/r4b3_g25/eval_benchmark_sparse_wo_mm_int8_static.json ] && \
  cp /tmp/r4b3_g25/eval_benchmark_sparse_wo_mm_int8_static.json \
     $RUN/eval_benchmark_sparse_wo_mm_int8_static_g2.5.json
commit "regen wo_mm int8_static g2.5 report under deterministic seeding" \
  $RUN/eval_benchmark_sparse_wo_mm_int8_static_g2.5.json

echo "=== regen battery done $(date) ==="
