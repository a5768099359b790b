#!/bin/bash
# Round-4 recovery battery: the 100k retrain (loss 0.154 vs the lost run's
# 0.244) obsoleted every protocol artifact, so re-derive them all against
# the new checkpoints. Measurement-first ordering (VERDICT r3 weak #5):
# quality centerpiece sweep, then the wo_mm protocol pair, then ablations,
# then the exploratory experiments. Each leg commits its artifact the
# moment it lands.
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

echo "=== battery4 starts $(date), gate ckpt $CKPT ==="

echo "--- 1/8: fid/keyframe-error vs steps sweep (EMA, 256 samples x 3 reps, g1.0) ---"
timeout 7200 python scripts/fid_vs_steps.py --run_dir $RUN \
  --guidance_param 1.0 --num_samples 256 --use_ema true \
  --max_replications 3 --out $RUN/fid_vs_steps.json \
  > /tmp/r4b4_fid_sweep.log 2>&1
echo "exit=$? (fid sweep)"
commit "round 4 recovery: fid/keyframe-error vs steps sweep on the 100k retrain (EMA, 256x3)" \
  $RUN/fid_vs_steps.json

echo "--- 2/8: wo_mm bf16 g1.0 (1000 samples) ---"
timeout 7200 python -m condmdi_tpu.evals.run --eval_mode wo_mm \
  --edit_mode benchmark_sparse --guidance_param 1.0 --num_samples 1000 \
  --use_ema true --model_path "$CKPT" > /tmp/r4b4_womm_bf16.log 2>&1
echo "exit=$? (wo_mm bf16 g1)"
commit "round 4 recovery: wo_mm protocol report on the 100k retrain (bf16, EMA, 1000 samples)" \
  $RUN/eval_benchmark_sparse_wo_mm.json

echo "--- 3/8: wo_mm int8_static g1.0 (delta-gate pair) ---"
timeout 7200 python -m condmdi_tpu.evals.run --eval_mode wo_mm \
  --edit_mode benchmark_sparse --guidance_param 1.0 --num_samples 1000 \
  --use_ema true --precision_mode int8_static --model_path "$CKPT" \
  > /tmp/r4b4_womm_int8.log 2>&1
echo "exit=$? (wo_mm int8 g1)"
commit "round 4 recovery: wo_mm int8_static report (protocol delta-gate pair)" \
  $RUN/eval_benchmark_sparse_wo_mm_int8_static.json

echo "--- 4/8: drop-observation ablation ---"
timeout 1800 python -m condmdi_tpu.evals.run --eval_mode debug \
  --edit_mode benchmark_sparse --guidance_param 1.0 --num_samples 64 \
  --use_ema true --drop_observations true --model_path "$CKPT" \
  > /tmp/r4b4_dropobs.log 2>&1
echo "exit=$? (drop-obs)"
commit "round 4 recovery: drop-observation ablation (conditioning causally used)" \
  $RUN/eval_benchmark_sparse_debug_dropobs.json

echo "--- 5/8: mm_short (protocol multimodality) ---"
timeout 3600 python -m condmdi_tpu.evals.run --eval_mode mm_short \
  --edit_mode benchmark_sparse --guidance_param 2.5 --num_samples 64 \
  --use_ema true --model_path "$CKPT" > /tmp/r4b4_mm.log 2>&1
echo "exit=$? (mm_short)"
commit "round 4 recovery: mm_short protocol report" \
  $RUN/eval_benchmark_sparse_mm_short.json

echo "--- 6/8: wo_mm g2.5 pair (256 samples, protocol-parity point) ---"
timeout 3600 python -m condmdi_tpu.evals.run --eval_mode wo_mm \
  --edit_mode benchmark_sparse --guidance_param 2.5 --num_samples 256 \
  --use_ema true --model_path "$CKPT" --output_dir /tmp/r4b4_g25 \
  > /tmp/r4b4_womm_bf16_g25.log 2>&1
echo "exit=$? (wo_mm bf16 g2.5)"
[ -f /tmp/r4b4_g25/eval_benchmark_sparse_wo_mm.json ] && \
  cp /tmp/r4b4_g25/eval_benchmark_sparse_wo_mm.json $RUN/eval_benchmark_sparse_wo_mm_g2.5.json
timeout 3600 python -m condmdi_tpu.evals.run --eval_mode wo_mm \
  --edit_mode benchmark_sparse --guidance_param 2.5 --num_samples 256 \
  --use_ema true --precision_mode int8_static --model_path "$CKPT" \
  --output_dir /tmp/r4b4_g25 > /tmp/r4b4_womm_int8_g25.log 2>&1
echo "exit=$? (wo_mm int8 g2.5)"
[ -f /tmp/r4b4_g25/eval_benchmark_sparse_wo_mm_int8_static.json ] && \
  cp /tmp/r4b4_g25/eval_benchmark_sparse_wo_mm_int8_static.json \
     $RUN/eval_benchmark_sparse_wo_mm_int8_static_g2.5.json
commit "round 4 recovery: wo_mm g2.5 pair (protocol-parity point)" \
  $RUN/eval_benchmark_sparse_wo_mm_g2.5.json \
  $RUN/eval_benchmark_sparse_wo_mm_int8_static_g2.5.json

echo "--- 7/8: mixed-step int8 experiment ---"
timeout 3600 python scripts/mixed_int8_exp.py --batch 32 \
  --k_list 50,250 > /tmp/r4b4_mixed_exp.log 2>&1
echo "exit=$? (mixed int8)"
# the experiment reports to stdout; keep the log as the committed artifact
grep -E "^\[" /tmp/r4b4_mixed_exp.log > $RUN/mixed_int8_exp.txt || true
[ -s $RUN/mixed_int8_exp.txt ] && \
  commit "round 4: mixed-step int8 experiment (which sampler steps must stay float)" \
    $RUN/mixed_int8_exp.txt

echo "--- 8/8: drop-observations fid sweep ---"
timeout 5400 python scripts/fid_vs_steps.py --run_dir $RUN \
  --guidance_param 1.0 --num_samples 256 --use_ema true \
  --max_replications 3 --drop_observations true \
  --out $RUN/fid_vs_steps_dropobs.json > /tmp/r4b4_dropobs_sweep.log 2>&1
echo "exit=$? (dropobs sweep)"
commit "round 4: drop-observations fid-vs-steps sweep (isolate imputation's FID effect)" \
  $RUN/fid_vs_steps_dropobs.json

echo "=== battery4 done $(date) ==="
