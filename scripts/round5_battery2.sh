#!/bin/bash
# Round-5 battery, take 2: the first battery's protocol legs died on a
# geometry NaN (one degenerate generated clip NaN'd the abs->rel IK — fixed
# by commit "make the joints->features geometry total"). This battery
# regenerates the FULL live protocol report set plus the perf legs, with
# run-then-commit per leg (VERDICT r4 task 8). Cheap canary leg first so a
# surviving NaN costs minutes, not the anchor's hour.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

RUN=save/synthetic_unet_m
CKPT=$RUN/ckpt_000100000
PERF=save/perf_r5
mkdir -p $PERF
[ -d "$CKPT" ] || { echo "FATAL: $CKPT missing"; exit 1; }

commit () {
  msg=$1; shift
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg" && echo "[committed] $msg" || echo "[nothing to commit] $msg"
}

echo "=== round-5 battery2 starts $(date) ==="

echo "--- 1/9 drop-observation ablation (cheap canary for the NaN fix) ---"
timeout 3600 python -m condmdi_tpu.evals.run --eval_mode debug \
  --edit_mode benchmark_sparse --guidance_param 1.0 --num_samples 64 \
  --use_ema true --drop_observations true --model_path "$CKPT" \
  > /tmp/r5_dropobs.log 2>&1
rc=$?
echo "exit=$rc (drop-obs canary)"
if [ $rc -ne 0 ]; then
  echo "FATAL: canary leg failed — aborting before the expensive legs"
  exit 1
fi
commit "round 5: live drop-observation ablation (conditioning causally used)" \
  $RUN/eval_benchmark_sparse_debug_dropobs.json

echo "--- 2/9 fid/keyframe-error vs steps sweep (256x3, EMA, g1.0) ---"
timeout 9000 python scripts/fid_vs_steps.py --run_dir $RUN \
  --guidance_param 1.0 --num_samples 256 --use_ema true \
  --max_replications 3 --update true \
  --out $RUN/fid_vs_steps.json > /tmp/r5_fid_sweep2.log 2>&1
echo "exit=$? (fid sweep)"
commit "round 5: fid/keyframe-error vs steps on the live 4096-clip gate run (EMA, 256x3)" \
  $RUN/fid_vs_steps.json

echo "--- 3/9 g1.0 wo_mm bf16 (1000x20 protocol anchor) ---"
timeout 10800 python -m condmdi_tpu.evals.run --eval_mode wo_mm \
  --edit_mode benchmark_sparse --guidance_param 1.0 \
  --num_samples 1000 --use_ema true --model_path "$CKPT" \
  > /tmp/r5_womm_bf16.log 2>&1
echo "exit=$? (wo_mm bf16)"
commit "round 5: live wo_mm protocol report, bf16 EMA g1.0 992x20 (protocol anchor)" \
  $RUN/eval_benchmark_sparse_wo_mm.json

echo "--- 4/9 g1.0 wo_mm int8_static (delta-gate pair) ---"
timeout 10800 python -m condmdi_tpu.evals.run --eval_mode wo_mm \
  --edit_mode benchmark_sparse --guidance_param 1.0 \
  --num_samples 1000 --use_ema true --precision_mode int8_static \
  --model_path "$CKPT" > /tmp/r5_womm_int8.log 2>&1
echo "exit=$? (wo_mm int8)"
commit "round 5: live wo_mm int8_static report (protocol delta-gate pair)" \
  $RUN/eval_benchmark_sparse_wo_mm_int8_static.json

echo "--- 5/9 mm_short ---"
timeout 7200 python -m condmdi_tpu.evals.run --eval_mode mm_short \
  --edit_mode benchmark_sparse --guidance_param 1.0 \
  --num_samples 256 --use_ema true --model_path "$CKPT" \
  > /tmp/r5_mmshort.log 2>&1
echo "exit=$? (mm_short)"
commit "round 5: live mm_short multimodality report" \
  $RUN/eval_benchmark_sparse_mm_short.json

echo "--- 6/9 int8 quality levers: mixed-step K-sweep + per-channel static ---"
timeout 10800 python scripts/mixed_int8_exp.py --ckpt $CKPT \
  --k_list 50,250 --out $RUN/mixed_int8_quality.json \
  > /tmp/r5_mixed_int8.log 2>&1
echo "exit=$? (mixed int8)"
commit "round 5: measured the mixed-step + per-channel int8 quality levers (VERDICT task 4)" \
  $RUN/mixed_int8_quality.json

echo "--- 7/9 int8 serving microbenches ---"
timeout 5400 env BENCH_MODEL=unet_int8_static_pc python bench.py \
  > $PERF/bench_int8_static_pc.json 2> /tmp/r5_bench_pc.log
echo "exit=$? (static_pc bench)"
timeout 5400 env BENCH_MODEL=unet_int8_mixed BENCH_FLOAT_LAST_K=50 python bench.py \
  > $PERF/bench_int8_mixed_k50.json 2> /tmp/r5_bench_mixed.log
echo "exit=$? (mixed bench)"
commit "round 5: int8_static_pc + mixed-step serving microbenches" \
  $PERF/bench_int8_static_pc.json $PERF/bench_int8_mixed_k50.json

echo "--- 8/9 bf16 B=128 saturation probe ---"
timeout 5400 env BENCH_BATCH=128 python bench.py \
  > $PERF/bench_bf16_b128.json 2> /tmp/r5_bench_b128.log
echo "exit=$? (b128 bench)"
commit "round 5: bf16 B=128 saturation probe (VERDICT task 5)" \
  $PERF/bench_bf16_b128.json

echo "--- 9/9 default headline bench ---"
timeout 3600 python bench.py > $PERF/bench_default.json 2> /tmp/r5_bench_default.log
echo "exit=$? (default bench)"
commit "round 5: default headline bench on the live cache" \
  $PERF/bench_default.json

echo "=== round-5 battery2 done $(date) ==="
