#!/bin/bash
# Round-5 quality battery: regenerate the FULL protocol report set against
# the LIVE 4096-clip gate checkpoint (VERDICT r4 task 1), with the
# run-then-commit-per-leg discipline of task 8 — every leg lands its
# artifact in git before the next leg starts, so a mid-battery death (the
# round-3 and round-4 failure) can no longer strand the round's evidence.
#
# Preconditions: the retrain to 100k has finished (ckpt_000100000 exists)
# and the fast gate is green. Run on the TPU chip.
#
# Legs (cheap/critical first, per task 8):
#   1. durable EMA export of the gate checkpoint -> committed npz (task 2)
#   2. g1.0 fid/keyframe-error vs steps sweep (task 1 centerpiece)
#   3. g1.0 wo_mm bf16, 1000 samples x 20 replications (protocol anchor)
#   4. g1.0 wo_mm int8_static, same shape (delta-gate pair)
#   5. g1.0 drop-observation ablation (causality)
#   6. mm_short (multimodality at protocol shape)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

RUN=save/synthetic_unet_m
CKPT=$RUN/ckpt_000100000
[ -d "$CKPT" ] || { echo "FATAL: $CKPT missing — retrain not finished"; exit 1; }

commit () {
  msg=$1; shift
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg" && echo "[committed] $msg" || echo "[nothing to commit] $msg"
}

echo "=== round-5 battery starts $(date) ==="

echo "--- 1/6 durable EMA export ---"
timeout 900 python scripts/gate_params_io.py export --ckpt $CKPT \
  > /tmp/r5_export.log 2>&1
echo "exit=$? (gate export)"
commit "gate durability: committed EMA params npz for the 100k gate checkpoint" \
  $RUN/gate_ema_000100000.npz $RUN/progress.csv $RUN/log.txt

echo "--- 2/6 g1.0 fid vs steps sweep (256 samples, EMA, 3 reps) ---"
timeout 7200 python scripts/fid_vs_steps.py --run_dir $RUN \
  --guidance_param 1.0 --num_samples 256 --use_ema true \
  --max_replications 3 --update true \
  --out $RUN/fid_vs_steps.json > /tmp/r5_fid_sweep.log 2>&1
echo "exit=$? (g1 fid sweep)"
commit "round 5: fid/keyframe-error vs steps on the live 4096-clip gate run (EMA, 256x3)" \
  $RUN/fid_vs_steps.json

echo "--- 3/6 g1.0 wo_mm bf16 (1000x20) ---"
timeout 10800 python -m condmdi_tpu.evals.run --eval_mode wo_mm \
  --edit_mode benchmark_sparse --guidance_param 1.0 \
  --num_samples 1000 --use_ema true --model_path "$CKPT" \
  > /tmp/r5_womm_bf16.log 2>&1
echo "exit=$? (wo_mm bf16)"
commit "round 5: live wo_mm protocol report, bf16 EMA g1.0 992x20 (protocol anchor)" \
  $RUN/eval_benchmark_sparse_wo_mm.json

echo "--- 4/6 g1.0 wo_mm int8_static (delta-gate pair) ---"
timeout 10800 python -m condmdi_tpu.evals.run --eval_mode wo_mm \
  --edit_mode benchmark_sparse --guidance_param 1.0 \
  --num_samples 1000 --use_ema true --precision_mode int8_static \
  --model_path "$CKPT" > /tmp/r5_womm_int8.log 2>&1
echo "exit=$? (wo_mm int8)"
commit "round 5: live wo_mm int8_static report (protocol delta-gate pair)" \
  $RUN/eval_benchmark_sparse_wo_mm_int8_static.json

echo "--- 5/6 g1.0 drop-observation ablation ---"
timeout 3600 python -m condmdi_tpu.evals.run --eval_mode debug \
  --edit_mode benchmark_sparse --guidance_param 1.0 --num_samples 64 \
  --use_ema true --drop_observations true --model_path "$CKPT" \
  > /tmp/r5_dropobs.log 2>&1
echo "exit=$? (drop-obs)"
commit "round 5: live drop-observation ablation (conditioning causally used)" \
  $RUN/eval_benchmark_sparse_debug_dropobs.json

echo "--- 6/6 mm_short ---"
timeout 7200 python -m condmdi_tpu.evals.run --eval_mode mm_short \
  --edit_mode benchmark_sparse --guidance_param 1.0 \
  --num_samples 256 --use_ema true --model_path "$CKPT" \
  > /tmp/r5_mmshort.log 2>&1
echo "exit=$? (mm_short)"
commit "round 5: live mm_short multimodality report" \
  $RUN/eval_benchmark_sparse_mm_short.json

echo "=== round-5 battery done $(date) ==="
