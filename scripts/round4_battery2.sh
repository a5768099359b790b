#!/bin/bash
# Round-4 battery, part 2 — runs after round4_battery.sh's mm_short leg.
# Closes the three round-4 loose ends on the chip:
#   1. the int8_static wo_mm artifact (battery-1 leg 4 crashed: q_sample
#      calibration clipped under CFG extrapolation and the scan diverged;
#      re-run with trajectory calibration);
#   2. the guidance-1.0 quality pass (round4_quality_g1.sh);
#   3. the fused-resblock + verify-precision perf legs that failed or
#      mis-verified in battery 1 (VMEM OOM fixed; verify at f32-highest).
# Same hygiene: each leg commits its artifact immediately.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

RUN=save/synthetic_unet_m
WOMM_SAMPLES=${WOMM_SAMPLES:-256}

PID=$(cat /tmp/r4_battery.pid 2>/dev/null || echo "")
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 120; done
fi
sleep 15
echo "=== battery 1 done; battery 2 starts $(date) ==="

CKPT=$(ls -d $RUN/ckpt_* 2>/dev/null | sort | tail -1)
[ -n "$CKPT" ] || { echo "FATAL: no gate checkpoint"; exit 1; }
python - <<'EOF' || exit 1
import json
a = json.load(open("save/synthetic_unet_m/args.json"))
assert a.get("keyframe_conditioned"), "gate run is NOT keyframe-conditioned"
EOF
echo "gate checkpoint: $CKPT"

commit () {
  msg=$1; shift
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg" && echo "[committed] $msg" || echo "[nothing to commit] $msg"
}

echo "--- 1/7 wo_mm int8_static at protocol guidance 2.5 (trajectory calibration) ---"
timeout 7200 python -m condmdi_tpu.evals.run --eval_mode wo_mm \
  --edit_mode benchmark_sparse --guidance_param 2.5 \
  --num_samples $WOMM_SAMPLES --use_ema true --precision_mode int8_static \
  --model_path "$CKPT" > /tmp/r4_womm_int8_v2.log 2>&1
echo "exit=$? (wo_mm int8 g2.5)"
commit "round 4: wo_mm int8_static report at guidance 2.5 (trajectory-calibrated) — delta gate pair complete" \
  $RUN/eval_benchmark_sparse_wo_mm_int8_static.json

echo "--- 2/7 guidance-1.0 quality pass (reference protocol scale: 1000 samples) ---"
WOMM_SAMPLES=1000 bash scripts/round4_quality_g1.sh

echo "--- 3/7 resblock microbench (VMEM fix) ---"
timeout 2400 python scripts/resblock_microbench.py --iters 400 > /tmp/r4_resblock_v2.log 2>&1
echo "exit=$? (resblock microbench)"

echo "--- 4/7 bf16 fused vs unfused e2e (verify at f32-highest) ---"
BENCH_MODEL=unet BENCH_FUSED=1 timeout 3600 python bench.py > /tmp/r4_bench_fused_v2.log 2>&1
echo "exit=$? (bench fused)"
BENCH_MODEL=unet timeout 3600 python bench.py > /tmp/r4_bench_bf16_v2.log 2>&1
echo "exit=$? (bench bf16)"

echo "--- 5/7 pad200 legs with golden verify ---"
BENCH_MODEL=unet BENCH_PAD=200 timeout 3600 python bench.py > /tmp/r4_bench_pad200_v2.log 2>&1
echo "exit=$? (bench bf16 pad200)"
BENCH_MODEL=unet BENCH_PAD=200 BENCH_FUSED=1 timeout 3600 python bench.py > /tmp/r4_bench_pad200_fused.log 2>&1
echo "exit=$? (bench bf16 pad200 fused)"
BENCH_MODEL=unet_int8_static BENCH_PAD=200 timeout 3600 python bench.py > /tmp/r4_bench_int8_pad200_v2.log 2>&1
echo "exit=$? (bench int8 pad200)"

echo "--- 6/7 int8 batch saturation (B=128) ---"
BENCH_BATCH=128 timeout 3600 python bench.py > /tmp/r4_bench_int8_b128.log 2>&1
echo "exit=$? (bench int8 B=128)"

echo "--- 7/7 headline re-run (current default) ---"
timeout 3600 python bench.py > /tmp/r4_bench_final.log 2>&1
echo "exit=$? (bench final)"

echo "=== battery 2 done $(date) ==="
