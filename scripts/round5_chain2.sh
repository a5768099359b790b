#!/bin/bash
# Round-5 chain 2: runs AFTER round5_battery.sh finishes (waits on its PID).
# Legs in judge-value order, each committing its artifact immediately
# (VERDICT r4 task 8: no script whose output never lands).
#
#   1. fid/keyframe-error vs steps sweep rerun (leg 2/6 of the battery died
#      on a transient remote-compile RPC error after one point; the script
#      now writes incrementally and retries transient failures)
#   2. mixed-step + per-channel int8 quality K-sweep (VERDICT task 4:
#      the two built-but-unmeasured int8 levers) -> committed JSON
#   3. int8_static_pc + mixed-step serving microbench (speed half of task 4)
#   4. B=128 saturation probe (task 5: does bigger batch close the 16%?)
#   5. default-headline bench confirmation on the live cache
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

RUN=save/synthetic_unet_m
CKPT=$RUN/ckpt_000100000
PERF=save/perf_r5
mkdir -p $PERF

commit () {
  msg=$1; shift
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg" && echo "[committed] $msg" || echo "[nothing to commit] $msg"
}

# wait for the battery to release the chip
if [ -f /tmp/battery.pid ]; then
  BPID=$(cat /tmp/battery.pid)
  while kill -0 "$BPID" 2>/dev/null; do sleep 60; done
fi
echo "=== round-5 chain2 starts $(date) ==="

echo "--- 1/5 fid vs steps sweep (retry of battery leg 2) ---"
timeout 9000 python scripts/fid_vs_steps.py --run_dir $RUN \
  --guidance_param 1.0 --num_samples 256 --use_ema true \
  --max_replications 3 --update true \
  --out $RUN/fid_vs_steps.json > /tmp/r5_fid_sweep2.log 2>&1
echo "exit=$? (fid sweep)"
commit "round 5: fid/keyframe-error vs steps on the live 4096-clip gate run (EMA, 256x3)" \
  $RUN/fid_vs_steps.json

echo "--- 2/5 int8 quality levers: mixed-step K-sweep + per-channel static ---"
timeout 10800 python scripts/mixed_int8_exp.py --ckpt $CKPT \
  --k_list 50,250 --out $RUN/mixed_int8_quality.json \
  > /tmp/r5_mixed_int8.log 2>&1
echo "exit=$? (mixed int8)"
commit "round 5: measured the mixed-step + per-channel int8 quality levers (VERDICT task 4)" \
  $RUN/mixed_int8_quality.json

echo "--- 3/5 int8 serving microbenches ---"
timeout 5400 env BENCH_MODEL=unet_int8_static_pc python bench.py \
  > $PERF/bench_int8_static_pc.json 2> /tmp/r5_bench_pc.log
echo "exit=$? (static_pc bench)"
timeout 5400 env BENCH_MODEL=unet_int8_mixed BENCH_FLOAT_LAST_K=50 python bench.py \
  > $PERF/bench_int8_mixed_k50.json 2> /tmp/r5_bench_mixed.log
echo "exit=$? (mixed bench)"
commit "round 5: int8_static_pc + mixed-step serving microbenches" \
  $PERF/bench_int8_static_pc.json $PERF/bench_int8_mixed_k50.json

echo "--- 4/5 bf16 B=128 saturation probe ---"
timeout 5400 env BENCH_BATCH=128 python bench.py \
  > $PERF/bench_bf16_b128.json 2> /tmp/r5_bench_b128.log
echo "exit=$? (b128 bench)"
commit "round 5: bf16 B=128 saturation probe (VERDICT task 5)" \
  $PERF/bench_bf16_b128.json

echo "--- 5/5 default headline bench ---"
timeout 3600 python bench.py > $PERF/bench_default.json 2> /tmp/r5_bench_default.log
echo "exit=$? (default bench)"
commit "round 5: default headline bench on the live cache" \
  $PERF/bench_default.json

echo "=== round-5 chain2 done $(date) ==="
