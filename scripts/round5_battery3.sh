#!/bin/bash
# Round-5 battery, take 3. Takes 1 and 2 lost ~2 h to a flaky axon relay:
# an in-flight RPC occasionally vanishes (client blocks on a response that
# never comes) and the leg then burns its whole multi-hour timeout doing
# nothing. Every leg now runs under a CPU-stall watchdog: if the leg's
# process accrues NO cpu time for `stall` seconds (a healthy leg accrues
# continuously between execute RPCs; the only multi-minute legit freeze is
# a cold remote compile, bounded ~25 min), it is killed and retried once.
#
# Leg order (canary already landed in take 2): fid sweep -> wo_mm bf16
# anchor -> wo_mm int8_static -> mm_short -> mixed-int8 quality -> serving
# microbenches -> B=128 probe -> default bench. Run-then-commit per leg.
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

# run_leg <timeout_s> <stall_s> <logfile> cmd...
# watchdog: kill on wall timeout (no retry) or on frozen cpu-time (retry 1x)
run_leg () {
  local tmo=$1 stall=$2 log=$3; shift 3
  local attempt rc
  for attempt in 1 2; do
    ( exec "$@" ) > "$log" 2>&1 &
    local pid=$!
    local start now cpu last_cpu last_adv hung=0
    start=$(date +%s); last_cpu=-1; last_adv=$start
    while kill -0 "$pid" 2>/dev/null; do
      sleep 30
      now=$(date +%s)
      cpu=$(awk '{print $14+$15}' "/proc/$pid/stat" 2>/dev/null || echo "$last_cpu")
      if [ "$cpu" != "$last_cpu" ]; then last_cpu=$cpu; last_adv=$now; fi
      if [ $((now - last_adv)) -ge "$stall" ]; then
        echo "[watchdog] leg stalled (no cpu for ${stall}s) — killing pid $pid"
        hung=1; kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        break
      fi
      if [ $((now - start)) -ge "$tmo" ]; then
        echo "[watchdog] leg wall-timeout (${tmo}s) — killing pid $pid"
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        wait "$pid" 2>/dev/null
        return 124
      fi
    done
    wait "$pid" 2>/dev/null; rc=$?
    if [ "$hung" = 1 ]; then
      echo "[watchdog] retrying leg (attempt $attempt was hung)"
      continue
    fi
    return $rc
  done
  return 125
}

echo "=== round-5 battery3 starts $(date) ==="

echo "--- 1/8 fid/keyframe-error vs steps sweep (256x3, EMA, g1.0) ---"
run_leg 7200 1200 /tmp/r5_fid_sweep3.log \
  python scripts/fid_vs_steps.py --run_dir $RUN \
  --guidance_param 1.0 --num_samples 256 --use_ema true \
  --max_replications 3 --update true --out $RUN/fid_vs_steps.json
echo "exit=$? (fid sweep)"
commit "round 5: fid/keyframe-error vs steps on the live 4096-clip gate run (EMA, 256x3)" \
  $RUN/fid_vs_steps.json

echo "--- 2/8 g1.0 wo_mm bf16 (1000x20 protocol anchor) ---"
run_leg 9000 1200 /tmp/r5_womm_bf16.log \
  python -m condmdi_tpu.evals.run --eval_mode wo_mm \
  --edit_mode benchmark_sparse --guidance_param 1.0 \
  --num_samples 1000 --use_ema true --model_path "$CKPT"
echo "exit=$? (wo_mm bf16)"
commit "round 5: live wo_mm protocol report, bf16 EMA g1.0 992x20 (protocol anchor)" \
  $RUN/eval_benchmark_sparse_wo_mm.json

echo "--- 3/8 g1.0 wo_mm int8_static (delta-gate pair) ---"
run_leg 9000 2100 /tmp/r5_womm_int8.log \
  python -m condmdi_tpu.evals.run --eval_mode wo_mm \
  --edit_mode benchmark_sparse --guidance_param 1.0 \
  --num_samples 1000 --use_ema true --precision_mode int8_static \
  --model_path "$CKPT"
echo "exit=$? (wo_mm int8)"
commit "round 5: live wo_mm int8_static report (protocol delta-gate pair)" \
  $RUN/eval_benchmark_sparse_wo_mm_int8_static.json

echo "--- 4/8 mm_short ---"
run_leg 5400 1200 /tmp/r5_mmshort.log \
  python -m condmdi_tpu.evals.run --eval_mode mm_short \
  --edit_mode benchmark_sparse --guidance_param 1.0 \
  --num_samples 256 --use_ema true --model_path "$CKPT"
echo "exit=$? (mm_short)"
commit "round 5: live mm_short multimodality report" \
  $RUN/eval_benchmark_sparse_mm_short.json

echo "--- 5/8 int8 quality levers: mixed-step K-sweep (+per-channel) ---"
run_leg 9000 2100 /tmp/r5_mixed_int8.log \
  python scripts/mixed_int8_exp.py --ckpt $CKPT \
  --k_list 50,250 --out $RUN/mixed_int8_quality.json
echo "exit=$? (mixed int8)"
commit "round 5: measured the mixed-step + per-channel int8 quality levers (VERDICT task 4)" \
  $RUN/mixed_int8_quality.json

echo "--- 6/8 int8 serving microbenches ---"
run_leg 3600 2100 /tmp/r5_bench_pc.log \
  env BENCH_MODEL=unet_int8_static_pc BENCH_OUT=$PERF/bench_int8_static_pc.json python bench.py
echo "exit=$? (static_pc bench)"
run_leg 3600 2100 /tmp/r5_bench_mixed.log \
  env BENCH_MODEL=unet_int8_mixed BENCH_FLOAT_LAST_K=50 BENCH_OUT=$PERF/bench_int8_mixed_k50.json python bench.py
echo "exit=$? (mixed bench)"
commit "round 5: int8_static_pc + mixed-step serving microbenches" \
  $PERF/bench_int8_static_pc.json $PERF/bench_int8_mixed_k50.json

echo "--- 7/8 bf16 B=128 saturation probe ---"
run_leg 3600 2100 /tmp/r5_bench_b128.log \
  env BENCH_BATCH=128 BENCH_OUT=$PERF/bench_bf16_b128.json python bench.py
echo "exit=$? (b128 bench)"
commit "round 5: bf16 B=128 saturation probe (VERDICT task 5)" \
  $PERF/bench_bf16_b128.json

echo "--- 8/8 default headline bench ---"
run_leg 3600 2100 /tmp/r5_bench_default.log \
  env BENCH_OUT=$PERF/bench_default.json python bench.py
echo "exit=$? (default bench)"
commit "round 5: default headline bench on the live cache" \
  $PERF/bench_default.json

echo "=== round-5 battery3 done $(date) ==="
