#!/bin/bash
# Round-5 tail: replaces battery3's legs 5-8 when the round's remaining
# wall-clock can't fit them all. Priority order: B=128 saturation probe
# (task 5 — the cheapest shot at >=20x bf16), default headline bench
# (BENCH_r05 confirmation, cache hit), then the trimmed mixed-step int8
# quality sweep (task 4; K=50 pair only, --skip_pc: each extra variant is
# a ~20-min serialized remote compile). The full static_pc microbench and
# the K=250 pair are dropped if unreached — documented in BENCH_NOTES.
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

echo "=== round-5 tail starts $(date) ==="

echo "--- 1/4 bf16 B=128 saturation probe ---"
run_leg 3600 2100 /tmp/r5_bench_b128.log \
  env BENCH_BATCH=128 BENCH_OUT=$PERF/bench_bf16_b128.json python bench.py
echo "exit=$? (b128 bench)"
commit "round 5: bf16 B=128 saturation probe (VERDICT task 5)" \
  $PERF/bench_bf16_b128.json

echo "--- 2/4 default headline bench ---"
run_leg 3600 2100 /tmp/r5_bench_default.log \
  env BENCH_OUT=$PERF/bench_default.json python bench.py
echo "exit=$? (default bench)"
commit "round 5: default headline bench on the live cache" \
  $PERF/bench_default.json

echo "--- 3/4 mixed-step int8 quality (K=50 pair, trimmed) ---"
run_leg 7200 2100 /tmp/r5_mixed_int8.log \
  python scripts/mixed_int8_exp.py --ckpt $CKPT \
  --k_list 50 --skip_pc true --out $RUN/mixed_int8_quality.json
echo "exit=$? (mixed int8)"
commit "round 5: mixed-step int8 quality K=50 pair (VERDICT task 4, trimmed for chip time)" \
  $RUN/mixed_int8_quality.json

echo "--- 4/4 int8_static_pc microbench (if time remains) ---"
run_leg 3600 2100 /tmp/r5_bench_pc.log \
  env BENCH_MODEL=unet_int8_static_pc BENCH_OUT=$PERF/bench_int8_static_pc.json python bench.py
echo "exit=$? (static_pc bench)"
commit "round 5: int8_static_pc serving microbench" \
  $PERF/bench_int8_static_pc.json

echo "=== round-5 tail done $(date) ==="
