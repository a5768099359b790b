"""AOT-precompile bench.py programs into the persistent compile cache.

The remote TPU compiler (axon relay) is server-bound, not chip-bound, so
compilation can overlap a running eval/bench leg: this script builds each
requested bench program through bench.build_run (identical HLO to what
bench.py main dispatches) and calls .lower().compile() WITHOUT executing
the 1000-step scan. The compiled executable lands in
JAX_COMPILATION_CACHE_DIR; the later real bench run is then a cache hit
(seconds instead of ~15-25 min cold).

The only chip contact is int8 calibration inside build_bench_model (a few
short forward passes) and input-buffer allocation — negligible next to the
protocol legs it overlaps.

Usage: python scripts/precompile_bench.py <which> [env KEY=VAL ...]
   or: python scripts/precompile_bench.py --all   (the round-5 perf legs)
"""
from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROUND5_CONFIGS = [
    ("unet_int8_static_pc", {}),
    ("unet_int8_mixed", {"BENCH_FLOAT_LAST_K": "50"}),
    ("unet", {"BENCH_BATCH": "128"}),
]


def precompile_one(which: str) -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from bench import build_run

    B = int(os.environ.get("BENCH_BATCH", "64"))
    t0 = time.time()
    run, params, y, obs_x0, obs_mask, label = build_run(which, B)
    print(f"[precompile] built {which} B={B} in {time.time() - t0:.0f}s "
          f"({label})", flush=True)
    t0 = time.time()
    run.lower(params, y, obs_x0, obs_mask, jax.random.key(0)).compile()
    print(f"[precompile] compiled {which} B={B} in {time.time() - t0:.0f}s",
          flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--all":
        # one subprocess per config: env vars (BENCH_BATCH etc.) and jax
        # state don't leak between programs
        for which, env in ROUND5_CONFIGS:
            cmd = [sys.executable, __file__, which]
            print(f"[precompile] spawning {which} {env}", flush=True)
            rc = subprocess.call(cmd, env={**os.environ, **env})
            print(f"[precompile] {which} rc={rc}", flush=True)
        return
    precompile_one(sys.argv[1])


if __name__ == "__main__":
    main()
