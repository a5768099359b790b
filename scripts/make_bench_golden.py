"""Generate the CPU golden trajectory checksums consumed by bench.py's
validity cross-check (and re-checked by tests/test_bench_verify.py).

Usage: python scripts/make_bench_golden.py [which ...]
Writes tests/golden/bench_traj_<which>.json for each model config
(default: the three bench configs).
"""

from __future__ import annotations

import json
import os
import sys

# force CPU before JAX init (same recipe as tests/conftest.py)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    # no int8 golden by default: bench verifies int8 configs against the
    # same-family FLOAT golden (check_against_golden strips '_int8'), and
    # int8 conv on XLA CPU is impractically slow to generate
    # BENCH_PAD-sensitive: with BENCH_PAD set (e.g. 200) the golden is
    # written under the pad-suffixed family name bench.golden_name() reads
    whichs = sys.argv[1:] or ["unet", "mdm"]
    out_dir = os.path.join(os.path.dirname(bench.GOLDEN_PATH.format(which="x")))
    os.makedirs(out_dir, exist_ok=True)
    for which in whichs:
        slice_ = bench.verify_trajectory(which)
        path = bench.GOLDEN_PATH.format(which=bench.golden_name(which))
        with open(path, "w") as f:
            json.dump(
                {
                    "which": which,
                    "platform": jax.devices()[0].platform,
                    "shape": list(slice_.shape),
                    "slice": slice_.tolist(),
                },
                f,
            )
        print(f"wrote {path}  mean={slice_.mean():.6f} std={slice_.std():.6f}")


if __name__ == "__main__":
    main()
