"""Summarize a JAX profiler trace: where does device time go?

Usage:
  python scripts/trace_summary.py /tmp/condmdi_trace [--top 20]

Reads the Chrome-format trace.json.gz that `jax.profiler.trace` (and
scripts/profile_sampler.py) writes, and prints, for the TPU device
timeline:

  * total device time by HLO category (fusions, convs, matmuls, copies),
  * the top-N ops by accumulated duration with call counts, achieved
    HBM bandwidth (bytes_accessed / duration) and their HLO shapes.

This replaces eyeballing TensorBoard for the common question "which op
should I optimize next" — the reference has no equivalent (its
diffusion/logger.py:306-334 profile scopes are host wall-time only).
"""

from __future__ import annotations

import argparse
import collections
import gzip
import json
import re
import sys
from pathlib import Path


def find_trace_json(root: Path) -> Path:
    if root.is_file():
        return root
    hits = sorted(root.glob("plugins/profile/*/*.trace.json.gz"))
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {root}")
    return hits[-1]  # latest capture


def load_events(path: Path):
    with gzip.open(path) as f:
        return json.load(f)["traceEvents"]


def summarize(events, top: int = 20, device_substr: str = "TPU"):
    pids = {
        e["pid"]: e["args"].get("name")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in pids.items() if n and device_substr in n}
    if not dev_pids:  # CPU-only capture
        dev_pids = {p for p, n in pids.items() if n and "device" in n.lower()}

    by_op = collections.defaultdict(lambda: [0, 0, 0])  # dur_us, count, bytes
    by_cat = collections.Counter()
    shapes: dict[str, str] = {}
    total = 0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        args = e.get("args", {}) or {}
        name = e.get("name", "?")
        # skip module/while wrappers that double-count their children
        if name.startswith(("jit_", "while", "body", "cond")):
            continue
        dur = e.get("dur", 0)
        rec = by_op[name]
        rec[0] += dur
        rec[1] += 1
        rec[2] += int(args.get("bytes_accessed", 0) or 0)
        by_cat[args.get("hlo_category", "?")] += dur
        total += dur
        if name not in shapes and "long_name" in args:
            m = re.match(r"%\S+ = (\S+)", args["long_name"])
            shapes[name] = m.group(1) if m else ""

    print(f"device time (sum of leaf ops): {total/1e3:.3f} ms")
    print("\nby HLO category:")
    for cat, dur in by_cat.most_common():
        print(f"  {dur/1e3:9.3f} ms  {100*dur/max(total,1):5.1f}%  {cat}")

    print(f"\ntop {top} ops:")
    print(f"{'total':>10} {'count':>6} {'GB/s':>7}  op  [output shape]")
    ranked = sorted(by_op.items(), key=lambda kv: -kv[1][0])[:top]
    for name, (dur, cnt, nbytes) in ranked:
        bw = (nbytes / 1e9) / (dur / 1e6) if dur else 0.0
        print(f"{dur/1e3:8.3f}ms x{cnt:5d} {bw:7.1f}  {name}  {shapes.get(name, '')[:60]}")
    return total, by_cat, ranked


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", type=Path, help="trace dir (or trace.json.gz)")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--device", default="TPU", help="device-name substring")
    args = ap.parse_args(argv)
    path = find_trace_json(args.trace)
    print(f"trace: {path}")
    summarize(load_events(path), top=args.top, device_substr=args.device)
    return 0


if __name__ == "__main__":
    sys.exit(main())
