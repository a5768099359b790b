"""Reattach a report's meta block lost to the round-5 print_summary crash.

evals.run take-3 legs crashed BETWEEN evaluation() (which writes the
metrics + per_replication file) and write_report_meta (a string landed in
the metric-dict printer — fixed in the same commit that adds this script).
The metrics in the file are untouched; only the self-description block is
missing. This reconstructs it by copying a sibling report's meta (same
protocol run configuration, same checkpoint) with explicit overrides, and
refuses to touch a report that already has one. The patched meta is
validated downstream the same way as a native one: the slow repro test
re-derives replication 0 from it (tests/test_report_repro.py).

Usage:
  python scripts/patch_report_meta.py --report <broken.json> \
      --like <sibling.json> --set precision_mode=int8_static [--set k=v ...]
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--report", required=True)
    ap.add_argument("--like", required=True)
    ap.add_argument("--set", action="append", default=[], dest="overrides")
    args = ap.parse_args(argv)

    report = Path(args.report)
    blob = json.loads(report.read_text())
    if "meta" in blob:
        raise SystemExit(f"{report} already has a meta block — refusing")
    like = json.loads(Path(args.like).read_text())
    meta = dict(like["meta"])
    for kv in args.overrides:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        meta[k] = v
    meta["meta_patched"] = (
        "reconstructed via scripts/patch_report_meta.py (round-5 "
        "print_summary crash); metrics are the leg's own"
    )
    blob["meta"] = meta
    report.write_text(json.dumps(blob, indent=1, default=str))
    print(f"patched {report}: {len(meta)} meta fields")


if __name__ == "__main__":
    main()
