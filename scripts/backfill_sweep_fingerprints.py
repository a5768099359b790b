"""Backfill params_fingerprint into fid_vs_steps.json rows (CPU-only).

The sweep rows read summary["params_fingerprint"], which evals.run only
started returning in round 5 — rows computed before that fix carry "".
Each row's ckpt_id (mtime+size) already binds it to checkpoint bytes; this
adds the content fingerprint so the final row is verifiable against the
committed gate_ema npz (tests/test_gate_durability.py scheme) without the
checkpoint tree.

Usage: python scripts/backfill_sweep_fingerprints.py [path/to/fid_vs_steps.json]
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from condmdi_tpu.utils.checkpoint import (
        load_checkpoint,
        params_fingerprint,
        select_eval_params,
    )

    path = Path(sys.argv[1] if len(sys.argv) > 1
                else "save/synthetic_unet_m/fid_vs_steps.json")
    d = json.loads(path.read_text())
    if not d.get("use_ema", False):
        sys.exit("backfill only valid for use_ema sweeps (the canonical "
                 "select_eval_params path is EMA-preferred)")
    run_dir = Path(d["run_dir"])
    changed = 0
    for r in d["rows"]:
        if r.get("params_fingerprint") or r["step"] == 0:
            continue
        ck = run_dir / f"ckpt_{r['step']:09d}"
        if not ck.exists():
            print(f"step {r['step']}: checkpoint gone, leaving empty")
            continue
        fp = params_fingerprint(select_eval_params(load_checkpoint(ck)))
        r["params_fingerprint"] = fp
        changed += 1
        print(f"step {r['step']}: {fp}")
    if changed:
        path.write_text(json.dumps(d, indent=1))
    print(f"backfilled {changed} rows -> {path}")


if __name__ == "__main__":
    main()
