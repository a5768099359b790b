"""Relaunch a training run from its committed args.json card.

Disaster-recovery / reproducibility tool: checkpoints live outside git
(except gate checkpoints we commit explicitly), so a wiped disk leaves a
run dir with only args.json + reports. This rebuilds the exact CLI argv
from the card and re-enters condmdi_tpu.training.train.main — the same
round-trip every sampling/eval CLI does via load_args_from_model
(reference parser_util.py:566 parse_and_load_from_model).

Usage:
  python scripts/retrain_from_args.py --run_dir save/synthetic_unet_m \
      [--set num_steps=100000] [--set overwrite=true]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def argv_from_card(card: dict) -> list[str]:
    argv: list[str] = []
    for k, v in card.items():
        argv.append("--" + k)
        if isinstance(v, bool):
            argv.append("true" if v else "false")
        elif isinstance(v, (list, tuple)):
            argv.extend(str(x) for x in v)
        else:
            argv.append(str(v))
    return argv


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True)
    ap.add_argument(
        "--set", action="append", default=[],
        help="key=value overrides applied to the card before launch",
    )
    args = ap.parse_args(argv)

    card = json.loads((Path(args.run_dir) / "args.json").read_text())
    for kv in args.set:
        k, _, v = kv.partition("=")
        if k not in card:
            raise SystemExit(f"--set {k!r}: not a key in args.json")
        card[k] = v  # string; parse_args re-types it like any CLI flag

    train_argv = argv_from_card(card)
    print(f"[retrain_from_args] {args.run_dir}: {' '.join(train_argv)}")

    from condmdi_tpu.training.train import main as train_main

    train_main(train_argv)


if __name__ == "__main__":
    main()
