"""Convert a reference PyTorch checkpoint (model####.pt) to an Orbax ckpt.

Usage:
  python scripts/convert_checkpoint.py --model_path save/x/model000750000.pt \
      [--arch unet --dim_mults 2 2 2 2] [--out save/x_tpu]

Reads the args.json next to the .pt (the reference writes it at training
time) to infer the architecture when flags are omitted, converts weights via
condmdi_tpu.utils.checkpoint, verifies the converted tree matches the Flax
model's parameter structure, and writes ckpt_<step> + args.json.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--arch", default=None)
    ap.add_argument("--dim_mults", type=float, nargs="+", default=None)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    src = Path(args.model_path)
    ref_args = {}
    args_json = src.parent / "args.json"
    if args_json.exists():
        ref_args = json.load(open(args_json))
    arch = args.arch or ref_args.get("arch", "unet")
    dim_mults = tuple(args.dim_mults or ref_args.get("dim_mults", (2, 2, 2, 2)))

    from condmdi_tpu.utils import checkpoint as ckpt

    kw = (
        dict(n_levels=len(dim_mults))
        if arch.startswith("unet")
        else dict(num_layers=args.layers or ref_args.get("layers", 8))
    )
    params = ckpt.load_torch_checkpoint(str(src), arch, **kw)

    step = ckpt.parse_step_from_checkpoint(src)
    out_dir = Path(args.out or (src.parent.as_posix() + "_tpu"))
    out_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt.save_checkpoint(
        out_dir, step,
        {"step": np.int32(step), "params": params["params"],
         "ema_params": params["params"], "opt_state": {}},
    )
    if ref_args:
        json.dump(ref_args, open(out_dir / "args.json", "w"), indent=2)
    print(f"converted {src} -> {path}")
    return path


if __name__ == "__main__":
    main()
