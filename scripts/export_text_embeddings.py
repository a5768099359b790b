"""Build a caption→embedding cache for CachedTextEncoder.

Usage:
  python scripts/export_text_embeddings.py --captions dataset/HumanML3D/texts \
      --out text_embeddings.npz [--clip_checkpoint ViT-B-32.pt]

Collects every caption in the HumanML3D texts directory (or a plain text
file, one caption per line) and embeds it with the JAX CLIP text tower when
a checkpoint + BPE vocab are available, else the deterministic hash encoder.
The resulting npz plugs into models.text.CachedTextEncoder — this is how
the frozen-CLIP conditioning of the reference is reproduced without running
a text model in the training/sampling loop at all.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import argparse
from pathlib import Path

import numpy as np


def collect_captions(path: Path) -> list[str]:
    captions = set()
    if path.is_dir():
        for f in sorted(path.glob("*.txt")):
            for line in open(f):
                cap = line.strip().split("#")[0].strip()
                if cap:
                    captions.add(cap)
    else:
        for line in open(path):
            line = line.strip()
            if line:
                captions.add(line)
    return sorted(captions)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--captions", required=True)
    ap.add_argument("--out", default="text_embeddings.npz")
    ap.add_argument("--clip_checkpoint", default="")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args(argv)

    captions = collect_captions(Path(args.captions))
    print(f"{len(captions)} unique captions")

    encoder = None
    if args.clip_checkpoint and Path(args.clip_checkpoint).exists():
        try:
            from condmdi_tpu.models.clip import ClipTextEncoder

            encoder = ClipTextEncoder.from_torch_checkpoint(args.clip_checkpoint)
            print("using JAX CLIP text tower")
        except FileNotFoundError as e:
            print(f"CLIP unavailable ({e}); falling back to hash encoder")
    if encoder is None:
        from condmdi_tpu.models.text import HashTextEncoder

        encoder = HashTextEncoder()

    embs = []
    for i in range(0, len(captions), args.batch):
        embs.append(encoder.encode(captions[i : i + args.batch]))
    embeddings = np.concatenate(embs, axis=0) if embs else np.zeros((0, 512), np.float32)
    np.savez(
        args.out,
        captions=np.asarray(captions, dtype=object),
        embeddings=embeddings.astype(np.float32),
    )
    print(f"wrote {args.out}")
    return args.out


if __name__ == "__main__":
    main()
