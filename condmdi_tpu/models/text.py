"""Text conditioning interface.

The reference uses a frozen CLIP ViT-B/32 text encoder (model/mdm.py:173
load_and_freeze_clip, :214 encode_text with the 22-token context trick).
CLIP weights are frozen, excluded from the optimizer, and STRIPPED from
checkpoints (train/training_loop.py:404-410) — text conditioning enters the
denoiser purely as a 512-dim embedding.

This module therefore defines text encoding as an interface producing
[B, 512] embeddings:
  * `HashTextEncoder` — deterministic pseudo-embedding (tests, benches, and
    uncond pipelines where the embedding content is irrelevant);
  * `CachedTextEncoder` — lookup of precomputed CLIP embeddings (the
    production path: embeddings computed once offline per caption set);
  * a `ClipTextEncoder` JAX port slot (weights loadable from a converted
    CLIP checkpoint when assets are present).
"""

from __future__ import annotations

import hashlib
import os
import warnings
from typing import Optional, Protocol, Sequence

import numpy as np

CLIP_DIM = 512


class TextEncoder(Protocol):
    def encode(self, texts: Sequence[str]) -> np.ndarray:  # [B, 512]
        ...


class HashTextEncoder:
    """Deterministic unit-norm embedding from a SHA-256 of the caption."""

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), CLIP_DIM), dtype=np.float32)
        for i, t in enumerate(texts):
            seed = int.from_bytes(
                hashlib.sha256(t.encode("utf-8")).digest()[:8], "little"
            )
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(CLIP_DIM).astype(np.float32)
            out[i] = v / np.linalg.norm(v)
        return out


class CachedTextEncoder:
    """Lookup table of precomputed CLIP embeddings keyed by caption string."""

    def __init__(self, table: dict[str, np.ndarray], fallback: TextEncoder | None = None):
        self.table = table
        self.fallback = fallback or HashTextEncoder()

    @classmethod
    def from_npz(cls, path: str) -> "CachedTextEncoder":
        data = np.load(path, allow_pickle=True)
        captions = list(data["captions"])
        embeds = np.asarray(data["embeddings"], dtype=np.float32)
        return cls({c: e for c, e in zip(captions, embeds)})

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), CLIP_DIM), dtype=np.float32)
        missing = [t for t in texts if t not in self.table]
        if missing:
            warnings.warn(
                f"CachedTextEncoder: {len(missing)}/{len(texts)} captions not in "
                f"the embedding table (e.g. {missing[0]!r}); falling back to "
                f"{type(self.fallback).__name__} for those — outputs for them "
                "are NOT real CLIP embeddings",
                stacklevel=2,
            )
        fb = self.fallback.encode(missing) if missing else None
        mi = 0
        for i, t in enumerate(texts):
            if t in self.table:
                out[i] = self.table[t]
            else:
                out[i] = fb[mi]
                mi += 1
        return out


# --------------------------------------------------------------------------- #
# Encoder resolution (CLI plumbing)
# --------------------------------------------------------------------------- #
_CLIP_CKPT_CANDIDATES = (
    "save/clip/ViT-B-32.pt",
    "dataset/ViT-B-32.pt",
)


def find_clip_checkpoint() -> Optional[str]:
    """Discover a CLIP ViT-B/32 checkpoint ($CONDMDI_CLIP_CKPT, then known
    locations). The reference downloads it implicitly via `clip.load`
    (mdm.py:173); here it is an explicit, discoverable asset."""
    env = os.environ.get("CONDMDI_CLIP_CKPT", "")
    for c in (env, *_CLIP_CKPT_CANDIDATES):
        if c and os.path.isfile(c):
            return c
    return None


def encoder_name(enc: TextEncoder) -> str:
    """Short self-describing tag recorded in output artifacts."""
    return {
        "HashTextEncoder": "hash",
        "CachedTextEncoder": "cached",
        "ClipTextEncoder": "clip",
    }.get(type(enc).__name__, type(enc).__name__)


def make_text_encoder(args=None, *, mode: Optional[str] = None,
                      embeddings_path: Optional[str] = None,
                      clip_checkpoint: Optional[str] = None) -> TextEncoder:
    """Resolve the text encoder for a CLI run.

    Mirrors the reference's conditioning source (frozen CLIP ViT-B/32,
    mdm.py:214-231) with explicit control:
      --text_encoder auto    cached npz if given, else CLIP if a checkpoint is
                             discoverable, else HashTextEncoder with a LOUD
                             warning (asset-free environments);
      --text_encoder clip    require a CLIP checkpoint (error if absent);
      --text_encoder cached  require --text_embeddings <npz>;
      --text_encoder hash    explicit opt-in to pseudo-embeddings.
    """
    mode = mode or getattr(args, "text_encoder", "auto") or "auto"
    npz = embeddings_path if embeddings_path is not None else getattr(
        args, "text_embeddings", "") or ""
    ckpt = clip_checkpoint if clip_checkpoint is not None else getattr(
        args, "clip_checkpoint", "") or ""

    if mode == "hash":
        return HashTextEncoder()
    if mode == "cached":
        if not npz:
            raise ValueError("--text_encoder cached requires --text_embeddings <npz> "
                             "(produce one with scripts/export_text_embeddings.py)")
        return CachedTextEncoder.from_npz(npz)
    if mode == "clip":
        ckpt = ckpt or find_clip_checkpoint()
        if not ckpt:
            raise ValueError(
                "--text_encoder clip requires a CLIP ViT-B/32 checkpoint: pass "
                "--clip_checkpoint, set $CONDMDI_CLIP_CKPT, or place it at "
                + " or ".join(_CLIP_CKPT_CANDIDATES)
            )
        from condmdi_tpu.models.clip import ClipTextEncoder

        return ClipTextEncoder.from_torch_checkpoint(ckpt)
    if mode == "auto":
        if npz:
            return CachedTextEncoder.from_npz(npz)
        ckpt = ckpt or find_clip_checkpoint()
        if ckpt:
            from condmdi_tpu.models.clip import ClipTextEncoder

            return ClipTextEncoder.from_torch_checkpoint(ckpt)
        warnings.warn(
            "no CLIP checkpoint or embedding table found — text conditioning "
            "falls back to HashTextEncoder (deterministic pseudo-embeddings). "
            "Outputs are NOT conditioned on real text semantics. Pass "
            "--text_embeddings <npz> or provide a CLIP checkpoint "
            "(--clip_checkpoint / $CONDMDI_CLIP_CKPT); use --text_encoder hash "
            "to silence this warning.",
            stacklevel=2,
        )
        return HashTextEncoder()
    raise ValueError(f"unknown --text_encoder {mode!r} (auto|clip|cached|hash)")
