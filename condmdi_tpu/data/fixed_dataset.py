"""Curated fixed-dataset fixtures for reproducible debugging.

Parity: reference utils/editing_util.py:349 load_fixed_dataset — a saved
set of samples with hard-coded keep indices, used by
`conditional_synthesis --use_fixed_dataset` for deterministic comparisons.

Here the fixture is an .npz (motions + lengths + captions) saved once and
reloaded bit-identically; `make_synthetic_fixture` creates one
deterministically when no curated file exists.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

DEFAULT_PATH = Path("save/fixed_dataset/humanml_abs3d.npz")


def save_fixed_dataset(batch: dict, path: str | Path = DEFAULT_PATH) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        path,
        motion=batch["motion"],
        lengths=batch["lengths"],
        time_mask=batch["time_mask"],
        text=np.asarray(batch.get("text", []), dtype=object),
    )
    return path


def load_fixed_dataset(
    num_samples: int, path: str | Path = DEFAULT_PATH, text_encoder=None
) -> dict:
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"fixed dataset not found at {path}")
    data = np.load(path, allow_pickle=True)
    n = min(num_samples, len(data["motion"]))
    batch = {
        "motion": data["motion"][:n],
        "lengths": data["lengths"][:n],
        "time_mask": data["time_mask"][:n],
        "text": list(data["text"][:n]),
    }
    if text_encoder is not None:
        batch["text_embed"] = text_encoder.encode(batch["text"])
    return batch


def make_synthetic_fixture(
    path: str | Path = DEFAULT_PATH, n: int = 8, T: int = 196, seed: int = 1234
) -> Path:
    """Deterministic stand-in fixture built through the real codec."""
    from condmdi_tpu.data.dataset import DatasetConfig, SyntheticMotionDataset, collate

    ds = SyntheticMotionDataset(
        DatasetConfig(max_motion_length=T, abs_3d=True), size=n, seed=seed
    )
    batch = collate([ds[i] for i in range(n)], T)
    return save_fixed_dataset(batch, path)
