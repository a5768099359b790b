"""Dataset asset discovery (normalization stats, skeleton example).

The reference ships per-dataset mean/std files (dataset/t2m_mean.npy,
dataset/HumanML3D_abs/{Mean,Std}_abs_3d.npy, 000021.npy skeleton example —
README + prepare/*.sh download the rest). Assets are searched in
$CONDMDI_ASSETS, ./dataset, then the mounted reference copy.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import numpy as np

_CANDIDATES = (
    os.environ.get("CONDMDI_ASSETS", ""),
    "dataset",
    "/root/reference/dataset",
)


def find_assets_dir() -> Optional[Path]:
    for c in _CANDIDATES:
        if c and Path(c).is_dir():
            return Path(c)
    return None


@dataclass(frozen=True)
class NormStats:
    mean: np.ndarray  # [263]
    std: np.ndarray  # [263]

    def normalize(self, x: np.ndarray) -> np.ndarray:
        return (x - self.mean) / self.std

    def denormalize(self, x: np.ndarray) -> np.ndarray:
        return x * self.std + self.mean


def load_norm_stats(kind: str = "abs3d", assets: Optional[Path] = None) -> NormStats:
    """kind: 'abs3d' (HumanML3D_abs Mean/Std_abs_3d), 't2m' (evaluator norms).

    Falls back to zeros/ones stats (identity transform) when assets are
    absent so the pipeline stays runnable in asset-free environments.
    """
    assets = assets or find_assets_dir()
    dim = 251 if kind == "kit" else 263
    if assets is not None:
        try:
            if kind == "abs3d":
                mean = np.load(assets / "HumanML3D_abs" / "Mean_abs_3d.npy")
                std = np.load(assets / "HumanML3D_abs" / "Std_abs_3d.npy")
            elif kind == "t2m":
                mean = np.load(assets / "t2m_mean.npy")
                std = np.load(assets / "t2m_std.npy")
            elif kind == "kit":
                mean = np.load(assets / "kit_mean.npy")
                std = np.load(assets / "kit_std.npy")
            else:
                raise ValueError(kind)
            return NormStats(mean.astype(np.float32), std.astype(np.float32))
        except FileNotFoundError:
            pass
    return NormStats(np.zeros(dim, np.float32), np.ones(dim, np.float32))


def load_skeleton_example(assets: Optional[Path] = None) -> Optional[np.ndarray]:
    """000021.npy — the reference pose used to derive FK bone offsets."""
    assets = assets or find_assets_dir()
    if assets is None:
        return None
    p = assets / "000021.npy"
    if not p.exists():
        return None
    data = np.load(p)
    return data.reshape(len(data), -1, 3)
