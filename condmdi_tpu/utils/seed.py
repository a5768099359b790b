"""Global RNG seeding (reference utils/fixseed.py:6).

The data layer intentionally mirrors the reference's use of the GLOBAL
numpy/python RNGs for crop offsets, text choice, and augmentation
(reference data_loaders/humanml/data/dataset.py random.choice /
np.random.randint) — so any entry point that wants reproducible runs must
pin those globals, exactly as every reference train/eval script does via
fixseed(args.seed) (e.g. eval/eval_humanml_condmdi.py:461).
"""

from __future__ import annotations

import random

import numpy as np


def seed_all(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
