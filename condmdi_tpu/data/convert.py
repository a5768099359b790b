"""abs↔rel motion representation converters (eval-pipeline plumbing).

Parity targets: reference data_loaders/humanml/data/dataset.py —
motion_to_rel_data:1198, motion_to_abs_data:1253, module functions
sample_to_motion:1301, abs3d_to_rel:1327, rel_to_abs3d:1364.

The reference implements these as HOST-SIDE PYTHON LOOPS over the batch
(one extract_features call per sample — "they dominate eval overhead after
sampling is fast", SURVEY §7). Here the whole batch goes through ONE vmapped
jitted extract_features: orders of magnitude faster on eval's 1000-sample
sweeps.

All functions take/return the [B, T, F] layout; features arrive NORMALIZED
and leave NORMALIZED (with the stats of the target representation), exactly
like the reference.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from condmdi_tpu.data.humanml_repr import (
    extract_features,
    recover_from_ric,
    recover_root_rot_pos,
)
from condmdi_tpu.utils.assets import NormStats

Array = jax.Array


@partial(jax.jit, static_argnames=())
def _batched_rel_features(joints: Array) -> Array:
    """[B, T, 22, 3] → [B, T, 263] relative features (last frame duplicated
    to restore length, reference :1214-1216)."""
    feats = jax.vmap(lambda j: extract_features(j, 0.002))(joints)  # [B, T-1, F]
    return jnp.concatenate([feats, feats[:, -1:, :]], axis=1)


def joints_to_rel_features(joints: Array, rel_stats: NormStats) -> Array:
    """motion_to_rel_data: joints → normalized relative features."""
    feats = _batched_rel_features(jnp.asarray(joints))
    return (feats - jnp.asarray(rel_stats.mean)) / jnp.asarray(rel_stats.std)


def joints_to_abs_features(joints: Array, abs_stats: NormStats) -> Array:
    """motion_to_abs_data: joints → normalized absolute-root features.

    Build relative features, then overwrite the root channels with the
    integrated absolute yaw angle and absolute xz (reference :1275-1280).
    """
    feats = _batched_rel_features(jnp.asarray(joints))
    _, r_pos, rot_ang = recover_root_rot_pos(feats, abs_3d=False, return_rot_ang=True)
    feats = feats.at[..., 0].set(rot_ang)
    feats = feats.at[..., 1].set(r_pos[..., 0])
    feats = feats.at[..., 2].set(r_pos[..., 2])
    return (feats - jnp.asarray(abs_stats.mean)) / jnp.asarray(abs_stats.std)


def abs3d_to_rel(
    sample_abs: Array, abs_stats: NormStats, rel_stats: NormStats
) -> Array:
    """Normalized abs features → normalized rel features (reference :1327)."""
    feats = jnp.asarray(sample_abs) * jnp.asarray(abs_stats.std) + jnp.asarray(
        abs_stats.mean
    )
    joints = recover_from_ric(feats, 22, abs_3d=True)
    return joints_to_rel_features(joints, rel_stats)


def rel_to_abs3d(
    sample_rel: Array, rel_stats: NormStats, abs_stats: NormStats
) -> Array:
    """Normalized rel features → normalized abs features (reference :1364)."""
    feats = jnp.asarray(sample_rel) * jnp.asarray(rel_stats.std) + jnp.asarray(
        rel_stats.mean
    )
    joints = recover_from_ric(feats, 22, abs_3d=False)
    return joints_to_abs_features(joints, abs_stats)


def sample_to_motion(sample_abs: Array, abs_stats: NormStats) -> Array:
    """Normalized abs features → global joints [B, T, 22, 3] (ref :1301)."""
    feats = jnp.asarray(sample_abs) * jnp.asarray(abs_stats.std) + jnp.asarray(
        abs_stats.mean
    )
    return recover_from_ric(feats, 22, abs_3d=True)
