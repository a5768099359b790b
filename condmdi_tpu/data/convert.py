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

import jax
import jax.numpy as jnp

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


# --------------------------------------------------------------------------- #
# Direct root-channel converters (reference utils/editing_util.py:232,:260) —
# operate on the 4 root feature channels only, no skeleton round trip.
# --------------------------------------------------------------------------- #
def relative_to_global(data: Array) -> Array:
    """[..., T, F] features with RELATIVE root channels → ABSOLUTE root
    channels (yaw angle + world xz), other channels untouched."""
    data = jnp.asarray(data)
    _, r_pos, rot_ang = recover_root_rot_pos(data, abs_3d=False, return_rot_ang=True)
    out = data.at[..., 0].set(rot_ang)
    out = out.at[..., 1].set(r_pos[..., 0])
    out = out.at[..., 2].set(r_pos[..., 2])
    return out


def global_to_relative(data: Array) -> Array:
    """Inverse of relative_to_global (reference undo_recover_root_rot_pos,
    editing_util.py:260): absolute yaw/xz → per-frame velocities rotated into
    the local frame; the last frame's velocity is lost (shifted left),
    matching the reference's behavior exactly."""
    from condmdi_tpu.geometry.quaternion import qrot

    data = jnp.asarray(data)
    gl_rot = data[..., 0]
    gl_x = data[..., 1]
    gl_z = data[..., 2]

    # forward differences; frame 0 diff slot stays 0 (reference writes into
    # positions 1:), then shifts left by one
    dx = jnp.concatenate([jnp.zeros_like(gl_x[..., :1]), jnp.diff(gl_x, axis=-1)], axis=-1)
    dz = jnp.concatenate([jnp.zeros_like(gl_z[..., :1]), jnp.diff(gl_z, axis=-1)], axis=-1)
    rel = jnp.stack([dx, jnp.zeros_like(dx), dz], axis=-1)
    quat = jnp.stack(
        [jnp.cos(gl_rot), jnp.zeros_like(gl_rot), jnp.sin(gl_rot), jnp.zeros_like(gl_rot)],
        axis=-1,
    )
    rel = qrot(quat, rel)
    # shift left: rel_pos[t] = rel_pos[t+1] (last element duplicated)
    rel = jnp.concatenate([rel[..., 1:, :], rel[..., -1:, :]], axis=-2)

    drot = jnp.concatenate(
        [jnp.diff(gl_rot, axis=-1), jnp.zeros_like(gl_rot[..., :1])], axis=-1
    )
    out = data.at[..., 0].set(drot)
    out = out.at[..., 1].set(rel[..., 0])
    out = out.at[..., 2].set(rel[..., 2])
    return out
