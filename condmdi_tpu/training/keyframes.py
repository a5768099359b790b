"""Keyframe observation-mask generator — the heart of CondMDI — in pure JAX.

Behavior parity with reference utils/editing_util.py:56 (get_keyframes_mask)
across all 12 edit modes, and joint_to_full_mask:30 / :14 (joint→feature
expansion via boolean matmuls against the layout matrices).

TPU-first design: the reference builds masks in a Python loop over the batch
with numpy RNG (host-side, per step!). Here every mode is a branchless
vmapped function of (key, length) with static (T, mode), so masks are
generated ON DEVICE inside the jitted train step. Variable-count sampling
("choose k of length without replacement", k itself random) uses the
rank-of-uniform trick: rank(u_i) < k selects exactly k distinct valid
indices.

Layout: returned masks are [B, T, F] bool (features last). `lengths` gates
frames >= length to False in every mode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from condmdi_tpu.data import layout as L

Array = jax.Array

HML_EDIT_MODES = (
    "benchmark_sparse",
    "benchmark_clip",
    "uncond",
    "right_wrist",
    "lower_body",
    "pelvis_feet",
    "pelvis_vr",
    "pelvis",
    "gmd_keyframes",
    "random_frames",
    "random_joints",
    "random",
)


def joint_to_full_mask(joint_mask: Array, feature_mode: str = "pos_rot_vel") -> Array:
    """[..., T, 22] bool joint mask → [..., T, 263] bool feature mask."""
    assert feature_mode in ("pos", "pos_rot", "pos_rot_vel")
    jm = joint_mask.astype(jnp.float32)
    mats = [L.MAT_POS, L.MAT_CNT]
    if feature_mode in ("pos_rot", "pos_rot_vel"):
        mats.append(L.MAT_ROT)
    if feature_mode == "pos_rot_vel":
        mats.append(L.MAT_VEL)
    mat = jnp.asarray(np.stack(mats).any(axis=0).astype(np.float32))  # [22, 263]
    return (jm @ mat) > 0.5


def _rank(u: Array) -> Array:
    """Rank of each element within its vector (0 = smallest)."""
    return jnp.argsort(jnp.argsort(u))


def _choose_k_frames(key: Array, T: int, length: Array, k: Array) -> Array:
    """Boolean [T]: exactly min(k, length) distinct random frames < length."""
    u = jax.random.uniform(key, (T,))
    valid = jnp.arange(T) < length
    u = jnp.where(valid, u, 2.0)  # invalid frames rank last
    return (_rank(u) < jnp.minimum(k, length)) & valid


def _frames_to_joint_mask(frame_mask: Array, joints: Array | None, J: int) -> Array:
    """[T] frame mask (+ optional joint subset) → [T, J]."""
    if joints is None:
        jm = jnp.ones((J,), bool)
    else:
        jm = jnp.zeros((J,), bool).at[jnp.asarray(joints)].set(True)
    return frame_mask[:, None] & jm[None, :]


@partial(
    jax.jit,
    static_argnames=("edit_mode", "trans_length", "feature_mode", "n_keyframes", "T", "n_features"),
)
def get_keyframes_mask(
    key: Array,
    lengths: Array,  # [B] int
    T: int,
    edit_mode: str = "benchmark_sparse",
    trans_length: int = 10,
    feature_mode: str = "pos_rot_vel",
    n_keyframes: int = 5,
    n_features: int = 263,
) -> Array:
    """Build the [B, T, F] observation mask for a batch.

    For HumanML3D (F=263, 22 joints). The `random` mode returns a
    feature-level mask directly; all other modes go joint→feature through
    `joint_to_full_mask` exactly like the reference.
    """
    B = lengths.shape[0]
    J = 22
    keys = jax.random.split(key, B)
    frames = jnp.arange(T)

    def per_sample_joint_mask(k: Array, length: Array) -> Array:
        valid = frames < length
        if edit_mode == "benchmark_sparse":
            fm = ((frames % trans_length) == 0) & valid
            return _frames_to_joint_mask(fm, None, J)
        if edit_mode == "benchmark_clip":
            end_frame = (length - trans_length) // 2
            fm = ((frames < end_frame) | (frames >= end_frame + trans_length)) & valid
            return _frames_to_joint_mask(fm, None, J)
        if edit_mode == "uncond":
            return jnp.zeros((T, J), bool)
        if edit_mode == "right_wrist":
            return _frames_to_joint_mask(valid, np.array([0, 21]), J)
        if edit_mode == "lower_body":
            return _frames_to_joint_mask(valid, np.array(L.HML_LOWER_BODY_JOINTS), J)
        if edit_mode == "pelvis_feet":
            return _frames_to_joint_mask(valid, np.array(L.HML_PELVIS_FEET), J)
        if edit_mode == "pelvis_vr":
            return _frames_to_joint_mask(valid, np.array(L.HML_PELVIS_VR), J)
        if edit_mode == "pelvis":
            return _frames_to_joint_mask(valid, np.array([0]), J)
        if edit_mode == "gmd_keyframes":
            fm = _choose_k_frames(k, T, length, jnp.asarray(n_keyframes))
            return _frames_to_joint_mask(fm, None, J)
        if edit_mode == "random_frames":
            # reference hardcodes 20 keyframes during training (:162)
            fm = _choose_k_frames(k, T, length, jnp.asarray(20))
            return _frames_to_joint_mask(fm, None, J)
        if edit_mode == "random_joints":
            k1, k2, k3 = jax.random.split(k, 3)
            num_kf = jax.random.randint(k1, (), 1, jnp.maximum(length, 2))
            fm = _choose_k_frames(k2, T, length, num_kf)
            # num_joints ~ U[0, (J-1)*num_kf); random cells of a [J, T] grid
            # restricted to selected keyframe columns
            num_joints = jax.random.randint(
                k3, (), 0, jnp.maximum((J - 1) * num_kf, 1)
            )
            u = jax.random.uniform(jax.random.fold_in(k3, 1), (T, J))
            u = jnp.where(fm[:, None], u, 2.0)
            cells = _rank(u.reshape(-1)).reshape(T, J) < num_joints
            jm = cells & fm[:, None]
            jm = jm.at[:, 0].set(fm)  # root joint always observed on keyframes
            return jm
        raise ValueError(f"unknown edit_mode {edit_mode}")

    if edit_mode == "random":
        F = n_features

        def per_sample_feature_mask(k: Array, length: Array) -> Array:
            k1, k2, k3, k4 = jax.random.split(k, 4)
            num_kf = jax.random.randint(k1, (), 1, jnp.maximum(length, 2))
            fm = _choose_k_frames(k2, T, length, num_kf)  # [T]
            num_feat = jax.random.randint(
                k3, (), 1, jnp.maximum(F * num_kf, 2)
            )
            u = jax.random.uniform(k4, (T, F))
            u = jnp.where(fm[:, None], u, 2.0)
            cells = _rank(u.reshape(-1)).reshape(T, F) < num_feat  # [T, F]
            cells = cells & fm[:, None]
            # forced adjustment (reference :205-211): each keyframe gets one
            # forced feature; empty keyframes gain it, full keyframes lose it
            forced_col = jax.random.randint(jax.random.fold_in(k4, 1), (T,), 0, F)
            forced = jax.nn.one_hot(forced_col, F, dtype=bool) & fm[:, None]
            col_sum = cells.sum(axis=1)
            is_empty = (col_sum == 0) & fm
            is_full = (col_sum == F) & fm
            cells = cells | (forced & is_empty[:, None])
            cells = cells & ~(forced & is_full[:, None])
            return cells

        return jax.vmap(per_sample_feature_mask)(keys, lengths)

    joint_mask = jax.vmap(per_sample_joint_mask)(keys, lengths)  # [B, T, J]
    return joint_to_full_mask(joint_mask, feature_mode)
