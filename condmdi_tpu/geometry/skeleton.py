"""Chain-based skeleton forward/inverse kinematics in pure JAX.

Behavior parity with the reference Skeleton
(/root/reference/data_loaders/humanml/common/skeleton.py:103 forward_kinematics,
:149 forward_kinematics_cont6d_np, :55 inverse_kinematics_np) — with one
crucial semantic detail preserved: rotation accumulation RESTARTS at the root
quaternion for every kinematic chain (e.g. for the arm chain [9,14,17,19,21]
the global rotation of joint 14 is q_root * q_14, NOT the torso composition).
The HumanML3D IK produces "local" quaternions under exactly this convention,
so FK must mirror it.

TPU-first design: chains and joint counts are static Python constants, so FK
unrolls into a fixed DAG of fused quaternion ops that XLA vectorizes over any
leading (batch, time) dims — no per-joint scan, no dynamic indexing. Results
are assembled with one stack + static permutation instead of scatter.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from condmdi_tpu.geometry.quaternion import (
    cont6d_to_matrix,
    qbetween,
    qfix,
    qinv,
    qmul,
    qrot,
)

Array = jax.Array

# HumanML3D (Text2Motion) 22-joint skeleton — unit offset directions and
# kinematic chains (reference data_loaders/humanml/utils/paramUtil.py:32,55).
T2M_RAW_OFFSETS = np.array(
    [
        [0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, -1, 0],
        [0, 1, 0], [0, -1, 0], [0, -1, 0], [0, 1, 0], [0, 0, 1], [0, 0, 1],
        [0, 1, 0], [1, 0, 0], [-1, 0, 0], [0, 0, 1], [0, -1, 0], [0, -1, 0],
        [0, -1, 0], [0, -1, 0], [0, -1, 0], [0, -1, 0],
    ],
    dtype=np.float32,
)
T2M_KINEMATIC_CHAIN = [
    [0, 2, 5, 8, 11],
    [0, 1, 4, 7, 10],
    [0, 3, 6, 9, 12, 15],
    [9, 14, 17, 19, 21],
    [9, 13, 16, 18, 20],
]

# KIT 21-joint skeleton (paramUtil.py:4,6).
KIT_RAW_OFFSETS = np.array(
    [
        [0, 0, 0], [0, 1, 0], [0, 1, 0], [0, 1, 0], [0, 1, 0], [1, 0, 0],
        [0, -1, 0], [0, -1, 0], [-1, 0, 0], [0, -1, 0], [0, -1, 0], [1, 0, 0],
        [0, -1, 0], [0, -1, 0], [0, 0, 1], [0, 0, 1], [-1, 0, 0], [0, -1, 0],
        [0, -1, 0], [0, 0, 1], [0, 0, 1],
    ],
    dtype=np.float32,
)
KIT_KINEMATIC_CHAIN = [
    [0, 11, 12, 13, 14, 15],
    [0, 16, 17, 18, 19, 20],
    [0, 1, 2, 3, 4],
    [3, 5, 6, 7],
    [3, 8, 9, 10],
]

# Face-direction joints (r_hip, l_hip, sdr_r, sdr_l) for HumanML3D IK
# (reference motion_process.py:18).
T2M_FACE_JOINT_INDX = (2, 1, 17, 16)


def _parents_from_chains(n_joints: int, chains) -> list[int]:
    parents = [0] * n_joints
    parents[0] = -1
    for chain in chains:
        for j in range(1, len(chain)):
            parents[chain[j]] = chain[j - 1]
    return parents


class Skeleton:
    """Static skeleton description + functional FK/IK.

    Unlike the reference class, this holds no device state: offsets are passed
    in or bound once as numpy; all compute methods are pure and jittable.
    """

    def __init__(self, raw_offsets: np.ndarray, kinematic_chain):
        self.raw_offsets = np.asarray(raw_offsets, dtype=np.float32)
        self.chains = [list(c) for c in kinematic_chain]
        self.n_joints = self.raw_offsets.shape[0]
        self.parents = _parents_from_chains(self.n_joints, self.chains)

    # ------------------------------------------------------------------ #
    def offsets_from_reference_pose(self, joints: np.ndarray) -> np.ndarray:
        """Scale unit offset directions by bone lengths of a reference pose.

        joints: (n_joints, 3). Mirrors Skeleton.get_offsets_joints (:43).
        """
        offsets = self.raw_offsets.copy()
        for i in range(1, self.n_joints):
            bone = np.linalg.norm(joints[i] - joints[self.parents[i]])
            offsets[i] = bone * offsets[i]
        return offsets

    # ------------------------------------------------------------------ #
    def forward_kinematics(
        self,
        quat_params: Array,
        root_pos: Array,
        offsets: Array,
        do_root_rot: bool = True,
    ) -> Array:
        """Quaternion FK. quat_params (..., J, 4), root_pos (..., 3),
        offsets (J, 3) or broadcastable (..., J, 3). Returns (..., J, 3).
        """
        offsets = jnp.asarray(offsets)
        if offsets.ndim == 2:
            offsets = jnp.broadcast_to(offsets, quat_params.shape[:-2] + offsets.shape)

        pos: dict[int, Array] = {0: root_pos}
        for chain in self.chains:
            if do_root_rot:
                rot = quat_params[..., 0, :]
            else:
                rot = jnp.zeros_like(quat_params[..., 0, :]).at[..., 0].set(1.0)
            for i in range(1, len(chain)):
                j = chain[i]
                rot = qmul(rot, quat_params[..., j, :])
                pos[j] = qrot(rot, offsets[..., j, :]) + pos[chain[i - 1]]
        return jnp.stack([pos[j] for j in range(self.n_joints)], axis=-2)

    # ------------------------------------------------------------------ #
    def forward_kinematics_cont6d(
        self,
        cont6d_params: Array,
        root_pos: Array,
        offsets: Array,
        do_root_rot: bool = True,
    ) -> Array:
        """6D-rotation FK (column convention). cont6d_params (..., J, 6)."""
        offsets = jnp.asarray(offsets)
        if offsets.ndim == 2:
            offsets = jnp.broadcast_to(
                offsets, cont6d_params.shape[:-2] + offsets.shape
            )
        mats = cont6d_to_matrix(cont6d_params)  # (..., J, 3, 3)

        pos: dict[int, Array] = {0: root_pos}
        for chain in self.chains:
            if do_root_rot:
                rot = mats[..., 0, :, :]
            else:
                rot = jnp.broadcast_to(
                    jnp.eye(3, dtype=cont6d_params.dtype),
                    mats[..., 0, :, :].shape,
                )
            for i in range(1, len(chain)):
                j = chain[i]
                # 3x3 matmuls: force full precision (negligible cost, and the
                # TPU MXU would otherwise run these in bf16)
                rot = jnp.einsum(
                    "...ij,...jk->...ik",
                    rot,
                    mats[..., j, :, :],
                    precision=jax.lax.Precision.HIGHEST,
                )
                pos[j] = (
                    jnp.einsum(
                        "...ij,...j->...i",
                        rot,
                        offsets[..., j, :],
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    + pos[chain[i - 1]]
                )
        return jnp.stack([pos[j] for j in range(self.n_joints)], axis=-2)

    # ------------------------------------------------------------------ #
    def inverse_kinematics(
        self,
        joints: Array,
        face_joint_indx=T2M_FACE_JOINT_INDX,
        smooth_forward: bool = False,
    ) -> Array:
        """Global joint positions (T, J, 3) → chain-local quaternions (T, J, 4).

        Mirrors inverse_kinematics_np (:55): root rotation aligns the body's
        forward direction (cross of up with hip+shoulder axis) onto +Z;
        frame 0's root quaternion is forced to identity.
        """
        # NOTE: the reference unpacks its [2, 1, 17, 16] index list as
        # (l_hip, r_hip, sdr_r, sdr_l) — i.e. the hip "across" vector is
        # joints[1] - joints[2] (skeleton.py:59-62). Preserve that exactly.
        l_hip, r_hip, sdr_r, sdr_l = face_joint_indx
        across = (joints[:, r_hip] - joints[:, l_hip]) + (
            joints[:, sdr_r] - joints[:, sdr_l]
        )
        # eps-guarded normalizations throughout the IK: generated (not
        # mocap) poses can collapse joints onto each other; the features of
        # such frames are garbage either way, but they must be FINITE
        # garbage or one bad frame NaNs the whole eval batch downstream
        across = across / jnp.maximum(
            jnp.linalg.norm(across, axis=-1, keepdims=True), 1e-8
        )
        up = jnp.asarray([0.0, 1.0, 0.0], dtype=joints.dtype)
        forward = jnp.cross(jnp.broadcast_to(up, across.shape), across)
        if smooth_forward:
            forward = _gaussian_filter1d(forward, sigma=20.0, axis=0)
        forward = forward / jnp.maximum(
            jnp.linalg.norm(forward, axis=-1, keepdims=True), 1e-8
        )

        target = jnp.asarray([0.0, 0.0, 1.0], dtype=joints.dtype)
        root_quat = qbetween(forward, jnp.broadcast_to(target, forward.shape))
        identity = jnp.zeros_like(root_quat[:1]).at[..., 0].set(1.0)
        root_quat = jnp.concatenate([identity, root_quat[1:]], axis=0)

        quats: dict[int, Array] = {0: root_quat}
        offsets = jnp.asarray(self.raw_offsets, dtype=joints.dtype)
        for chain in self.chains:
            rot = root_quat
            for i in range(len(chain) - 1):
                j_child, j_par = chain[i + 1], chain[i]
                u = jnp.broadcast_to(offsets[j_child], joints[:, 0].shape)
                v = joints[:, j_child] - joints[:, j_par]
                v = v / jnp.maximum(
                    jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8
                )
                rot_u_v = qbetween(u, v)
                local = qmul(qinv(rot), rot_u_v)
                quats[j_child] = local
                rot = qmul(rot, local)
        return jnp.stack([quats[j] for j in range(self.n_joints)], axis=1)


def _gaussian_filter1d(x: Array, sigma: float, axis: int = 0) -> Array:
    """scipy.ndimage.gaussian_filter1d equivalent (mode='nearest', truncate=4)."""
    radius = int(4.0 * sigma + 0.5)
    t = np.arange(-radius, radius + 1, dtype=np.float64)
    w = np.exp(-0.5 * (t / sigma) ** 2)
    w = (w / w.sum()).astype(np.float32)
    x = jnp.moveaxis(x, axis, 0)
    pad = [(radius, radius)] + [(0, 0)] * (x.ndim - 1)
    xp = jnp.pad(x, pad, mode="edge")
    # correlate along axis 0 for every trailing column
    flat = xp.reshape(xp.shape[0], -1)
    kern = jnp.asarray(w, dtype=x.dtype)[::-1]
    out = jax.vmap(
        lambda col: jnp.convolve(col, kern, mode="valid"), in_axes=1, out_axes=1
    )(flat)
    return jnp.moveaxis(out.reshape((x.shape[0],) + xp.shape[1:]), 0, axis)


t2m_skeleton = Skeleton(T2M_RAW_OFFSETS, T2M_KINEMATIC_CHAIN)
kit_skeleton = Skeleton(KIT_RAW_OFFSETS, KIT_KINEMATIC_CHAIN)
