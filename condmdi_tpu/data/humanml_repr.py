"""HumanML3D 263-dim motion feature codec, pure JAX.

Behavior-parity targets in the reference:
  recover_root_rot_pos  motion_process.py:402 (abs_3d switch :406/:421)
  recover_from_ric      motion_process.py:474
  recover_from_rot      motion_process.py:442
  extract_features      motion_process.py:50

Conventions: features LAST — data is (..., T, 263). The torch reference's
[bs, 263, 1, T] layout exists only at the legacy-API boundary
(condmdi_tpu.utils.torch_layout).

TPU notes: the only sequential ops are cumulative sums over time (XLA lowers
cumsum to a log-depth scan — fine); everything else is elementwise/gather-free
and fuses. The in-place index-assignments of the reference become concats.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from condmdi_tpu.geometry.quaternion import (
    qfix,
    qinv,
    qmul,
    qrot,
    quaternion_to_cont6d,
)
from condmdi_tpu.geometry.skeleton import (
    Skeleton,
    T2M_FACE_JOINT_INDX,
    T2M_KINEMATIC_CHAIN,
    T2M_RAW_OFFSETS,
)

Array = jax.Array

# Reference motion_process.py:13-21 constants.
FID_L = (7, 10)
FID_R = (8, 11)


def recover_root_rot_pos(
    data: Array, abs_3d: bool = False, return_rot_ang: bool = False
):
    """Root y-rotation quaternion and root position from feature channels 0:4.

    data: (..., T, C>=4). Returns (r_rot_quat (..., T, 4), r_pos (..., T, 3)).

    Relative mode: channel 0 is per-frame rotation VELOCITY and 1:3 are xz
    velocities in the local frame — both integrated over time (shifted by one
    frame, exactly like the reference's `r_rot_ang[..., 1:] = rot_vel[..., :-1]`
    then cumsum). Absolute mode: channels already hold absolute angle/xz.
    """
    if abs_3d:
        r_rot_ang = data[..., 0]
        r_xz = data[..., 1:3]
        r_pos = jnp.stack(
            [r_xz[..., 0], data[..., 3], r_xz[..., 1]], axis=-1
        )
    else:
        rot_vel = data[..., 0]
        shifted = jnp.concatenate(
            [jnp.zeros_like(rot_vel[..., :1]), rot_vel[..., :-1]], axis=-1
        )
        r_rot_ang = jnp.cumsum(shifted, axis=-1)

    zeros = jnp.zeros_like(data[..., 0])
    r_rot_quat = jnp.stack(
        [jnp.cos(r_rot_ang), zeros, jnp.sin(r_rot_ang), zeros], axis=-1
    )

    if not abs_3d:
        # local xz velocities, shifted one frame, rotated to world, integrated
        vel_xz = data[..., :-1, 1:3]
        zero_first = jnp.zeros_like(data[..., :1, 1:3])
        vel_xz = jnp.concatenate([zero_first, vel_xz], axis=-2)
        v3 = jnp.stack(
            [vel_xz[..., 0], jnp.zeros_like(vel_xz[..., 0]), vel_xz[..., 1]],
            axis=-1,
        )
        v3 = qrot(qinv(r_rot_quat), v3)
        r_pos = jnp.cumsum(v3, axis=-2)
        r_pos = jnp.stack(
            [r_pos[..., 0], data[..., 3], r_pos[..., 2]], axis=-1
        )

    if return_rot_ang:
        return r_rot_quat, r_pos, r_rot_ang
    return r_rot_quat, r_pos


@partial(jax.jit, static_argnames=("joints_num", "abs_3d"))
def recover_from_ric(data: Array, joints_num: int = 22, abs_3d: bool = False) -> Array:
    """Features (..., T, 263) → global joint positions (..., T, J, 3)."""
    r_rot_quat, r_pos = recover_root_rot_pos(data, abs_3d=abs_3d)
    positions = data[..., 4 : (joints_num - 1) * 3 + 4]
    positions = positions.reshape(positions.shape[:-1] + (joints_num - 1, 3))

    # rotate local joints into world yaw frame
    positions = qrot(
        jnp.broadcast_to(
            qinv(r_rot_quat)[..., None, :], positions.shape[:-1] + (4,)
        ),
        positions,
    )
    # add root xz
    positions = positions + jnp.stack(
        [r_pos[..., 0], jnp.zeros_like(r_pos[..., 0]), r_pos[..., 2]], axis=-1
    )[..., None, :]

    return jnp.concatenate([r_pos[..., None, :], positions], axis=-2)


def recover_from_rot(
    data: Array,
    joints_num: int,
    offsets: Array,
    skeleton: Skeleton | None = None,
    abs_3d: bool = False,
) -> Array:
    """Features → joints via the cont6d rotation channels + FK."""
    skeleton = skeleton or Skeleton(T2M_RAW_OFFSETS, T2M_KINEMATIC_CHAIN)
    r_rot_quat, r_pos = recover_root_rot_pos(data, abs_3d=abs_3d)
    r_rot_cont6d = quaternion_to_cont6d(r_rot_quat)
    start = 1 + 2 + 1 + (joints_num - 1) * 3
    end = start + (joints_num - 1) * 6
    cont6d = data[..., start:end].reshape(data.shape[:-1] + (joints_num - 1, 6))
    cont6d = jnp.concatenate([r_rot_cont6d[..., None, :], cont6d], axis=-2)
    return skeleton.forward_kinematics_cont6d(cont6d, r_pos, offsets)


# --------------------------------------------------------------------------- #
# Feature extraction (positions → 263-dim), used by dataset prep and by the
# abs↔rel converters in the eval pipeline.
# --------------------------------------------------------------------------- #
def detect_foot_contacts(positions: Array, thres: float) -> tuple[Array, Array]:
    """Squared-displacement foot contact detection (motion_process.py:65).

    positions: (T, J, 3). Returns (feet_l, feet_r) each (T-1, 2) float.
    """
    def _feet(ids):
        d = positions[1:, ids, :] - positions[:-1, ids, :]
        sq = jnp.sum(d * d, axis=-1)
        return (sq < thres).astype(positions.dtype)

    return _feet(list(FID_L)), _feet(list(FID_R))


def extract_features(
    positions: Array,
    feet_thre: float = 0.002,
    skeleton: Skeleton | None = None,
    face_joint_indx=T2M_FACE_JOINT_INDX,
    abs_3d: bool = False,
) -> Array:
    """Global joint positions (T, J, 3) → features (T-1, 263).

    Matches reference extract_features (motion_process.py:50): cont6d params
    from smoothed-forward IK, RIFKE local pose, root angular/linear velocity,
    local joint velocities, foot contacts. With abs_3d=True the root channels
    carry the ABSOLUTE yaw angle and xz position instead of velocities
    (the `HumanML3D_abs` data variant regenerated by the reference notebooks).
    """
    skeleton = skeleton or Skeleton(T2M_RAW_OFFSETS, T2M_KINEMATIC_CHAIN)
    positions = jnp.asarray(positions)
    global_positions = positions

    feet_l, feet_r = detect_foot_contacts(positions, feet_thre)

    # IK with smoothed forward → cont6d params; root quat per frame
    quat_params = skeleton.inverse_kinematics(
        positions, face_joint_indx, smooth_forward=True
    )
    quat_params = qfix(quat_params)
    cont_6d_params = quaternion_to_cont6d(quat_params)
    r_rot = quat_params[:, 0]

    # root linear velocity in local frame
    velocity = global_positions[1:, 0] - global_positions[:-1, 0]
    velocity = qrot(r_rot[1:], velocity)
    # root angular velocity
    r_velocity_q = qmul(r_rot[1:], qinv(r_rot[:-1]))

    # RIFKE: root-centered xz, world rotated into root yaw frame
    local = positions - jnp.stack(
        [
            positions[:, 0:1, 0],
            jnp.zeros_like(positions[:, 0:1, 0]),
            positions[:, 0:1, 2],
        ],
        axis=-1,
    )
    local = qrot(
        jnp.broadcast_to(r_rot[:, None, :], local.shape[:-1] + (4,)), local
    )

    root_y = local[:, 0, 1:2]

    if abs_3d:
        # absolute yaw angle (continuous) and absolute xz root position
        # angle from quaternion: q = (cos a, 0, sin a, 0)
        r_ang = jnp.arctan2(r_rot[:, 2], r_rot[:, 0])
        # unwrap to continuity (angles accumulate beyond ±π in long turns)
        d = jnp.diff(r_ang)
        d = jnp.where(d > jnp.pi, d - 2 * jnp.pi, jnp.where(d < -jnp.pi, d + 2 * jnp.pi, d))
        r_ang = jnp.concatenate([r_ang[:1], r_ang[:1] + jnp.cumsum(d)], axis=0)
        root_data = jnp.concatenate(
            [
                r_ang[:-1, None],
                global_positions[:-1, 0, 0:1],
                global_positions[:-1, 0, 2:3],
                root_y[:-1],
            ],
            axis=-1,
        )
    else:
        # clamped: |z| can exceed 1 by float error (or wildly for degenerate
        # frames whose forward direction flips) — arcsin must stay finite
        r_velocity = jnp.arcsin(jnp.clip(r_velocity_q[:, 2:3], -1.0, 1.0))
        l_velocity = velocity[:, (0, 2)]
        root_data = jnp.concatenate([r_velocity, l_velocity, root_y[:-1]], axis=-1)

    rot_data = cont_6d_params[:, 1:].reshape(cont_6d_params.shape[0], -1)
    ric_data = local[:, 1:].reshape(local.shape[0], -1)

    local_vel = qrot(
        jnp.broadcast_to(
            r_rot[:-1, None, :],
            (global_positions.shape[0] - 1, global_positions.shape[1], 4),
        ),
        global_positions[1:] - global_positions[:-1],
    )
    local_vel = local_vel.reshape(local_vel.shape[0], -1)

    return jnp.concatenate(
        [
            root_data,
            ric_data[:-1],
            rot_data[:-1],
            local_vel,
            feet_l,
            feet_r,
        ],
        axis=-1,
    )
