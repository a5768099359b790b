"""AMASS forward-kinematics + 764-dim field builders (JAX).

Parity surface: reference data_loaders/amass/utils/fk.py
(ForwardKinematicsLayer), utils.py (load_data/prep_to_load/prep_to_save/
batch_to_dict/dict_to_batch/dict_to_xyz/dict_to_posrot) and
helper_functions.py (velocity estimators) — the FK path that turns SMPL
axis-angle poses into the NeMF-style 764-dim representation used by the
AMASS in-betweening models (data/amass.py holds the layout masks).

TPU-native redesign:
  * FK walks the 24-joint tree with a trace-time unrolled accumulation —
    static graph, batched [N, J, 3, 3] matmuls on the MXU (the reference
    loops per joint over an eager 4x4 tensor with an index_put each step,
    fk.py:83-86).
  * global_to_local is VECTORIZED: local_i = inv(global_{parent(i)}) @
    global_i has no loop-carried dependency, so it is one gather + one
    batched matmul (the reference runs a per-joint python loop of
    torch.bmm(torch.linalg.inv(...)), fk.py:120-135).
  * everything is jit/vmap/grad-safe and shape-static; velocities use the
    same forward/central/backward stencil as the reference so values agree
    to float tolerance.

The SMPL kinematic tree (parents) is the standard public SMPL topology; the
rest-pose joint offsets come from the body-model file when present
(reference loads male/model.npz, fk.py:28-33) — pass them explicitly or use
SMPLModel-derived offsets.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from condmdi_tpu.geometry.quaternion import qinv, qrot
from condmdi_tpu.geometry.rotations import (
    axis_angle_to_matrix,
    euler_angles_to_matrix,
    matrix_to_axis_angle,
    matrix_to_quaternion,
    matrix_to_rotation_6d,
    quaternion_to_matrix,
    rotation_6d_to_matrix,
)

Array = jax.Array

FPS = 30  # reference utils.py:12
ROOT_TRANSFORM = True  # reference utils.py:13
V_AXIS = (0, 1)  # reference utils.py:14

# standard SMPL 24-joint kinematic tree (kintree_table[0] of the body model)
SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21],
    np.int32,
)


def rotations_to_matrix(rotations: Array) -> Array:
    """Accept rotmat [..., 3, 3], euler [..., 3], quat [..., 4], or 6d
    [..., 6] (reference make_fast_rotation_matrices, fk.py:53-62)."""
    if rotations.shape[-2:] == (3, 3):
        return rotations
    if rotations.shape[-1] == 3:
        return euler_angles_to_matrix(rotations, convention="XYZ")
    if rotations.shape[-1] == 4:
        return quaternion_to_matrix(rotations)
    if rotations.shape[-1] == 6:
        return rotation_6d_to_matrix(rotations)
    raise NotImplementedError(
        f"unsupported rotation representation with trailing shape {rotations.shape[-1:]}"
    )


class ForwardKinematics:
    """SMPL-topology FK (reference ForwardKinematicsLayer, fk.py:15).

    Stateless/functional: construct with (parents, offsets); every method is
    jittable and batched over leading dims.
    """

    def __init__(self, parents: Optional[np.ndarray] = None, offsets: Optional[np.ndarray] = None):
        self.parents = np.asarray(SMPL_PARENTS if parents is None else parents, np.int32)
        J = len(self.parents)
        if offsets is None:
            offsets = _default_offsets(J)
        offsets = np.asarray(offsets, np.float32).copy()
        offsets[0] = 0.0  # reference fk.py:40
        self.offsets = jnp.asarray(offsets)  # [J, 3] parent-relative

    # -- core ---------------------------------------------------------------- #
    def __call__(self, rotations: Array, positions: Optional[Array] = None):
        """rotations [B, J, D] (any supported rep) → (joints [B, J, 3],
        transforms [B, J, 4, 4]) (reference fk.py:137-152).

        The joint loop is unrolled at trace time (J=24): globals[i] =
        globals[parent] @ locals[i], all ops batched over B.
        """
        rot = rotations_to_matrix(rotations)  # [B, J, 3, 3]
        B, J = rot.shape[:2]
        pos = self.offsets[None].repeat(B, 0) if positions is None else positions
        # local affine transforms [B, J, 3, 4]
        loc_rot = rot
        loc_t = pos[..., None]  # [B, J, 3, 1]
        glob_rot = [loc_rot[:, 0]]
        glob_t = [loc_t[:, 0]]
        for i in range(1, J):
            p = int(self.parents[i])
            glob_rot.append(glob_rot[p] @ loc_rot[:, i])
            glob_t.append(glob_rot[p] @ loc_t[:, i] + glob_t[p])
        R = jnp.stack(glob_rot, axis=1)  # [B, J, 3, 3]
        t = jnp.stack(glob_t, axis=1)  # [B, J, 3, 1]
        top = jnp.concatenate([R, t], axis=-1)  # [B, J, 3, 4]
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0]), (B, J, 1, 4)
        )
        transforms = jnp.concatenate([top, bottom], axis=-2)  # [B, J, 4, 4]
        return t[..., 0], transforms

    forward = __call__

    # -- local/global conversions -------------------------------------------- #
    def global_to_local(self, global_xform: Array) -> Array:
        """[B, J, 3, 3] global → local rotations (reference fk.py:120-135),
        vectorized: one gather + one batched matmul, no joint loop."""
        gather = np.where(self.parents < 0, 0, self.parents)  # root fixed below
        parent_xform = jnp.take(global_xform, jnp.asarray(gather), axis=1)
        local = jnp.linalg.inv(parent_xform) @ global_xform
        return local.at[:, 0].set(global_xform[:, 0])

    def canonical_to_local(self, canonical_xform: Array, global_orient: Optional[Array] = None) -> Array:
        """(reference fk.py:98-118)"""
        if global_orient is not None:
            canonical_xform = global_orient[:, None] @ canonical_xform
        return self.global_to_local(canonical_xform)

    def get_tpose_joints(self, offsets: Array, parents: np.ndarray) -> Array:
        """Accumulate parent-relative offsets [B, J, 3] → T-pose joints
        (reference fk.py:90-96)."""
        joints = [offsets[:, 0]]
        for j in range(1, len(parents)):
            joints.append(joints[int(parents[j])] + offsets[:, j])
        return jnp.stack(joints, axis=1)


def _default_offsets(J: int) -> np.ndarray:
    """Rest-pose parent-relative joint offsets: from the SMPL body-model file
    when available (reference fk.py:28-33), else a unit-length synthetic
    skeleton (structure-only; tests and smoke paths)."""
    try:
        from condmdi_tpu.models.smpl import SMPLModel

        model = SMPLModel.from_files()
        joints = np.asarray(model.J_regressor @ model.v_template)  # [J, 3]
        off = joints.copy()
        off[1:] -= joints[SMPL_PARENTS[1:]]
        return off[:J]
    except Exception:
        rng = np.random.default_rng(0)
        off = rng.standard_normal((J, 3)).astype(np.float32)
        off /= np.linalg.norm(off, axis=-1, keepdims=True) * 4.0
        return off


# ---- velocity estimators (helper_functions.py) ------------------------------ #
def estimate_linear_velocity(data_seq: Array, dt: float) -> Array:
    """Forward/central/backward differences over axis 1 (helper_functions.py:5)."""
    init_vel = (data_seq[:, 1:2] - data_seq[:, :1]) / dt
    middle_vel = (data_seq[:, 2:] - data_seq[:, :-2]) / (2 * dt)
    final_vel = (data_seq[:, -1:] - data_seq[:, -2:-1]) / dt
    return jnp.concatenate([init_vel, middle_vel, final_vel], axis=1)


def estimate_angular_velocity(rot_seq: Array, dt: float) -> Array:
    """Angular velocity from a rotation-matrix sequence [B, T, ..., 3, 3]
    (helper_functions.py:24): w_mat = dR/dt @ R^T, averaged skew entries."""
    dRdt = estimate_linear_velocity(rot_seq, dt)
    w_mat = dRdt @ jnp.swapaxes(rot_seq, -1, -2)
    w_x = (-w_mat[..., 1, 2] + w_mat[..., 2, 1]) / 2.0
    w_y = (w_mat[..., 0, 2] - w_mat[..., 2, 0]) / 2.0
    w_z = (-w_mat[..., 0, 1] + w_mat[..., 1, 0]) / 2.0
    return jnp.stack([w_x, w_y, w_z], axis=-1)


# ---- 764-d field builders (utils.py) ---------------------------------------- #
# (the authoritative slot layout is LAYOUT_764 in data/amass.py — golden-
# tested against the reference; do not re-derive an order here)


def fields_from_poses(poses: Array, trans: Array, fk: Optional[ForwardKinematics] = None) -> dict:
    """SMPL axis-angle poses [N, T, 24, 3] + root translation [N, T, 3] →
    NeMF field dict (reference load_data, utils.py:163-215 / prep_to_load,
    utils.py:221-258 — both share this core).

    One jittable program: FK over a flattened [N*T] batch, velocities over
    the T axis, all field transforms fused by XLA.
    """
    if fk is None:
        fk = ForwardKinematics()
    poses, trans = jnp.asarray(poses), jnp.asarray(trans)
    N, T = poses.shape[:2]
    root_orient_aa = poses[:, :, 0]
    root_rotation = axis_angle_to_matrix(root_orient_aa)  # [N, T, 3, 3]
    poses = poses.at[:, :, 0].set(0.0)

    rotmat = axis_angle_to_matrix(poses)  # [N, T, 24, 3, 3]
    angular = estimate_angular_velocity(rotmat, dt=1.0 / FPS)
    pos, global_xform = fk(rotmat.reshape(-1, 24, 3, 3))
    pos = pos.reshape(N, T, 24, 3)
    global_xform = global_xform.reshape(N, T, 24, 4, 4)[..., :3, :3]
    velocity = estimate_linear_velocity(pos, dt=1.0 / FPS)
    root_vel = estimate_linear_velocity(trans, dt=1.0 / FPS)
    global_pos = (root_rotation[:, :, None] @ pos[..., None])[..., 0] + trans[:, :, None]
    return {
        "pos": pos,
        "velocity": velocity,
        "global_xform": matrix_to_rotation_6d(global_xform),
        "angular": angular,
        "root_orient": matrix_to_rotation_6d(root_rotation),
        "root_vel": root_vel,
        "global_pos": global_pos,
        "rotmat": rotmat,
        "trans": trans,
    }


def load_amass_files(files, max_samples: int = 400, fk: Optional[ForwardKinematics] = None) -> dict:
    """Host-side .npz reading + fields_from_poses (reference load_data,
    utils.py:163). Accepts SMPL-H 'poses' or 'root_orient'+'pose_body'."""
    poses, trans = [], []
    assert len(files) != 0, "files not found"
    for f in files[: min(max_samples, len(files))]:
        bdata = np.load(f)
        if "poses" in bdata.keys():
            poses.append(bdata["poses"][:, :72])
        elif "root_orient" in bdata.keys() and "pose_body" in bdata.keys():
            poses.append(
                np.concatenate((bdata["root_orient"], bdata["pose_body"]), axis=-1)
            )
        else:
            raise RuntimeError(f"missing pose parameters in the file: {f}")
        trans.append(bdata["trans"])
    trans = jnp.asarray(np.asarray(trans, np.float32))
    N, T = trans.shape[:2]
    poses = jnp.asarray(np.asarray(poses, np.float32)).reshape(N, T, 24, 3)
    return fields_from_poses(poses, trans, fk)


def prep_to_save(data: dict, fk: Optional[ForwardKinematics] = None) -> dict:
    """Field dict → SMPL save format {poses [B,T,165] axis-angle, trans,
    betas, gender, mocap_framerate} (reference prep_to_save, utils.py:125;
    save_data, utils.py:81 minus file IO)."""
    if fk is None:
        fk = ForwardKinematics()
    rotmat = jnp.asarray(data["rotmat"])  # [B, T, J, 3, 3]
    B, T, J = rotmat.shape[:3]
    local_rotmat = fk.global_to_local(rotmat.reshape(-1, J, 3, 3)).reshape(B, T, J, 3, 3)
    if ROOT_TRANSFORM:
        root_orient = rotation_6d_to_matrix(jnp.asarray(data["root_orient"]))
        local_rotmat = local_rotmat.at[:, :, 0].set(root_orient)
    poses = matrix_to_axis_angle(local_rotmat).reshape(B, T, -1)  # [B, T, 72]
    poses = jnp.pad(poses, ((0, 0), (0, 0), (0, 93)))  # [B, T, 165]
    return {
        "poses": np.asarray(poses),
        "trans": np.asarray(data["trans"]),
        "betas": np.zeros((B, 10), np.float32),
        "gender": "male",
        "mocap_framerate": FPS,
    }


# the authoritative 764-d block layout (reference batch_to_dict,
# utils.py:263-283). NOTE: data/amass.py's FIELD_SLICES shares these
# boundaries but names 291:363 'velocity' and 398:470 'global_vel'; the
# reference's own decoder names them 'angular' and 'velocity' — these names.
LAYOUT_764 = {
    "trans": (0, 3),
    "rotmat": (3, 219),
    "pos": (219, 291),
    "angular": (291, 363),
    "contacts": (363, 371),
    "height": (371, 395),
    "root_vel": (395, 398),
    "velocity": (398, 470),
    "global_xform": (470, 614),
    "root_orient": (614, 620),
    "rot6d": (620, 764),
}


def dict_to_batch(data_dict: dict) -> Array:
    """Field dict → [B, 1, T, 764] model layout (counterpart of
    batch_to_dict; reference dict_to_batch, utils.py:16, concatenates in
    dict order — here placement is explicit by LAYOUT_764 so any field
    subset round-trips)."""
    b, t = np.asarray(data_dict["pos"]).shape[:2]
    out = jnp.zeros((b, t, 764))
    for key, (lo, hi) in LAYOUT_764.items():
        val = data_dict.get(key)
        if val is None:
            continue
        out = out.at[..., lo:hi].set(jnp.asarray(val).reshape(b, t, hi - lo))
    return out[:, None]


def batch_to_dict(batch: Array) -> dict:
    """[B, 1, T, 764] (or [B, T, 764]) → field dict (reference batch_to_dict,
    utils.py:263-283; slice table asserted against data/amass.py)."""
    batch = jnp.asarray(batch)
    if batch.ndim == 4:
        batch = batch[:, 0]
    B, T = batch.shape[:2]
    return {
        "trans": batch[..., 0:3],
        "rotmat": batch[..., 3 : 3 + 216].reshape(B, T, 24, 3, 3),
        "pos": batch[..., 219 : 219 + 72].reshape(B, T, 24, 3),
        "angular": batch[..., 291 : 291 + 72].reshape(B, T, 24, 3),
        "contacts": batch[..., 363:371],
        "height": batch[..., 371:395],
        "root_vel": batch[..., 395:398],
        "velocity": batch[..., 398 : 398 + 72].reshape(B, T, 24, 3),
        "global_xform": batch[..., 470 : 470 + 144].reshape(B, T, 24, 6),
        "root_orient": batch[..., 614:620],
        "rot6d": batch[..., 620:].reshape(B, T, 24, 6),
    }


def dict_to_xyz(data_dict: dict) -> Array:
    """Field dict → global joint positions [B, T, 24, 3] (reference
    dict_to_xyz, utils.py:286-308): rotate local joints by the root
    orientation, add root XZ, overwrite root with trans + height-y."""
    root_quat = matrix_to_quaternion(rotation_6d_to_matrix(jnp.asarray(data_dict["root_orient"])))
    r_pos = jnp.asarray(data_dict["trans"])
    positions = jnp.asarray(data_dict["pos"])
    q = jnp.broadcast_to(qinv(root_quat)[..., None, :], positions.shape[:-1] + (4,))
    positions = qrot(q, positions)
    positions = positions.at[..., 0].add(r_pos[..., 0:1])
    positions = positions.at[..., 1].add(r_pos[..., 1:2])
    positions = positions.at[..., 2].add(r_pos[..., 2:3])
    positions = positions.at[..., :1, :].set(r_pos[..., None, :])
    positions = positions.at[..., 1].set(jnp.asarray(data_dict["height"]))
    return positions


def dict_to_posrot(data_dict: dict, fk: Optional[ForwardKinematics] = None):
    """Field dict → (positions [B,T,3], local joint quaternions [B,T,J,4])
    (reference dict_to_posrot, utils.py:318-330) — the bvh-export view."""
    if fk is None:
        fk = ForwardKinematics()
    rotmat = jnp.asarray(data_dict["rotmat"])
    B, T, J = rotmat.shape[:3]
    local_rotmat = fk.global_to_local(rotmat.reshape(-1, J, 3, 3)).reshape(B, T, J, 3, 3)
    root_orient = rotation_6d_to_matrix(jnp.asarray(data_dict["root_orient"]))
    local_rotmat = local_rotmat.at[:, :, 0].set(root_orient)
    rotations = matrix_to_quaternion(local_rotmat)
    return jnp.asarray(data_dict["trans"]), rotations
