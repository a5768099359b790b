"""SMPL body model: JAX LBS implementation + Rotation2xyz.

Parity targets: reference model/smpl.py:64 (SMPL smplx wrapper with extra
joint regressor + vibe/a2m/smpl/a2mpl joint maps) and model/rotation2xyz.py:17
(Rotation2xyz: rot6d/rotvec/rotmat/quat → SMPL joints/vertices; xyz
passthrough; root-centering + translation add).

The LBS math itself (shape blendshapes → pose blendshapes → joint regression
→ rigid kinematic transforms → skinning) is the standard SMPL formulation,
implemented natively in JAX — fully jittable/vmappable/differentiable, which
is what the geometric losses (lambda_rcxyz / lambda_fc,
gaussian_diffusion.py:2001,:2030) need.

Body-model weights (SMPL_NEUTRAL.pkl → npz) are loaded from
$CONDMDI_BODY_MODELS or ./body_models when present (the reference downloads
them via prepare/download_smpl_files.sh); `SMPLModel.random_init` provides a
structurally-valid synthetic model for tests.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from condmdi_tpu.geometry.rotations import (
    axis_angle_to_matrix,
    quaternion_to_matrix,
    rotation_6d_to_matrix,
)

Array = jax.Array

JOINTSTYPE_ROOT = {"a2m": 0, "smpl": 0, "a2mpl": 0, "vibe": 8}
ACTION2MOTION_JOINTS = [8, 1, 2, 3, 4, 5, 6, 7, 9, 10, 11, 12, 14, 21, 24, 38]

SMPL_NUM_JOINTS = 24


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SMPLModel:
    """SMPL parameters as arrays (f32)."""

    v_template: Array  # [V, 3]
    shapedirs: Array  # [V, 3, n_betas]
    posedirs: Array  # [(J-1)*9, V*3] — pose blendshape basis (transposed)
    J_regressor: Array  # [J, V]
    parents: Array  # [J] int
    lbs_weights: Array  # [V, J]
    J_regressor_extra: Optional[Array] = None  # [J_extra, V]

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]

    @property
    def num_betas(self) -> int:
        return self.shapedirs.shape[-1]

    # ------------------------------------------------------------------ #
    @classmethod
    def from_files(cls, model_dir: Optional[str] = None) -> "SMPLModel":
        """Load SMPL_NEUTRAL from npz/pkl in $CONDMDI_BODY_MODELS or ./body_models."""
        candidates = [
            os.environ.get("CONDMDI_BODY_MODELS", ""),
            model_dir or "",
            "body_models/smpl",
            "./body_models",
        ]
        for c in candidates:
            if not c:
                continue
            p = Path(c)
            for name in ("SMPL_NEUTRAL.npz", "SMPL_NEUTRAL.pkl"):
                f = p / name
                if f.exists():
                    return cls._load(f)
        raise FileNotFoundError(
            "SMPL body model not found; set CONDMDI_BODY_MODELS or download "
            "via the reference prepare/download_smpl_files.sh"
        )

    @classmethod
    def _load(cls, path: Path) -> "SMPLModel":
        if path.suffix == ".npz":
            data = dict(np.load(path, allow_pickle=True))
        else:
            import pickle

            with open(path, "rb") as fh:
                data = pickle.load(fh, encoding="latin1")
        to_np = lambda x: np.asarray(x, dtype=np.float32)
        posedirs = to_np(data["posedirs"])  # [V, 3, (J-1)*9]
        V = posedirs.shape[0]
        posedirs = posedirs.reshape(V * 3, -1).T  # [(J-1)*9, V*3]
        extra = None
        extra_path = path.parent / "J_regressor_extra.npy"
        if extra_path.exists():
            extra = jnp.asarray(np.load(extra_path).astype(np.float32))
        return cls(
            v_template=jnp.asarray(to_np(data["v_template"])),
            shapedirs=jnp.asarray(to_np(data["shapedirs"])[..., :10]),
            posedirs=jnp.asarray(posedirs),
            J_regressor=jnp.asarray(to_np(data["J_regressor"])),
            parents=jnp.asarray(np.asarray(data["kintree_table"])[0].astype(np.int32)),
            lbs_weights=jnp.asarray(to_np(data["weights"])),
            J_regressor_extra=extra,
        )

    @classmethod
    def random_init(cls, n_vertices: int = 200, seed: int = 0) -> "SMPLModel":
        """Structurally valid synthetic body model for tests."""
        rng = np.random.default_rng(seed)
        J = SMPL_NUM_JOINTS
        parents = np.array(
            [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
             18, 19, 20, 21], np.int32
        )
        v_template = rng.normal(0, 0.3, (n_vertices, 3)).astype(np.float32)
        w = rng.uniform(0, 1, (n_vertices, J)).astype(np.float32)
        w = w / w.sum(axis=1, keepdims=True)
        jr = rng.uniform(0, 1, (J, n_vertices)).astype(np.float32)
        jr = jr / jr.sum(axis=1, keepdims=True)
        return cls(
            v_template=jnp.asarray(v_template),
            shapedirs=jnp.asarray(rng.normal(0, 0.01, (n_vertices, 3, 10)).astype(np.float32)),
            posedirs=jnp.asarray(rng.normal(0, 0.001, ((J - 1) * 9, n_vertices * 3)).astype(np.float32)),
            J_regressor=jnp.asarray(jr),
            parents=jnp.asarray(parents),
            lbs_weights=jnp.asarray(w),
        )


def lbs(
    model: SMPLModel,
    betas: Array,  # [B, n_betas]
    global_orient: Array,  # [B, 3, 3]
    body_pose: Array,  # [B, J-1, 3, 3]
):
    """Standard SMPL linear blend skinning. Returns (vertices [B,V,3],
    joints [B,J,3])."""
    B = betas.shape[0]
    J = model.num_joints

    # shape blendshapes
    v_shaped = model.v_template[None] + jnp.einsum(
        "bl,vkl->bvk", betas, model.shapedirs
    )
    # rest joints
    j_rest = jnp.einsum("jv,bvk->bjk", model.J_regressor, v_shaped)

    rot_mats = jnp.concatenate([global_orient[:, None], body_pose], axis=1)  # [B,J,3,3]

    # pose blendshapes (relative to identity)
    ident = jnp.eye(3)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)  # [B,(J-1)*9]
    pose_offsets = (pose_feature @ model.posedirs).reshape(B, -1, 3)
    v_posed = v_shaped + pose_offsets

    # rigid transforms down the kinematic tree
    parents = np.asarray(model.parents)
    rel_joints = j_rest.at[:, 1:].add(-j_rest[:, parents[1:]])

    def make_tf(R, t):
        tf = jnp.zeros(R.shape[:-2] + (4, 4), R.dtype)
        tf = tf.at[..., :3, :3].set(R)
        tf = tf.at[..., :3, 3].set(t)
        return tf.at[..., 3, 3].set(1.0)

    transforms = [make_tf(rot_mats[:, 0], rel_joints[:, 0])]
    for j in range(1, J):
        transforms.append(
            transforms[parents[j]] @ make_tf(rot_mats[:, j], rel_joints[:, j])
        )
    A = jnp.stack(transforms, axis=1)  # [B, J, 4, 4]
    joints = A[..., :3, 3]

    # remove rest-pose joint locations from the transforms
    j_h = jnp.concatenate([j_rest, jnp.zeros((B, J, 1))], axis=-1)
    correction = jnp.einsum("bjJK,bjK->bjJ", A, j_h)
    A_skin = A.at[..., :3, 3].add(-correction[..., :3])

    W = model.lbs_weights  # [V, J]
    T = jnp.einsum("vj,bjJK->bvJK", W, A_skin)
    v_h = jnp.concatenate([v_posed, jnp.ones((B, v_posed.shape[1], 1))], axis=-1)
    vertices = jnp.einsum("bvJK,bvK->bvJ", T, v_h)[..., :3]
    return vertices, joints


class SMPLWrapper:
    """SMPL + extra joint regressor + joint maps (reference smpl.py:64)."""

    def __init__(self, model: Optional[SMPLModel] = None):
        self.model = model or SMPLModel.from_files()
        smpl_indexes = np.arange(SMPL_NUM_JOINTS)
        self.maps = {"smpl": smpl_indexes}
        if self.model.J_regressor_extra is not None:
            # the full vibe/a2m maps need the 45-joint smplx output + extras;
            # with the bare SMPL model we expose smpl + a2m-on-smpl subsets
            self.maps["a2m"] = np.array([j for j in ACTION2MOTION_JOINTS if j < 24])
        else:
            self.maps["a2m"] = np.array([j for j in ACTION2MOTION_JOINTS if j < 24])
        self.maps["a2mpl"] = np.unique(np.r_[smpl_indexes, self.maps["a2m"]])

    def __call__(self, body_pose: Array, global_orient: Array, betas: Array) -> dict:
        vertices, joints = lbs(self.model, betas, global_orient, body_pose)
        out = {"vertices": vertices}
        for k, idx in self.maps.items():
            out[k] = joints[:, idx]
        return out


class Rotation2xyz:
    """Rotations → joints/vertices via SMPL (reference rotation2xyz.py:17)."""

    def __init__(self, smpl: Optional[SMPLWrapper] = None):
        self._smpl = smpl

    @property
    def smpl(self) -> SMPLWrapper:
        if self._smpl is None:
            self._smpl = SMPLWrapper()
        return self._smpl

    def __call__(
        self,
        x: Array,  # [B, T, njoints, feats] (time-major variant of ref layout)
        pose_rep: str = "rot6d",
        translation: bool = True,
        glob: bool = True,
        jointstype: str = "smpl",
        vertstrans: bool = False,
        betas: Optional[Array] = None,
        beta: float = 0.0,
        glob_rot=None,
    ) -> Array:
        if pose_rep == "xyz":
            return x

        if translation:
            x_translations = x[:, :, -1, :3]  # [B, T, 3]
            x_rotations = x[:, :, :-1]
        else:
            x_rotations = x
        B, T, njoints, feats = x_rotations.shape
        flat = x_rotations.reshape(B * T, njoints, feats)

        if pose_rep == "rotvec":
            rotations = axis_angle_to_matrix(flat)
        elif pose_rep == "rotmat":
            rotations = flat.reshape(-1, njoints, 3, 3)
        elif pose_rep == "rotquat":
            rotations = quaternion_to_matrix(flat)
        elif pose_rep == "rot6d":
            rotations = rotation_6d_to_matrix(flat)
        else:
            raise NotImplementedError(f"no geometry for {pose_rep}")

        if glob:
            global_orient = rotations[:, 0]
            rotations = rotations[:, 1:]
        else:
            assert glob_rot is not None
            global_orient = jnp.broadcast_to(
                axis_angle_to_matrix(jnp.asarray(glob_rot)), (len(rotations), 3, 3)
            )

        if betas is None:
            betas = jnp.zeros((rotations.shape[0], self.smpl.model.num_betas))
            betas = betas.at[:, 1].set(beta)

        out = self.smpl(rotations, global_orient, betas)
        joints = out[jointstype]  # [B*T, J', 3]
        joints = joints.reshape(B, T, joints.shape[1], 3)

        if jointstype != "vertices":
            root = JOINTSTYPE_ROOT[jointstype]
            joints = joints - joints[:, :, root : root + 1, :]

        if translation and vertstrans:
            x_translations = x_translations - x_translations[:, :1, :]
            joints = joints + x_translations[:, :, None, :]
        return joints
