"""Joints → SMPL parameter fitting + mesh export.

Parity targets: reference visualize/simplify_loc2rot.py (joints2smpl:13 —
SMPLify-style optimization fitting SMPL pose/translation to 22 predicted
joints), visualize/joints2smpl/src/{smplify,customloss}.py (staged
optimization with joint-distance loss + pose regularization), and
visualize/render_mesh.py + vis_utils.npy2obj (results.npy → per-frame .obj).

TPU-native re-design: the reference runs per-frame LBFGS/Adam loops in
eager torch; here ALL frames are fit jointly by one jitted optax Adam loop
(`lax.scan` over steps) with a temporal-smoothness prior — the whole clip
is one compiled program.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from condmdi_tpu.geometry.rotations import axis_angle_to_matrix
from condmdi_tpu.models.smpl import SMPLModel, lbs

Array = jax.Array

# SMPL joint indices matching the 22 HumanML3D joints (first 22 of 24)
HML_TO_SMPL = np.arange(22)


@dataclass
class FitConfig:
    num_steps: int = 300
    lr: float = 0.05
    pose_reg: float = 1e-3
    smooth_reg: float = 1e-2
    betas_reg: float = 1e-2


def fit_smpl_to_joints(
    model: SMPLModel,
    joints: Array,  # [T, 22, 3] target joint positions
    cfg: FitConfig = FitConfig(),
    rng: Optional[Array] = None,
):
    """Optimize (pose_aa [T,24,3], trans [T,3], betas [10]) to match joints.

    Returns (params dict, final loss). Jitted end-to-end: the Adam loop is a
    lax.scan; gradients flow through the full LBS.
    """
    import optax

    T = joints.shape[0]
    init = {
        "pose": jnp.zeros((T, 24, 3)),
        "trans": joints[:, 0, :],  # pelvis as translation init
        "betas": jnp.zeros((10,)),
    }

    opt = optax.adam(cfg.lr)

    def joints_from_params(p):
        R = axis_angle_to_matrix(p["pose"])  # [T, 24, 3, 3]
        betas = jnp.broadcast_to(p["betas"], (T, 10))
        _, j = lbs(model, betas, R[:, 0], R[:, 1:])
        return j[:, HML_TO_SMPL] - j[:, :1] + p["trans"][:, None, :]

    def loss_fn(p):
        pred = joints_from_params(p)
        data = jnp.mean((pred - joints) ** 2)
        reg = cfg.pose_reg * jnp.mean(p["pose"] ** 2)
        smooth = cfg.smooth_reg * jnp.mean(
            (p["pose"][1:] - p["pose"][:-1]) ** 2
        )
        breg = cfg.betas_reg * jnp.mean(p["betas"] ** 2)
        return data + reg + smooth + breg

    @jax.jit
    def run(init):
        state = opt.init(init)

        def step(carry, _):
            p, s = carry
            loss, g = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(g, s)
            p = optax.apply_updates(p, updates)
            return (p, s), loss

        (p, _), losses = jax.lax.scan(step, (init, state), None, length=cfg.num_steps)
        return p, losses[-1]

    return run(init)


def smpl_mesh_from_params(model: SMPLModel, params: dict):
    """Fitted params → per-frame vertices [T, V, 3]."""
    T = params["pose"].shape[0]
    R = axis_angle_to_matrix(params["pose"])
    betas = jnp.broadcast_to(params["betas"], (T, 10))
    verts, joints = lbs(model, betas, R[:, 0], R[:, 1:])
    return verts - joints[:, :1] + params["trans"][:, None, :]


def save_obj(vertices: np.ndarray, faces: Optional[np.ndarray], path: str | Path):
    """Minimal .obj writer (reference vis_utils.npy2obj.save_obj)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as fh:
        for v in vertices:
            fh.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        if faces is not None:
            for f in faces + 1:
                fh.write(f"f {f[0]} {f[1]} {f[2]}\n")
    return path


def render_mesh_cli(results_npy: str, out_dir: str, sample_idx: int = 0,
                    model: Optional[SMPLModel] = None, faces=None):
    """reference render_mesh.py: results.npy → fitted SMPL .obj sequence."""
    data = np.load(results_npy, allow_pickle=True).item()
    joints = np.asarray(data["joints"][sample_idx])  # [T, 22, 3]
    model = model or SMPLModel.from_files()
    params, loss = fit_smpl_to_joints(model, jnp.asarray(joints))
    verts = np.asarray(smpl_mesh_from_params(model, params))
    out = Path(out_dir)
    paths = [
        save_obj(verts[t], faces, out / f"frame{t:03d}.obj")
        for t in range(verts.shape[0])
    ]
    return paths, float(loss)
