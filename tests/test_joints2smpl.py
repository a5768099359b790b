"""SMPLify-style fitting: recovers poses that explain target joints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.geometry.rotations import axis_angle_to_matrix
from condmdi_tpu.models.smpl import SMPLModel, lbs
from condmdi_tpu.viz.joints2smpl import (
    FitConfig,
    fit_smpl_to_joints,
    save_obj,
    smpl_mesh_from_params,
)


@pytest.mark.slow
class TestFitting:
    def test_fit_recovers_synthetic_pose(self):
        model = SMPLModel.random_init(n_vertices=80, seed=0)
        T = 4
        rng = np.random.default_rng(1)
        true_pose = jnp.asarray(rng.normal(0, 0.2, (T, 24, 3)).astype(np.float32))
        true_trans = jnp.asarray(rng.normal(0, 0.5, (T, 3)).astype(np.float32))
        R = axis_angle_to_matrix(true_pose)
        _, j = lbs(model, jnp.zeros((T, 10)), R[:, 0], R[:, 1:])
        target = j[:, :22] - j[:, :1] + true_trans[:, None, :]

        params, loss = fit_smpl_to_joints(
            model, target, FitConfig(num_steps=400, lr=0.03)
        )
        assert float(loss) < 5e-3

        verts = smpl_mesh_from_params(model, params)
        assert verts.shape[0] == T
        assert np.isfinite(np.asarray(verts)).all()

    def test_save_obj(self, tmp_path):
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
        f = np.array([[0, 1, 2]])
        p = save_obj(v, f, tmp_path / "x.obj")
        content = open(p).read()
        assert content.count("v ") == 3 and "f 1 2 3" in content
