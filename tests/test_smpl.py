"""SMPL LBS math tests (synthetic body model) + Rotation2xyz semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.geometry.rotations import axis_angle_to_matrix
from condmdi_tpu.models.smpl import (
    Rotation2xyz,
    SMPLModel,
    SMPLWrapper,
    lbs,
)


@pytest.fixture(scope="module")
def model():
    return SMPLModel.random_init(n_vertices=100, seed=0)


class TestLBS:
    def test_identity_pose_gives_rest_joints(self, model):
        B, J = 2, model.num_joints
        betas = jnp.zeros((B, 10))
        eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        body = jnp.broadcast_to(jnp.eye(3), (B, J - 1, 3, 3))
        verts, joints = lbs(model, betas, eye, body)
        v_rest = np.asarray(model.v_template)
        j_rest = np.asarray(model.J_regressor) @ v_rest
        np.testing.assert_allclose(np.asarray(verts[0]), v_rest, atol=1e-5)
        np.testing.assert_allclose(np.asarray(joints[0]), j_rest, atol=1e-5)

    @pytest.mark.slow
    def test_global_rotation_rotates_everything(self, model):
        B, J = 1, model.num_joints
        betas = jnp.zeros((B, 10))
        aa = jnp.asarray([[0.0, np.pi / 2, 0.0]])
        R = axis_angle_to_matrix(aa)
        body = jnp.broadcast_to(jnp.eye(3), (B, J - 1, 3, 3))
        verts_rot, joints_rot = lbs(model, betas, R, body)
        eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        verts_id, joints_id = lbs(model, betas, eye, body)
        # rotating around the root: joints_rot = root + R (joints_id - root)
        root = np.asarray(joints_id[0, 0])
        want = root + (np.asarray(joints_id[0]) - root) @ np.asarray(R[0]).T
        np.testing.assert_allclose(np.asarray(joints_rot[0]), want, atol=1e-4)

    def test_betas_change_shape(self, model):
        B, J = 1, model.num_joints
        eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        body = jnp.broadcast_to(jnp.eye(3), (B, J - 1, 3, 3))
        v0, _ = lbs(model, jnp.zeros((B, 10)), eye, body)
        v1, _ = lbs(model, jnp.ones((B, 10)), eye, body)
        assert not np.allclose(np.asarray(v0), np.asarray(v1))

    @pytest.mark.slow
    def test_differentiable(self, model):
        B, J = 1, model.num_joints

        def loss(aa):
            R = axis_angle_to_matrix(aa)
            body = jnp.broadcast_to(jnp.eye(3), (B, J - 1, 3, 3))
            _, joints = lbs(model, jnp.zeros((B, 10)), R, body)
            return jnp.sum(joints**2)

        g = jax.grad(loss)(jnp.asarray([[0.1, 0.2, 0.3]]))
        assert np.isfinite(np.asarray(g)).all()


class TestRotation2xyz:
    def test_xyz_passthrough(self, model):
        r = Rotation2xyz(SMPLWrapper(model))
        x = jnp.ones((2, 5, 22, 3))
        out = r(x, pose_rep="xyz")
        np.testing.assert_allclose(np.asarray(out), np.asarray(x))

    def test_rot6d_to_joints(self, model):
        r = Rotation2xyz(SMPLWrapper(model))
        B, T, J = 2, 3, 24
        rng = np.random.default_rng(0)
        # identity 6d = first two rows of I
        ident6d = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), (B, T, J + 1, 1))
        ident6d[:, :, -1, :3] = rng.standard_normal((B, T, 3)) * 0.1  # translation row
        out = r(jnp.asarray(ident6d), pose_rep="rot6d", translation=True,
                glob=True, jointstype="smpl", vertstrans=False)
        assert out.shape == (B, T, 24, 3)
        # root-centred output: root at origin
        np.testing.assert_allclose(np.asarray(out[:, :, 0]), 0.0, atol=1e-5)
