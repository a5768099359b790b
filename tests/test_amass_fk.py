"""AMASS FK surface: golden parity vs the reference torch implementation
(data_loaders/amass/utils/{fk,helper_functions,utils}.py).

The reference FK layer is run with EXPLICIT parents/offsets (its default
path loads the SMPL body-model npz, absent from this image); utils.py needs
a human_body_prior stub to import (only c2c is used)."""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from condmdi_tpu.data.amass_fk import (
    SMPL_PARENTS,
    ForwardKinematics,
    batch_to_dict,
    dict_to_batch,
    dict_to_xyz,
    estimate_angular_velocity,
    estimate_linear_velocity,
    fields_from_poses,
    prep_to_save,
)

J = 24


def _rand_offsets(seed=0):
    rng = np.random.default_rng(seed)
    off = rng.standard_normal((J, 3)).astype(np.float32) * 0.2
    off[0] = 0
    return off


def _rand_rotmats(b, t=None, seed=1):
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(seed)
    n = b * J if t is None else b * t * J
    R = Rotation.random(n, random_state=int(rng.integers(1 << 30))).as_matrix()
    shape = (b, J, 3, 3) if t is None else (b, t, J, 3, 3)
    return R.reshape(shape).astype(np.float32)


@pytest.fixture(scope="module")
def ref_fk(reference_path):
    import torch  # noqa: F401

    from data_loaders.amass.utils.fk import ForwardKinematicsLayer

    import os

    cwd = os.getcwd()
    os.chdir(reference_path)  # fk.py opens smpl.yaml relative to CWD
    try:
        layer = ForwardKinematicsLayer(
            parents=SMPL_PARENTS.astype(np.int64),
            positions=_rand_offsets(),
            device="cpu",
        )
    finally:
        os.chdir(cwd)
    return layer


@pytest.fixture(scope="module")
def ours():
    return ForwardKinematics(offsets=_rand_offsets())


class TestFKGolden:
    def test_forward_rotmat(self, ref_fk, ours):
        import torch

        rot = _rand_rotmats(5)
        pos_ref, tf_ref = ref_fk(torch.from_numpy(rot))
        pos, tf = ours(jnp.asarray(rot))
        np.testing.assert_allclose(np.asarray(pos), pos_ref.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tf), tf_ref.numpy(), atol=1e-5)

    @pytest.mark.parametrize("rep,dim", [("quat", 4), ("6d", 6)])
    def test_forward_other_reps(self, ref_fk, ours, rep, dim):
        import torch

        rng = np.random.default_rng(3)
        if rep == "quat":
            q = rng.standard_normal((4, J, 4)).astype(np.float32)
            q /= np.linalg.norm(q, axis=-1, keepdims=True)
            rots = q
        else:
            rots = rng.standard_normal((4, J, 6)).astype(np.float32)
        pos_ref, _ = ref_fk(torch.from_numpy(rots))
        pos, _ = ours(jnp.asarray(rots))
        np.testing.assert_allclose(np.asarray(pos), pos_ref.numpy(), atol=1e-4)

    def test_global_to_local(self, ref_fk, ours):
        import torch

        # build CONSISTENT globals via FK so inv() sees rotations
        rot = _rand_rotmats(3, seed=7)
        _, tf = ours(jnp.asarray(rot))
        glob = np.asarray(tf[..., :3, :3])
        loc_ref = ref_fk.global_to_local(torch.from_numpy(glob))
        loc = ours.global_to_local(jnp.asarray(glob))
        np.testing.assert_allclose(np.asarray(loc), loc_ref.numpy(), atol=1e-4)
        # and it inverts FK's own composition
        np.testing.assert_allclose(np.asarray(loc), rot, atol=1e-4)

    def test_get_tpose_joints(self, ref_fk, ours):
        import torch

        off = np.tile(_rand_offsets(9)[None], (2, 1, 1))
        ref = ref_fk.get_tpose_joints(torch.from_numpy(off), torch.from_numpy(SMPL_PARENTS.astype(np.int64)))
        got = ours.get_tpose_joints(jnp.asarray(off), SMPL_PARENTS)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-6)


class TestVelocities:
    def test_linear(self, reference_path):
        import torch

        from data_loaders.amass.utils.helper_functions import (
            estimate_linear_velocity as ref_lin,
        )

        x = np.random.default_rng(0).standard_normal((2, 9, 5, 3)).astype(np.float32)
        ref = ref_lin(torch.from_numpy(x), dt=1 / 30)
        got = estimate_linear_velocity(jnp.asarray(x), dt=1 / 30)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5)

    def test_angular(self, reference_path):
        import torch

        from data_loaders.amass.utils.helper_functions import (
            estimate_angular_velocity as ref_ang,
        )

        R = _rand_rotmats(2, t=9, seed=11)
        ref = ref_ang(torch.from_numpy(R), dt=1 / 30)
        got = estimate_angular_velocity(jnp.asarray(R), dt=1 / 30)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-4)


def _stub_hbp():
    """utils.py imports human_body_prior only for copy2cpu."""
    if "human_body_prior" in sys.modules:
        return
    hbp = types.ModuleType("human_body_prior")
    tools = types.ModuleType("human_body_prior.tools")
    omni = types.ModuleType("human_body_prior.tools.omni_tools")
    omni.copy2cpu = lambda x: x.detach().cpu().numpy()
    hbp.tools, tools.omni_tools = tools, omni
    sys.modules["human_body_prior"] = hbp
    sys.modules["human_body_prior.tools"] = tools
    sys.modules["human_body_prior.tools.omni_tools"] = omni


class TestFieldBuilders:
    def test_fields_from_poses_golden(self, reference_path, ref_fk, ours):
        """Reproduce reference load_data's math (utils.py:163-215) with the
        reference's own torch building blocks, compare every field."""
        import torch

        from data_loaders.amass.utils.helper_functions import (
            estimate_angular_velocity as ref_ang,
            estimate_linear_velocity as ref_lin,
        )
        from data_loaders.amass.utils.rotations import (
            axis_angle_to_matrix as ref_aa2m,
            matrix_to_rotation_6d as ref_m26,
        )

        rng = np.random.default_rng(42)
        N, T = 2, 8
        poses = (rng.standard_normal((N, T, J, 3)) * 0.4).astype(np.float32)
        trans = rng.standard_normal((N, T, 3)).astype(np.float32)

        tp, tt = torch.from_numpy(poses.copy()), torch.from_numpy(trans)
        root_orient = tp[:, :, 0].clone()
        root_rotation = ref_aa2m(root_orient)
        tp[:, :, 0] = 0
        rotmat = ref_aa2m(tp)
        angular = ref_ang(rotmat.clone(), dt=1 / 30)
        pos, global_xform = ref_fk(rotmat.view(-1, J, 3, 3))
        pos = pos.contiguous().view(N, T, J, 3)
        global_xform = global_xform.view(N, T, J, 4, 4)[..., :3, :3]
        velocity = ref_lin(pos, dt=1 / 30)
        root_vel = ref_lin(tt, dt=1 / 30)
        global_pos = torch.matmul(root_rotation.unsqueeze(2), pos.unsqueeze(-1)).squeeze(-1) + tt.unsqueeze(2)

        got = fields_from_poses(jnp.asarray(poses), jnp.asarray(trans), fk=ours)
        for name, ref in [
            ("pos", pos), ("velocity", velocity), ("angular", angular),
            ("root_vel", root_vel), ("global_pos", global_pos),
            ("rotmat", rotmat),
            ("global_xform", ref_m26(global_xform)),
            ("root_orient", ref_m26(root_rotation)),
            ("trans", tt),
        ]:
            np.testing.assert_allclose(
                np.asarray(got[name]), ref.numpy(), atol=3e-4, err_msg=name
            )

    def test_batch_to_dict_golden(self, reference_path):
        import torch

        _stub_hbp()
        from data_loaders.amass.utils.utils import batch_to_dict as ref_b2d

        x = np.random.default_rng(5).standard_normal((2, 1, 6, 764)).astype(np.float32)
        ref = ref_b2d(torch.from_numpy(x))
        got = batch_to_dict(jnp.asarray(x))
        assert set(got) == set(ref.keys())
        for k in ref:
            np.testing.assert_allclose(np.asarray(got[k]), ref[k].numpy(), atol=0, err_msg=k)

    def test_dict_to_batch_roundtrip(self):
        x = np.random.default_rng(6).standard_normal((2, 1, 6, 764)).astype(np.float32)
        d = batch_to_dict(jnp.asarray(x))
        back = dict_to_batch(d)
        np.testing.assert_allclose(np.asarray(back), x, atol=1e-6)

    def test_dict_to_xyz_golden(self, reference_path):
        import torch

        _stub_hbp()
        from data_loaders.amass.utils.utils import (
            batch_to_dict as ref_b2d,
            dict_to_xyz as ref_d2x,
        )

        x = np.random.default_rng(8).standard_normal((2, 1, 6, 764)).astype(np.float32)
        ref = ref_d2x(ref_b2d(torch.from_numpy(x)))
        got = dict_to_xyz(batch_to_dict(jnp.asarray(x)))
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-4)

    def test_prep_to_save_golden(self, reference_path, ref_fk, ours):
        """prep_to_save math (utils.py:125-160) with the reference's blocks."""
        import torch

        from data_loaders.amass.utils.rotations import (
            matrix_to_axis_angle as ref_m2aa,
            rotation_6d_to_matrix as ref_62m,
        )

        rng = np.random.default_rng(12)
        N, T = 2, 5
        rot = _rand_rotmats(N, t=T, seed=13)
        _, tf = ours(jnp.asarray(rot).reshape(-1, J, 3, 3))
        glob = np.asarray(tf[..., :3, :3]).reshape(N, T, J, 3, 3)
        root6d = rng.standard_normal((N, T, 6)).astype(np.float32)
        trans = rng.standard_normal((N, T, 3)).astype(np.float32)

        loc = ref_fk.global_to_local(torch.from_numpy(glob.reshape(-1, J, 3, 3)))
        loc = loc.view(N, T, J, 3, 3)
        loc[:, :, 0] = ref_62m(torch.from_numpy(root6d))
        ref_poses = ref_m2aa(loc).reshape(N, T, -1).numpy()
        ref_poses = np.pad(ref_poses, [(0, 0), (0, 0), (0, 93)])

        got = prep_to_save(
            {"rotmat": glob, "root_orient": root6d, "trans": trans}, fk=ours
        )
        assert got["poses"].shape == (N, T, 165)
        # axis-angle is sign/2pi ambiguous at the boundary; compare rotations
        from condmdi_tpu.geometry.rotations import axis_angle_to_matrix

        got_m = np.asarray(axis_angle_to_matrix(jnp.asarray(got["poses"][..., :72].reshape(N, T, J, 3))))
        ref_m = np.asarray(axis_angle_to_matrix(jnp.asarray(ref_poses[..., :72].reshape(N, T, J, 3))))
        np.testing.assert_allclose(got_m, ref_m, atol=1e-3)
        np.testing.assert_allclose(got["trans"], trans)
        assert got["betas"].shape == (N, 10) and got["mocap_framerate"] == 30
