"""Random projection (vs shipped asset), opt-file parser, word vectorizer."""

import numpy as np
import pytest

from condmdi_tpu.data.get_opt import get_opt
from condmdi_tpu.data.projection import RandomProjection
from condmdi_tpu.data.word_vectorizer import (
    HashWordVectorizer,
    POS_enumerator,
    tokens_to_embeddings,
)


class TestRandomProjection:
    def test_loads_shipped_matrices(self):
        rp = RandomProjection.load_or_create()
        assert rp.proj.shape == (263, 263)
        x = np.random.default_rng(0).standard_normal((5, 263)).astype(np.float32)
        back = rp.inverse(rp(x))
        np.testing.assert_allclose(back, x, atol=2e-3)

    def test_created_matrix_properties(self, tmp_path):
        rp = RandomProjection.load_or_create(str(tmp_path), scale=10.0, dim=32)
        # first 3 rows carry the scale: larger magnitude
        r0 = np.abs(rp.proj[:3]).mean()
        r_rest = np.abs(rp.proj[3:]).mean()
        assert r0 > 5 * r_rest
        assert (tmp_path / "rand_proj.npy").exists()
        x = np.random.default_rng(1).standard_normal((4, 32))
        np.testing.assert_allclose(rp.inverse(rp(x)), x, atol=1e-5)


class TestGetOpt:
    def test_parse_reference_opt(self):
        opt = get_opt("/root/reference/dataset/humanml_opt.txt", use_abs3d=True)
        assert opt.dataset_name == "t2m"
        assert opt.dim_pose == 263
        assert opt.joints_num == 22
        assert opt.motion_dir.endswith("new_joint_vecs_abs_3d")
        opt_gt = get_opt("/root/reference/dataset/humanml_opt.txt", use_abs3d=True, mode="gt")
        assert opt_gt.motion_dir.endswith("new_joint_vecs")


class TestWordVectorizer:
    def test_vip_pos_override(self):
        v = HashWordVectorizer()
        _, pos = v["walk/VERB"]
        assert pos[POS_enumerator["Act_VIP"]] == 1  # VIP word overrides POS
        _, pos2 = v["table/NOUN"]
        assert pos2[POS_enumerator["NOUN"]] == 1

    def test_tokens_to_embeddings_padding(self):
        v = HashWordVectorizer()
        word, pos, lens = tokens_to_embeddings(
            [["a/DET", "person/NOUN"], ["x/OTHER"] * 30], v, max_text_len=20
        )
        assert word.shape == (2, 22, 300)
        assert lens[0] == 4  # sos + 2 + eos
        assert lens[1] == 22  # cropped to max + sos/eos
