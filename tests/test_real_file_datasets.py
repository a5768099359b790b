"""Real-file dataset parsing exercised on fabricated on-disk trees.

VERDICT r2 #5: the loaders' first contact with real assets must not be
their first execution. Each test writes a miniature copy of the reference's
on-disk layout into tmp_path and runs the ACTUAL loader:
  * HumanML3D: npy + texts/*.txt caption#tokens#f_tag#to_tag parsing,
    sub-clip slicing at 20 fps, length filter [min,200)
    (reference data_loaders/humanml/data/dataset.py:231-404)
  * KIT branch: 251-dim features, min length 24 (reference :255)
  * AMASS: NeMF per-field .pt tensors + mean/std, canonical field order
    (reference data_loaders/amass/data/dataset.py:44-82)
  * HumanAct12 / UESTC pickles (reference data_loaders/a2m/*)
"""

import pickle

import numpy as np
import pytest

from condmdi_tpu.utils.assets import NormStats


def _write_hml_tree(root, clips, abs_3d=False):
    """clips: dict name -> (T, text_lines)."""
    vecs = root / ("new_joint_vecs_abs_3d" if abs_3d else "new_joint_vecs")
    texts = root / "texts"
    vecs.mkdir(parents=True)
    texts.mkdir(exist_ok=True)
    names = []
    for name, (T, lines, dim) in clips.items():
        if T is not None:
            # frame index burned into feature 0 → crops identifiable
            arr = np.zeros((T, dim), np.float32)
            arr[:, 0] = np.arange(T)
            arr[:, 1:] = np.arange(T)[:, None] * 0.001
            np.save(vecs / f"{name}.npy", arr)
        (texts / f"{name}.txt").write_text("\n".join(lines) + "\n")
        names.append(name)
    (root / "train.txt").write_text("\n".join(names + ["ghost_id"]) + "\n")


IDENTITY_263 = NormStats(np.zeros(263, np.float32), np.ones(263, np.float32))
IDENTITY_251 = NormStats(np.zeros(251, np.float32), np.ones(251, np.float32))


class TestHumanML3DTree:
    @pytest.fixture()
    def tree(self, tmp_path):
        root = tmp_path / "HumanML3D"
        _write_hml_tree(root, {
            # base caption only
            "000001": (100, ["a person walks forward#a/DET person/NOUN walks/VERB##"], 263),
            # base + tagged sub-clip [1.0s, 3.5s) = frames 20..70 (50 frames)
            "000002": (120, [
                "whole clip caption#whole/ADJ clip/NOUN#0.0#0.0",
                "sub clip caption#sub/ADJ clip/NOUN#1.0#3.5",
            ], 263),
            # too short: filtered by the [40, 200) length gate
            "000003": (30, ["short#short/ADJ##"], 263),
            # tagged span too short (1.0s..2.0s = 20 frames < 40): dropped,
            # base kept
            "000004": (90, [
                "base#base/NOUN##",
                "tiny segment#tiny/ADJ#1.0#2.0",
            ], 263),
        })
        return root

    @pytest.fixture()
    def ds(self, tree):
        from condmdi_tpu.data.dataset import DatasetConfig, Text2MotionDataset

        cfg = DatasetConfig(data_dir=str(tree), split="train", max_motion_length=196)
        return Text2MotionDataset(cfg, stats=IDENTITY_263)

    def test_entry_inventory(self, ds):
        # 000001 base, 000002 base + 000002 sub, 000004 base = 4 entries;
        # 000003 length-filtered, ghost_id missing npy, tiny segment dropped
        spans = sorted(
            (e["name"], e["span"] or (-1, -1)) for e in ds.entries
        )
        assert spans == [
            ("000001", (-1, -1)), ("000002", (-1, -1)), ("000002", (20, 70)),
            ("000004", (-1, -1)),
        ]

    def test_subclip_slicing_semantics(self, ds):
        sub = next(e for e in ds.entries if e["span"] is not None)
        i = ds.entries.index(sub)
        item = ds[i]
        # identity stats → features carry raw frame ids; every frame must
        # come from the tagged [20, 70) window and stay consecutive
        frames = item["motion"][:, 0]
        assert frames.min() >= 20 and frames.max() < 70
        assert np.array_equal(np.diff(frames), np.ones(len(frames) - 1))
        # crop length: multiple of unit_length, ≤ span length
        assert item["length"] % 4 == 0 and item["length"] in (44, 48)
        assert item["caption"] == "sub clip caption"
        assert item["tokens"] == ["sub/ADJ", "clip/NOUN"]

    def test_base_caption_choice(self, ds):
        base2 = next(e for e in ds.entries if e["name"] == "000002" and e["span"] is None)
        assert [t["caption"] for t in base2["texts"]] == ["whole clip caption"]

    def test_normalization_round_trip(self, tree):
        from condmdi_tpu.data.dataset import DatasetConfig, Text2MotionDataset

        stats = NormStats(
            np.full(263, 0.5, np.float32), np.full(263, 2.0, np.float32)
        )
        cfg = DatasetConfig(data_dir=str(tree), split="train")
        ds = Text2MotionDataset(cfg, stats=stats)
        item = ds[0]
        back = ds.denormalize(item["motion"])
        assert np.allclose(back[:, 0], np.round(back[:, 0]))  # raw frame ids


class TestKitTree:
    def test_kit_min_length_and_dim(self, tmp_path):
        from condmdi_tpu.data.dataset import DatasetConfig, Text2MotionDataset

        root = tmp_path / "KIT-ML"
        _write_hml_tree(root, {
            "kit01": (30, ["a kit clip#a/DET kit/NOUN clip/NOUN##"], 251),
        })
        cfg = DatasetConfig(name="kit", data_dir=str(root), split="train")
        ds = Text2MotionDataset(cfg, stats=IDENTITY_251)
        # 30 frames ≥ KIT min 24 → accepted (the t2m gate of 40 would drop it)
        assert len(ds.entries) == 1
        item = ds[0]
        assert item["motion"].shape[-1] == 251
        assert item["length"] in (24, 28)


class TestAMASSTree:
    FIELD_SHAPES = {
        "trans": (3,), "rotmat": (24, 3, 3), "pos": (24, 3),
        "angular": (24, 3), "contacts": (8,), "height": (24,),
        "root_vel": (3,), "velocity": (24, 3), "global_xform": (24, 6),
        "root_orient": (6,), "rot6d": (24, 6),
    }

    @pytest.fixture()
    def tree(self, tmp_path):
        import torch

        root = tmp_path / "amass" / "generative"
        (root / "train").mkdir(parents=True)
        N, L = 3, 128
        fill = {"pos": 2.0, "trans": 1.0, "rot6d": 3.0}
        mean, std = {}, {}
        for key, shp in self.FIELD_SHAPES.items():
            t = torch.full((N, L) + shp, float(fill.get(key, 0.0)))
            torch.save(t, root / "train" / f"{key}-male-128-30fps.pt")
            mean[key] = torch.zeros((1, L) + shp)
            std[key] = torch.ones((1, L) + shp)
        torch.save(mean, root / "mean-male-128-30fps.pt")
        torch.save(std, root / "std-male-128-30fps.pt")
        return root

    def test_canonical_field_placement(self, tree):
        from condmdi_tpu.data.amass import FIELD_SLICES, AMASSDataset

        ds = AMASSDataset(root_dir=str(tree), split="train")
        assert len(ds) == 3
        m = ds[0]["motion"]
        assert m.shape == (128, 764)
        # layout: fields land at their documented slices regardless of the
        # filesystem glob order ('angular' on disk = FIELD_SLICES 'velocity',
        # disk 'velocity' = 'global_vel')
        assert np.all(m[:, slice(*FIELD_SLICES["trans"])] == 1.0)
        assert np.all(m[:, slice(*FIELD_SLICES["pos"])] == 2.0)
        assert np.all(m[:, slice(*FIELD_SLICES["rot6d"])] == 3.0)
        assert np.all(m[:, slice(*FIELD_SLICES["velocity"])] == 0.0)

    def test_normalization_applied(self, tree):
        import torch

        from condmdi_tpu.data.amass import FIELD_SLICES, AMASSDataset

        mean = torch.load(tree / "mean-male-128-30fps.pt")
        mean["pos"] += 0.5
        torch.save(mean, tree / "mean-male-128-30fps.pt")
        ds = AMASSDataset(root_dir=str(tree), split="train")
        m = ds[0]["motion"]
        assert np.allclose(m[:, slice(*FIELD_SLICES["pos"])], 1.5)


class TestA2MPickles:
    def test_humanact12(self, tmp_path):
        from condmdi_tpu.data.a2m import HumanAct12Dataset

        rng = np.random.default_rng(0)
        poses = [rng.normal(size=(80, 72)).astype(np.float32) * 0.1,
                 rng.normal(size=(40, 72)).astype(np.float32) * 0.1]
        blob = dict(poses=poses, y=[3, 7],
                    joints3D=[rng.normal(size=(80, 24, 3)), rng.normal(size=(40, 24, 3))])
        d = tmp_path / "HumanAct12Poses"
        d.mkdir()
        with open(d / "humanact12poses.pkl", "wb") as fh:
            pickle.dump(blob, fh)
        ds = HumanAct12Dataset(datapath=str(d))
        assert len(ds) == 2
        it = ds[0]
        assert it["motion"].shape == (60, 150)  # 25 joints × rot6d
        assert it["action"] == 3 and it["length"] == 60
        it1 = ds[1]  # 40 < 60 → padded, length = true frames
        assert it1["length"] == 40 and it1["action"] == 7
        assert np.isfinite(it1["motion"]).all()

    def test_uestc(self, tmp_path):
        from condmdi_tpu.data.a2m import UESTCDataset

        rng = np.random.default_rng(1)
        root = tmp_path / "uestc"
        (root / "info").mkdir(parents=True)
        (root / "info" / "action_classes.txt").write_text(
            "\n".join(f"action_{i}" for i in range(40)) + "\n"
        )
        (root / "info" / "train.txt").write_text("0\n2\n")
        cache = dict(
            rotations=[rng.normal(size=(70, 72)).astype(np.float32) * 0.1
                       for _ in range(3)],
            y=[5, 1, 9],
        )
        with open(root / "vibe_cache_refined.pkl", "wb") as fh:
            pickle.dump(cache, fh)
        ds = UESTCDataset(datapath=str(root), split="train")
        assert len(ds) == 2  # only indices 0, 2 from train.txt
        it = ds[1]
        assert it["action"] == 9  # cache index 2
        assert it["caption"] == "action_9"
        assert it["motion"].shape == (60, 150)
