"""Data layer tests: synthetic dataset, collation, loader sharding."""

import numpy as np
import pytest

from condmdi_tpu.data import (
    DataLoader,
    DatasetConfig,
    SyntheticMotionDataset,
    collate,
    get_dataset_loader,
)
from condmdi_tpu.models.text import HashTextEncoder


class TestSyntheticDataset:
    @pytest.mark.slow
    def test_shapes_and_normalization(self):
        cfg = DatasetConfig(max_motion_length=64, abs_3d=True)
        ds = SyntheticMotionDataset(cfg, size=8, seed=0)
        s = ds[0]
        assert s["motion"].shape[-1] == 263
        assert s["length"] % cfg.unit_length == 0
        # normalized data roughly zero-mean unit-var
        cat = np.concatenate([ds[i]["motion"] for i in range(8)], axis=0)
        assert abs(cat.mean()) < 0.5
        rec = ds.denormalize(ds.normalize(np.zeros((4, 263), np.float32)))
        np.testing.assert_allclose(rec, 0.0, atol=1e-4)

    def test_traject_only(self):
        cfg = DatasetConfig(max_motion_length=64, traject_only=True)
        ds = SyntheticMotionDataset(cfg, size=4)
        assert ds[0]["motion"].shape[-1] == 4


class TestCollate:
    def test_padding_and_masks(self):
        samples = [
            dict(motion=np.ones((30, 263), np.float32), length=30, caption="a", tokens=[]),
            dict(motion=np.ones((50, 263), np.float32), length=50, caption="b", tokens=[]),
        ]
        batch = collate(samples, 64, text_encoder=HashTextEncoder())
        assert batch["motion"].shape == (2, 64, 263)
        assert batch["time_mask"].sum() == 80
        assert (batch["motion"][0, 30:] == 0).all()
        assert batch["text_embed"].shape == (2, 512)
        np.testing.assert_array_equal(batch["lengths"], [30, 50])


class TestLoader:
    def test_epoch_iteration(self):
        cfg = DatasetConfig(max_motion_length=32)
        ds = SyntheticMotionDataset(cfg, size=16)
        dl = DataLoader(ds, batch_size=4, max_motion_length=32, seed=1)
        batches = list(dl)
        assert len(batches) == 4
        assert all(b["motion"].shape == (4, 32, 263) for b in batches)

    def test_process_sharding_partitions_data(self):
        cfg = DatasetConfig(max_motion_length=32)
        ds = SyntheticMotionDataset(cfg, size=16)
        seen = []
        for pi in range(2):
            dl = DataLoader(
                ds, batch_size=4, max_motion_length=32, seed=3,
                process_index=pi, process_count=2, shuffle=True,
            )
            for b in dl:
                seen.append(b["motion"])
        # two hosts × 2 batches of 4 = all 16 samples, no duplicates
        allm = np.concatenate(seen, axis=0)
        assert allm.shape[0] == 16
        uniq = {allm[i].tobytes() for i in range(16)}
        assert len(uniq) == 16

    @pytest.mark.slow
    def test_factory_falls_back_to_synthetic(self):
        cfg = DatasetConfig(max_motion_length=32, data_dir="/nonexistent")
        dl = get_dataset_loader(cfg, batch_size=4)
        b = next(iter(dl))
        assert b["motion"].shape == (4, 32, 263)

    def test_factory_honors_synthetic_size(self, monkeypatch):
        # explicit cfg.synthetic_size beats the env var beats the heuristic —
        # the round-4 retrain regression: an env-only size is NOT recorded in
        # args.json, so retrain-from-card trained on 256 clips instead of the
        # lost run's 4096 and memorization beat keyframe conditioning
        cfg = DatasetConfig(
            max_motion_length=32, data_dir="/nonexistent", synthetic_size=24
        )
        monkeypatch.setenv("CONDMDI_SYNTHETIC_SIZE", "40")
        assert len(get_dataset_loader(cfg, batch_size=4).dataset) == 24
        cfg.synthetic_size = 0
        assert len(get_dataset_loader(cfg, batch_size=4).dataset) == 40
        monkeypatch.delenv("CONDMDI_SYNTHETIC_SIZE")
        # no-config fallback floors at 64 (anti-memorization: tiny synthetic
        # sets let the hash text embedding identify each clip, and
        # memorization beats keyframe copy-through — the round-4 failure mode)
        assert len(get_dataset_loader(cfg, batch_size=4).dataset) == 64


class TestPrefetch:
    def test_prefetch_preserves_order_and_errors(self):
        from condmdi_tpu.data.dataset import PrefetchIterator

        items = list(PrefetchIterator(iter(range(10)), depth=3))
        assert items == list(range(10))

        def boom():
            yield 1
            raise ValueError("x")

        it = PrefetchIterator(boom())
        assert next(it) == 1
        import pytest as _p
        with _p.raises(ValueError):
            list(it)


class TestSynthDiskCache:
    def test_cache_round_trip_identical(self, tmp_path, monkeypatch):
        """Training-scale synthetic sets are disk-cached; a cache hit must
        reproduce features AND caption-driving props bit-identically."""
        import condmdi_tpu.data.dataset as dm

        monkeypatch.setenv("CONDMDI_SYNTH_CACHE", str(tmp_path))
        cfg = dm.DatasetConfig(max_motion_length=32, abs_3d=True, split="train")
        T = min(cfg.max_motion_length + 1, 200)
        f1, p1 = dm.SyntheticMotionDataset._make_items(
            cfg, seed=3, size=512, T=T, return_props=True
        )
        assert any(tmp_path.iterdir()), "cache file not written"
        f2, p2 = dm.SyntheticMotionDataset._make_items(
            cfg, seed=3, size=512, T=T, return_props=True
        )
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(p1[7]["drift"], p2[7]["drift"])
        assert p1[7]["scale"] == p2[7]["scale"]

    def test_small_sets_not_cached(self, tmp_path, monkeypatch):
        import condmdi_tpu.data.dataset as dm

        monkeypatch.setenv("CONDMDI_SYNTH_CACHE", str(tmp_path))
        cfg = dm.DatasetConfig(max_motion_length=32, abs_3d=True, split="test")
        dm.SyntheticMotionDataset(cfg, size=8, seed=2)
        assert not any(tmp_path.iterdir())
