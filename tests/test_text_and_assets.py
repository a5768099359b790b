"""Text-encoder resolution (make_text_encoder) + asset bootstrap CLI.

Mirrors reference behavior: text conditioning comes from frozen CLIP
(model/mdm.py:214-231); assets come from prepare/*.sh. Here both are
explicit: --text_encoder auto|clip|cached|hash and
`python -m condmdi_tpu.utils.assets --check/--fetch`.
"""

import warnings

import numpy as np
import pytest

from condmdi_tpu.models.text import (
    CachedTextEncoder,
    HashTextEncoder,
    encoder_name,
    make_text_encoder,
)
from condmdi_tpu.utils.assets import ASSETS, check_assets, fetch_assets


def _write_npz(path, captions, dim=512):
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((len(captions), dim)).astype(np.float32)
    np.savez(path, captions=np.array(captions, dtype=object), embeddings=emb)
    return emb


class TestMakeTextEncoder:
    def test_hash_explicit_no_warning(self):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            enc = make_text_encoder(mode="hash")
        assert isinstance(enc, HashTextEncoder)
        assert encoder_name(enc) == "hash"

    def test_auto_without_assets_warns_and_falls_back(self, monkeypatch):
        monkeypatch.delenv("CONDMDI_CLIP_CKPT", raising=False)
        monkeypatch.chdir("/tmp")  # no save/clip/ViT-B-32.pt here
        with pytest.warns(UserWarning, match="HashTextEncoder"):
            enc = make_text_encoder(mode="auto")
        assert isinstance(enc, HashTextEncoder)

    def test_auto_with_npz_returns_cached(self, tmp_path):
        p = tmp_path / "emb.npz"
        emb = _write_npz(p, ["a person walks"])
        enc = make_text_encoder(mode="auto", embeddings_path=str(p))
        assert isinstance(enc, CachedTextEncoder)
        np.testing.assert_allclose(enc.encode(["a person walks"])[0], emb[0])

    def test_cached_requires_path(self):
        with pytest.raises(ValueError, match="text_embeddings"):
            make_text_encoder(mode="cached")

    def test_clip_requires_checkpoint(self, monkeypatch):
        monkeypatch.delenv("CONDMDI_CLIP_CKPT", raising=False)
        monkeypatch.chdir("/tmp")
        with pytest.raises(ValueError, match="CLIP"):
            make_text_encoder(mode="clip")

    def test_unknown_mode_rejected(self):
        with pytest.raises(ValueError, match="unknown"):
            make_text_encoder(mode="glove")

    def test_cached_missing_caption_warns(self, tmp_path):
        p = tmp_path / "emb.npz"
        _write_npz(p, ["known caption"])
        enc = CachedTextEncoder.from_npz(str(p))
        with pytest.warns(UserWarning, match="not in"):
            out = enc.encode(["known caption", "unknown caption"])
        assert out.shape == (2, 512)

    def test_args_plumbing(self, tmp_path):
        """The CLI dataclass fields drive resolution."""
        from condmdi_tpu.utils.config import GenerateArgs

        p = tmp_path / "emb.npz"
        _write_npz(p, ["x"])
        args = GenerateArgs(text_encoder="auto", text_embeddings=str(p))
        enc = make_text_encoder(args)
        assert isinstance(enc, CachedTextEncoder)

        args = GenerateArgs(text_encoder="hash")
        assert isinstance(make_text_encoder(args), HashTextEncoder)


class TestNormStatsFallbackWarns:
    def test_identity_fallback_is_loud(self, monkeypatch, tmp_path):
        from condmdi_tpu.utils import assets as assets_mod

        monkeypatch.setattr(assets_mod, "_CANDIDATES", (str(tmp_path / "nope"),))
        with pytest.warns(UserWarning, match="IDENTITY"):
            st = assets_mod.load_norm_stats("abs3d")
        np.testing.assert_array_equal(st.mean, 0)
        np.testing.assert_array_equal(st.std, 1)


class TestAssetBootstrap:
    def test_manifest_covers_reference_prepare_scripts(self):
        names = {a.name for a in ASSETS}
        # one group per reference prepare/*.sh download family + clip + data
        assert {"glove", "smpl", "t2m_evaluators", "a2m_recognition",
                "a2m_datasets", "clip", "humanml3d"} <= names

    def test_check_reports_missing_in_empty_root(self, tmp_path):
        status = check_assets(tmp_path)
        assert all(not v["present"] for v in status.values())
        assert status["glove"]["missing"]

    def test_check_detects_present(self, tmp_path):
        target = tmp_path / "save/clip/ViT-B-32.pt"
        target.parent.mkdir(parents=True)
        target.write_bytes(b"x")
        status = check_assets(tmp_path)
        assert status["clip"]["present"]

    def test_fetch_dry_run_runs_nothing(self, tmp_path, capsys):
        ok = fetch_assets(["clip"], root=tmp_path, dry_run=True)
        out = capsys.readouterr().out
        assert "wget" in out
        assert not (tmp_path / "save/clip/ViT-B-32.pt").exists()
        assert ok  # dry run counts as success

    def test_fetch_skips_present(self, tmp_path, capsys):
        target = tmp_path / "save/clip/ViT-B-32.pt"
        target.parent.mkdir(parents=True)
        target.write_bytes(b"x")
        assert fetch_assets(["clip"], root=tmp_path)
        assert "already present" in capsys.readouterr().out

    def test_manual_asset_reports_instructions(self, tmp_path, capsys):
        ok = fetch_assets(["humanml3d"], root=tmp_path)
        assert not ok
        assert "MANUAL" in capsys.readouterr().out

    def test_cli_check_and_bad_group(self, tmp_path, capsys):
        from condmdi_tpu.utils.assets import _main

        assert _main(["--check", "--root", str(tmp_path)]) == 0
        assert "MISSING" in capsys.readouterr().out
        with pytest.raises(SystemExit):
            _main(["--fetch", "bogus", "--root", str(tmp_path)])


class TestArtifactSelfDescription:
    @pytest.mark.slow
    def test_synthesize_results_tag(self, tmp_path):
        from condmdi_tpu.sampling.synthesize import main

        out = main([
            "--text_prompt", "a person walks", "--diffusion_steps", "4",
            "--num_frames", "28", "--motion_length", "1.4",
            "--latent_dim", "16", "--ff_size", "32", "--layers", "1",
            "--num_samples", "1", "--num_repetitions", "1",
            "--abs_3d", "true", "--text_encoder", "hash",
            "--output_dir", str(tmp_path / "out"),
        ])
        blob = np.load(out / "results.npy", allow_pickle=True).item()
        assert blob["text_encoder"] == "hash"
