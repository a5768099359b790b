"""GMD guidance-mode presets: parity vs reference utils/generation_template.py
+ generate_gmd CLI smoke tests for every mode."""

import numpy as np
import pytest

from condmdi_tpu.sampling.templates import TEMPLATE_NAMES, get_template
from condmdi_tpu.utils.config import GMDGenerateArgs

# every field any template touches
TEMPLATE_FIELDS = (
    "motion_length", "abs_3d", "gen_two_stages", "do_inpaint",
    "guidance_mode", "p2p_impute", "use_ddim", "interpolate_cond",
)


class _RefArgs:
    """Mutable stand-in for the reference's FullModelArgs."""

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


class TestTemplateParity:
    @pytest.mark.parametrize("name", TEMPLATE_NAMES)
    def test_matches_reference(self, name, reference_path):
        from utils.generation_template import get_template as ref_get_template

        base = dict(
            motion_length=11.2, abs_3d=True, gen_two_stages=False,
            do_inpaint=False, guidance_mode=name, p2p_impute=True,
            use_ddim=True, interpolate_cond=True,
        )
        ref = ref_get_template(_RefArgs(**base), template_name=name)
        ours = get_template(GMDGenerateArgs(**base), template_name=name)
        for f in TEMPLATE_FIELDS:
            assert getattr(ours, f) == getattr(ref, f), (name, f)

    def test_unknown_template_raises(self):
        with pytest.raises(NotImplementedError):
            get_template(GMDGenerateArgs(), "bogus")

    def test_pure(self):
        a = GMDGenerateArgs(guidance_mode="kps")
        b = get_template(a, "kps")
        assert a.gen_two_stages is False and b.gen_two_stages is True


def _gmd_cli(tmp_path, mode, extra=()):
    from condmdi_tpu.sampling.generate_gmd import main

    out = main([
        "--guidance_mode", mode,
        "--diffusion_steps", "8",
        "--num_frames", "28",
        "--motion_length", "1.4",
        "--latent_dim", "32",
        "--ff_size", "64",
        "--layers", "2",
        "--arch", "unet",
        "--dim_mults", "1", "2",
        "--num_samples", "2",
        "--num_repetitions", "1",
        "--guidance_param", "1.0",
        "--classifier_scale", "10.0",
        "--abs_3d", "true",
        "--output_dir", str(tmp_path / "out"),
        *extra,
    ])
    return np.load(out / "results.npy", allow_pickle=True).item()


class TestGenerateGmdCLI:
    def test_mode_no(self, tmp_path):
        res = _gmd_cli(tmp_path, "no")
        assert res["motion"].shape == (2, 28, 263)
        assert np.isfinite(res["motion"]).all()
        assert res["guidance_mode"] == "no"

    @pytest.mark.slow
    def test_mode_trajectory_guided_and_inpainted(self, tmp_path):
        res = _gmd_cli(tmp_path, "trajectory")
        assert res["motion"].shape == (2, 28, 263)
        assert np.isfinite(res["motion"]).all()
        assert res["joints"].shape == (2, 28, 22, 3)
        # do_inpaint + stop_imputation_at=0: the p2p trajectory is imputed
        # into the (normalized) root xz channels through the final step
        from condmdi_tpu.sampling.gmd import (
            get_kframes,
            interpolate_kframes_trajectory,
        )
        from condmdi_tpu.utils.assets import load_norm_stats

        stats = load_norm_stats("abs3d")
        traj = interpolate_kframes_trajectory(get_kframes("square"), 28)
        expect = (traj - stats.mean[1:3]) / stats.std[1:3]
        np.testing.assert_allclose(res["motion"][0, :, 1:3], expect, atol=1e-4)

    @pytest.mark.slow
    def test_mode_kps_two_stage(self, tmp_path):
        res = _gmd_cli(tmp_path, "kps")
        assert res["motion"].shape == (2, 28, 263)
        assert np.isfinite(res["motion"]).all()
        assert res["pattern"] == "zigzag"

    @pytest.mark.slow
    def test_mode_sdf_two_stage_with_obstacles(self, tmp_path):
        res = _gmd_cli(tmp_path, "sdf")
        assert np.isfinite(res["motion"]).all()
        assert len(res["obstacles"]) == 2

    def test_mode_mdm_legacy(self, tmp_path):
        res = _gmd_cli(tmp_path, "mdm_legacy", extra=["--arch", "trans_enc"])
        # template forces rel-root 6 s cut: 28 frames still the min() winner
        assert res["motion"].shape == (2, 28, 263)
        assert np.isfinite(res["motion"]).all()

    def test_kframe_pattern_interpolation(self):
        from condmdi_tpu.sampling.gmd import get_kframes

        dense = get_kframes("zigzag", interpolate=True)
        assert len(dense) == 120  # frames 0..119
        sparse = dict(get_kframes("zigzag"))
        for f, (x, z) in sparse.items():
            np.testing.assert_allclose(dict(dense)[f], (x, z), atol=1e-5)


class TestReplaceArgsOverrideBookkeeping:
    """replace_args must keep + extend _cli_overridden so template-set and
    CLI-set flags survive the checkpoint args.json merge (a plain
    dataclasses.replace drops the non-field marker entirely)."""

    def test_cli_and_template_overrides_survive(self):
        from condmdi_tpu.sampling.templates import get_template
        from condmdi_tpu.utils.config import GMDGenerateArgs, parse_args, replace_args

        args = parse_args(GMDGenerateArgs, ["--diffusion_steps", "8"])
        assert "diffusion_steps" in args._cli_overridden
        out = get_template(args, "kps")
        assert "diffusion_steps" in out._cli_overridden  # CLI flag kept
        assert "gen_two_stages" in out._cli_overridden   # template flag added

        out2 = replace_args(out, arch="unet")
        assert {"diffusion_steps", "gen_two_stages", "arch"} <= set(out2._cli_overridden)

    def test_json_merge_respects_template_fields(self, tmp_path):
        import json

        from condmdi_tpu.sampling.templates import get_template
        from condmdi_tpu.utils.config import (
            GMDGenerateArgs, load_args_from_model, parse_args, save_args_json,
        )

        # a checkpoint card that disagrees with the template on use_ddim
        card = parse_args(GMDGenerateArgs, ["--use_ddim", "true"])
        save_args_json(card, tmp_path / "args.json")
        (tmp_path / "ckpt_000000001").mkdir()

        args = parse_args(GMDGenerateArgs, [])
        args = get_template(args, "testing")  # sets use_ddim=False
        merged = load_args_from_model(
            args, tmp_path / "ckpt_000000001",
            cli_overridden=getattr(args, "_cli_overridden", ()),
        )
        assert merged.use_ddim is False  # template wins over args.json
