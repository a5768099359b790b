"""Configuration system: dataclass option groups → cards → CLI → args.json.

Mirrors the reference's three-tier design (SURVEY §5 config/flag system):
  1. option-group dataclasses (reference utils/parser_util.py:10-470)
  2. "cards" — preset subclasses overriding defaults (reference configs/)
  3. CLI override via an auto-generated argparse (reference vendored
     HfArgumentParser; here a ~60-line equivalent)
plus the args.json round-trip: training dumps args.json next to checkpoints
(train_condmdi.py:50-52) and every sampler/eval reloads model/data/diffusion
options from it, CLI flags overriding (parse_and_load_from_model,
parser_util.py:566-603).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, fields
from pathlib import Path
from typing import Optional, Tuple, get_args, get_origin

# --------------------------------------------------------------------------- #
# Option groups
# --------------------------------------------------------------------------- #
@dataclass
class BaseOptions:
    seed: int = 10


@dataclass
class DiffusionOptions:
    noise_schedule: str = "cosine"
    diffusion_steps: int = 1000
    sigma_small: bool = True
    predict_xstart: bool = True
    use_ddim: bool = False
    clip_range: float = 6.0
    timestep_respacing: str = ""  # e.g. 'ddim100'


@dataclass
class ModelOptions:
    arch: str = "trans_enc"  # trans_enc | trans_dec | gru | unet | dit*
    emb_trans_dec: bool = False
    layers: int = 8
    latent_dim: int = 512
    ff_size: int = 1024
    num_heads: int = 4
    dim_mults: Tuple[float, ...] = (2, 2, 2, 2)
    unet_adagn: bool = True
    unet_zero: bool = True
    unet_attention: bool = False
    # UNet frame padding (must be divisible by 2^(levels-1)). The reference
    # hardcodes 224 (its data loader pads all HumanML3D clips to 224); keep
    # 224 for converted reference checkpoints. For self-trained models 200
    # is the tight choice for 196-frame data: same samples, ~11% fewer FLOPs.
    unet_pad_to: int = 224
    out_mult: int = 1
    cond_mask_prob: float = 0.1
    keyframe_mask_prob: float = 0.1
    lambda_rcxyz: float = 0.0
    lambda_vel: float = 0.0
    lambda_fc: float = 0.0
    unconstrained: bool = False
    keyframe_conditioned: bool = False
    keyframe_selection_scheme: str = "random_frames"
    zero_keyframe_loss: bool = False
    # TPU-build extra: 'int8' switches QConv/QDense to the quantized serving
    # path (~1.5x on the UNet; same checkpoint). No reference equivalent.
    precision_mode: str = "float"  # float | int8
    # Mixed-step serving (int8/int8_static only): run the LAST K sampler
    # steps — model timestep t < K, where the reverse process settles the
    # fine detail the keyframe metrics score — through the float path, the
    # rest int8. Per-step int8 noise compounding into late-step conditioning
    # damage is what failed the round-4 protocol promotion gate; this keeps
    # most of the int8 speedup (1000-K of 1000 steps) while restoring the
    # quality-critical tail. 0 = pure precision_mode path.
    int8_float_last_k: int = 0


@dataclass
class DataOptions:
    dataset: str = "humanml"
    data_dir: str = ""
    abs_3d: bool = False
    traj_only: bool = False
    xz_only: bool = False
    use_random_proj: bool = False
    random_proj_scale: float = 10.0
    augment_type: str = "none"
    std_scale_shift: Tuple[float, float] = (1.0, 0.0)
    drop_redundant: bool = False
    num_frames: int = 196
    # synthetic-fallback training-set size (items). 0 = legacy heuristic
    # (env $CONDMDI_SYNTHETIC_SIZE, else batch_size*4). Non-zero values are
    # recorded in args.json so retrain_from_args reproduces the run's data:
    # the round-4 retrain silently fell back from the lost run's 4096-item
    # set to 256 items — small enough that text-memorization beat keyframe
    # conditioning (lower loss, keyframe error WORSE than the zero baseline).
    synthetic_size: int = 0


@dataclass
class TrainingOptions:
    save_dir: Optional[str] = None
    overwrite: bool = False
    batch_size: int = 64
    lr: float = 1e-4
    weight_decay: float = 0.0
    grad_clip: float = 0.0
    use_fp16: bool = False  # (legacy name; TPU build trains bf16 when set)
    avg_model_beta: float = 0.0
    adam_beta2: float = 0.999
    lr_anneal_steps: int = 0
    eval_batch_size: int = 32
    eval_split: str = "test"
    eval_during_training: bool = False
    eval_rep_times: int = 3
    eval_num_samples: int = 1000
    log_interval: int = 1000
    save_interval: int = 100_000
    num_steps: int = 1_200_000
    resume_checkpoint: str = ""
    # 'auto' caches the collated dataset in device HBM when it is small
    # (<1 GiB) and gathers batches on-device — per-step host→device traffic
    # drops from the full batch (~13 MB) to a [B] index vector. HumanML3D's
    # 263-d features fit comfortably; 'false' streams from the host loader.
    # 'auto' refuses datasets whose items re-sample randomness per access
    # (crops/captions/augmentations) — force with 'true', which re-collates
    # the cached shard every device_cache_refresh steps.
    device_data_cache: str = "auto"  # auto | true | false
    device_cache_refresh: int = 1000  # steps between cache re-collations (0 = never)
    # >1: chain K train steps per host dispatch (one lax.scan over the step,
    # batches gathered on-device from the HBM cache) — essential when the
    # per-dispatch link latency exceeds the step's compute (small models
    # through the remote-TPU relay). Requires device_data_cache.
    steps_per_dispatch: int = 1
    apply_zero_mask: bool = False
    traj_extra_weight: float = 1.0
    time_weighted_loss: bool = False
    train_x0_as_eps: bool = False
    schedule_sampler: str = "uniform"
    # TPU-build extra: rematerialize the denoiser in backward (memory headroom
    # for batch >256; ~1 extra forward of FLOPs). No reference equivalent.
    remat: bool = False


@dataclass
class TextOptions:
    """Text-conditioning source (reference: frozen CLIP, mdm.py:214-231).

    'auto' resolves cached npz → CLIP checkpoint → HashTextEncoder (loud
    warning); see models/text.make_text_encoder.
    """

    text_encoder: str = "auto"  # auto | clip | cached | hash
    text_embeddings: str = ""  # npz from scripts/export_text_embeddings.py
    clip_checkpoint: str = ""  # CLIP ViT-B/32 .pt for the JAX CLIP tower


@dataclass
class SamplingOptions:
    model_path: str = ""
    output_dir: str = ""
    num_samples: int = 10
    num_repetitions: int = 3
    guidance_param: float = 2.5
    keyframe_guidance_param: float = 1.0
    # EMA weights are the eval weights (reference model_util load_model);
    # false loads raw params (short runs whose EMA horizon > trained steps)
    use_ema: bool = True


@dataclass
class GenerateOptions:
    motion_length: float = 11.2
    motion_length_cut: float = 6.0
    input_text: str = ""
    action_file: str = ""
    text_prompt: str = ""
    action_name: str = ""
    use_fixed_dataset: bool = False


EDIT_MODES = (
    "lower_body", "benchmark_sparse", "benchmark_clip", "pelvis",
    "right_wrist", "random_frames", "random_joints", "random",
    "gmd_keyframes", "uncond", "pelvis_vr", "pelvis_feet",
)


@dataclass
class CondSyntOptions:
    edit_mode: str = "benchmark_sparse"
    transition_length: int = 30
    n_keyframes: int = 5
    editable_features: str = "pos_rot_vel"
    text_condition: str = ""
    imputate: bool = False
    replacement_distribution: str = "conditional"
    reconstruction_guidance: bool = False
    reconstruction_weight: float = 5.0
    gradient_schedule: Optional[str] = None
    cutoff_point: int = 0
    stop_imputation_at: int = 0
    stop_recguidance_at: int = 0
    use_fixed_dataset: bool = False
    use_fixed_subset: bool = False
    no_text: bool = False


@dataclass
class GMDOptions:
    guidance_mode: str = "no"
    classifier_scale: float = 100.0
    do_inpaint: bool = False
    gen_reward_model: bool = False
    gen_two_stages: bool = False
    gen_mse_loss: bool = True
    p2p_impute: bool = True
    interactive: bool = False
    interpolate_cond: bool = False
    # stop trajectory imputation this many (respaced) steps before the end
    # (reference generate.py motion_impute_until; 0 = impute through t=0)
    stop_imputation_at: int = 0
    # stage-1 trajectory model for the two-stage (kps/sdf) modes; empty =
    # random init (smoke only, recorded in the results metadata)
    traj_model_path: str = ""
    # hand-authored keyframe pattern (sampling/gmd.KFRAME_PATTERNS); empty =
    # the reference's per-mode default (zigzag for kps, sdf_obstacle for sdf)
    kframe_pattern: str = ""


@dataclass
class EvaluationOptions:
    model_path: str = ""
    eval_mode: str = "wo_mm"
    guidance_param: float = 2.5
    impute_until: Optional[int] = None
    skip_first: Optional[int] = None
    # GMD two-stage protocol (evals.run_condition): the stage-1 trajectory
    # model checkpoint; empty = random init (smoke/protocol testing only)
    traj_model_path: str = ""
    classifier_scale: float = 100.0
    # cap the eval-mode's replication count (0 = use the mode's own count).
    # Lets a repro test re-derive replication 0 of a committed 20-rep report
    # without paying for all 20 (same seeds → same values).
    max_replications: int = 0
    # evals.run guard (round-3 post-mortem): the CondMDI keyframe protocol
    # silently evaluated a model trained WITHOUT keyframe conditioning — the
    # obs_x0/obs_mask kwargs are ignored by such a model, so every keyframe
    # metric was measuring an unconditioned sampler. The protocol now refuses
    # unless this is set (legitimate only for ablation baselines, and the
    # report meta records it).
    allow_unconditioned: bool = False
    # ablation run: zero the observation mask fed to the model (metrics are
    # still computed on the edit-mode keyframes) — quantifies how much the
    # conditioning pathway is causally used
    drop_observations: bool = False


# --------------------------------------------------------------------------- #
# Composite args
# --------------------------------------------------------------------------- #
@dataclass
class TrainArgs(
    BaseOptions, DataOptions, ModelOptions, DiffusionOptions, TextOptions,
    TrainingOptions,
):
    pass


@dataclass
class GenerateArgs(
    BaseOptions, DataOptions, ModelOptions, DiffusionOptions, TextOptions,
    SamplingOptions, GenerateOptions,
):
    pass


@dataclass
class CondSyntArgs(
    BaseOptions, DataOptions, ModelOptions, DiffusionOptions, TextOptions,
    SamplingOptions, GenerateOptions, CondSyntOptions,
):
    pass


@dataclass
class GMDGenerateArgs(
    BaseOptions, DataOptions, ModelOptions, DiffusionOptions, TextOptions,
    SamplingOptions, GenerateOptions, GMDOptions,
):
    """Args for the GMD guided-generation CLI (reference sample/gmd/generate.py)."""


@dataclass
class EvalArgs(
    BaseOptions, DataOptions, ModelOptions, DiffusionOptions, TextOptions,
    SamplingOptions, GenerateOptions, CondSyntOptions, EvaluationOptions,
):
    pass


# --------------------------------------------------------------------------- #
# Cards (presets) — reference configs/model.py + configs/card.py
# --------------------------------------------------------------------------- #
@dataclass
class motion_mdm(TrainArgs):
    arch: str = "trans_enc"
    latent_dim: int = 512
    ff_size: int = 1024
    num_frames: int = 196
    predict_xstart: bool = True
    grad_clip: float = 1.0
    avg_model_beta: float = 0.9999
    weight_decay: float = 0.0


@dataclass
class motion_unet_adagn_xl(TrainArgs):
    arch: str = "unet"
    latent_dim: int = 512
    dim_mults: Tuple[float, ...] = (2, 2, 2, 2)
    unet_adagn: bool = True
    unet_zero: bool = True
    num_frames: int = 224
    predict_xstart: bool = True
    grad_clip: float = 1.0
    avg_model_beta: float = 0.9999
    weight_decay: float = 0.01
    use_fp16: bool = True


@dataclass
class motion_abs_unet_adagn_xl(motion_unet_adagn_xl):
    """THE default CondMDI base config (reference card.py:72,
    train_condmdi.py:40): abs-root HumanML3D + UNet-XL AdaGN."""

    abs_3d: bool = True
    save_dir: Optional[str] = "save/motion_abs_unet_adagn_xl"


@dataclass
class motion_abs_mdm(motion_mdm):
    abs_3d: bool = True
    save_dir: Optional[str] = "save/motion_abs_mdm"


@dataclass
class traj_unet_adagn_swx(TrainArgs):
    arch: str = "unet"
    latent_dim: int = 512
    dim_mults: Tuple[float, ...] = (0.125, 0.25, 0.5)
    unet_adagn: bool = True
    unet_zero: bool = True
    num_frames: int = 224
    predict_xstart: bool = False
    traj_only: bool = True
    abs_3d: bool = True
    grad_clip: float = 1.0
    avg_model_beta: float = 0.9999
    weight_decay: float = 0.01
    batch_size: int = 64
    save_interval: int = 12_500
    num_steps: int = 100_000


CARDS = {
    "motion_mdm": motion_mdm,
    "motion_abs_mdm": motion_abs_mdm,
    "motion_unet_adagn_xl": motion_unet_adagn_xl,
    "motion_abs_unet_adagn_xl": motion_abs_unet_adagn_xl,
    "traj_unet_adagn_swx": traj_unet_adagn_swx,
}


# --------------------------------------------------------------------------- #
# dataclass → argparse bridge + args.json round trip
# --------------------------------------------------------------------------- #
def _resolve_types(cls) -> dict:
    import typing

    try:
        return typing.get_type_hints(cls)
    except Exception:
        return {f.name: f.type for f in fields(cls)}


def _add_field_to_parser(parser: argparse.ArgumentParser, name: str, ftype):
    flag = "--" + name
    origin = get_origin(ftype)
    if ftype is bool:
        def _parse_bool(s: str, _flag=flag):
            v = s.lower()
            if v in ("1", "true", "yes"):
                return True
            if v in ("0", "false", "no"):
                return False
            raise argparse.ArgumentTypeError(
                f"{_flag} expects true/false, got {s!r}"
            )

        parser.add_argument(flag, type=_parse_bool, default=None)
    elif origin is tuple:
        parser.add_argument(flag, type=float, nargs="+", default=None)
    elif ftype is int:
        parser.add_argument(flag, type=int, default=None)
    elif ftype is float:
        parser.add_argument(flag, type=float, default=None)
    elif origin is not None and type(None) in get_args(ftype):
        # Optional[T]
        inner = [a for a in get_args(ftype) if a is not type(None)][0]
        parser.add_argument(flag, type=inner if inner in (int, float) else str,
                            default=None)
    else:
        parser.add_argument(flag, type=str, default=None)


def parse_args(cls, argv=None, base_card: Optional[str] = None):
    """Instantiate `cls` (or a card) and override from CLI argv."""
    hints = _resolve_types(cls)
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=base_card)
    for f in fields(cls):
        _add_field_to_parser(parser, f.name, hints.get(f.name, str))
    ns, _unknown = parser.parse_known_args(argv)

    if ns.config and ns.config != base_card and ns.config not in CARDS:
        parser.error(
            f"unknown --config {ns.config!r}; choose from: {', '.join(sorted(CARDS))}"
        )
    card_cls = CARDS.get(ns.config, cls) if ns.config else cls
    args = card_cls() if issubclass(card_cls, cls) else cls()
    overridden = set()
    for f in fields(cls):
        v = getattr(ns, f.name, None)
        if v is not None:
            if get_origin(hints.get(f.name)) is tuple:
                v = tuple(v)
            setattr(args, f.name, v)
            overridden.add(f.name)
    # names the user set on the CLI — load_args_from_model must not clobber
    # them (reference parser_util.py:579 get_args_per_group_name logic)
    args._cli_overridden = overridden
    return args


def replace_args(args, **changes):
    """`dataclasses.replace` that keeps override bookkeeping intact.

    `parse_args` records CLI-set names in the NON-FIELD attribute
    `_cli_overridden`, which `dataclasses.replace` silently drops — any
    later `load_args_from_model` would then clobber the user's explicit
    flags with the checkpoint's args.json. Programmatic replacements
    (guidance templates, two-stage traj-model loads) are deliberate
    overrides too, so the replaced names are ADDED to the marker.
    """
    new = dataclasses.replace(args, **changes)
    new._cli_overridden = set(
        getattr(args, "_cli_overridden", ()) or ()
    ) | set(changes)
    return new


def save_args_json(args, path: str | Path):
    d = dataclasses.asdict(args)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as fh:
        json.dump(d, fh, indent=2, default=str)


# options whose values must come from the trained model's args.json
MODEL_ARGS_GROUPS = (DataOptions, ModelOptions, DiffusionOptions)


def load_args_from_model(args, model_path: str | Path, cli_overridden=()):
    """parse_and_load_from_model equivalent (parser_util.py:566-603):
    overwrite model/data/diffusion options from the args.json stored next to
    the checkpoint, keeping CLI-overridden names intact."""
    args_path = Path(model_path).parent / "args.json"
    if not args_path.exists():
        raise FileNotFoundError(f"args.json not found at {args_path}")
    with open(args_path) as fh:
        model_args = json.load(fh)
    names = set()
    for grp in MODEL_ARGS_GROUPS:
        names.update(f.name for f in fields(grp))
    for name in names:
        if name in model_args and name not in cli_overridden and hasattr(args, name):
            v = model_args[name]
            if isinstance(v, list):
                v = tuple(v)
            setattr(args, name, v)
    return args
