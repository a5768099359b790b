"""Action-to-motion evaluation CLI (reference eval/eval_humanact12_uestc.py:18).

Protocol: generate motions conditioned on the GT batch's action labels,
score accuracy / FID / diversity against GT features from the recognition
model (GRU for HumanAct12, ST-GCN for UESTC — reference a2m/gru_eval.py,
a2m/stgcn_eval.py), aggregate mean ± 1.96σ/√n over replications.

Asset resolution (all fallbacks are LOUD and recorded in the report meta):
  data        HumanAct12Dataset / UESTCDataset pickles → SyntheticA2MDataset
  classifier  recognition checkpoint (--classifier_ckpt) → random-init
  model       --model_path action-MDM checkpoint → random-init (plumbing run)

Usage:
  python -m condmdi_tpu.evals.run_a2m --dataset humanact12 \
      --eval_mode debug [--model_path ...] [--classifier_ckpt ...]
"""

from __future__ import annotations

import argparse
import json
from collections import OrderedDict
from pathlib import Path

import numpy as np

from condmdi_tpu.evals.common import EVAL_MODES, print_summary, write_report_meta


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["humanact12", "uestc"], default="humanact12")
    p.add_argument("--datapath", default="")
    p.add_argument("--model_path", default="")
    p.add_argument("--classifier_ckpt", default="")
    p.add_argument("--eval_mode", default="debug")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_samples", type=int, default=64)
    p.add_argument("--num_frames", type=int, default=60)
    p.add_argument("--diffusion_steps", type=int, default=50)
    p.add_argument("--latent_dim", type=int, default=64)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--seed", type=int, default=10)
    p.add_argument("--output_dir", default="save/eval_out")
    return p


def load_a2m_data(args):
    """(dataset, num_actions, synthetic_flag) with the loud fallback."""
    import warnings

    from condmdi_tpu.data.a2m import (
        HumanAct12Dataset,
        SyntheticA2MDataset,
        UESTCDataset,
    )

    try:
        if args.dataset == "uestc":
            ds = UESTCDataset(
                datapath=args.datapath or "dataset/uestc",
                num_frames=args.num_frames,
            )
            return ds, ds.NUM_ACTIONS, False
        ds = HumanAct12Dataset(
            datapath=args.datapath or "dataset/HumanAct12Poses",
            num_frames=args.num_frames,
        )
        return ds, 12, False
    except FileNotFoundError:
        warnings.warn(
            f"{args.dataset} assets absent — evaluating on SYNTHETIC "
            "action-conditioned clips (report carries synthetic_data=true).",
            stacklevel=2,
        )
        na = 40 if args.dataset == "uestc" else 12
        return (
            SyntheticA2MDataset(
                size=max(args.num_samples, args.batch_size), num_actions=na,
                seed=args.seed, num_frames=args.num_frames,
            ),
            na,
            True,
        )


class _STGCNOnA2MFeatures:
    """Adapter: [B, T, 150] a2m rot6d features → ST-GCN [B, T, 24, 6]
    (SMPL layout; the trailing 6 features are the translation row)."""

    def __init__(self, clf):
        self.clf = clf

    def __call__(self, motion, lengths):
        m = np.asarray(motion)
        B, T, _ = m.shape
        return self.clf(m[..., :144].reshape(B, T, 24, 6), lengths)


def load_classifier(args, num_actions):
    from condmdi_tpu.evals.a2m import A2MClassifier, STGCNClassifier

    if args.classifier_ckpt and Path(args.classifier_ckpt).exists():
        if args.dataset == "uestc":
            return (
                _STGCNOnA2MFeatures(
                    STGCNClassifier.from_torch_checkpoint(args.classifier_ckpt)
                ),
                "checkpoint",
            )
        return A2MClassifier.from_torch_checkpoint(args.classifier_ckpt), "checkpoint"
    import warnings

    warnings.warn(
        "recognition-model checkpoint absent — random-init classifier; "
        "accuracy/FID are meaningless as absolute numbers.",
        stacklevel=2,
    )
    if args.dataset == "uestc":
        return (
            _STGCNOnA2MFeatures(STGCNClassifier.random_init(num_class=num_actions)),
            "random_init",
        )
    return A2MClassifier.random_init(num_actions=num_actions), "random_init"


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from condmdi_tpu.data.dataset import collate
    from condmdi_tpu.diffusion import (
        DiffusionConfig,
        DiffusionSchedule,
        get_named_beta_schedule,
    )
    from condmdi_tpu.diffusion.sampling import SamplerConfig
    from condmdi_tpu.evals.a2m import evaluate_a2m
    from condmdi_tpu.evals.metrics import get_metric_statistics
    from condmdi_tpu.models import MDM
    from condmdi_tpu.sampling.pipeline import SamplePipeline
    from condmdi_tpu.utils.seed import seed_all

    args = build_parser().parse_args(argv)
    # reference parity: every eval entry pins the global RNGs (fixseed,
    # eval_humanml_condmdi.py:461) — the data layer's crop/text choice uses
    # the global numpy/python RNGs, so unseeded runs are not reproducible.
    seed_all(args.seed)

    mode = EVAL_MODES.get(args.eval_mode, EVAL_MODES["debug"])
    ds, num_actions, synthetic_data = load_a2m_data(args)
    classifier, classifier_source = load_classifier(args, num_actions)

    B = min(args.batch_size, len(ds))
    T = args.num_frames
    F = 150  # 25 joints × rot6d (a2m feature table, model_util.py:62-81)

    model = MDM(
        njoints=25, nfeats=6, latent_dim=args.latent_dim, ff_size=args.latent_dim * 2,
        num_layers=args.layers, num_heads=4, cond_mode="action",
        num_actions=num_actions,
    )
    x0 = jnp.zeros((B, T, F))
    t0 = jnp.zeros((B,), jnp.int32)
    params = model.init(jax.random.key(args.seed), x0, t0, {"action": jnp.zeros((B,), jnp.int32)})
    if args.model_path and Path(args.model_path).exists():
        from condmdi_tpu.utils import checkpoint as ckpt

        restored = ckpt.load_checkpoint(args.model_path)
        loaded = restored.get("ema_params") or restored.get("params")
        params = loaded if "params" in loaded else {"params": loaded}

    sched = DiffusionSchedule.create(
        get_named_beta_schedule("cosine", args.diffusion_steps)
    )
    pipe = SamplePipeline(
        lambda x, t, y, **kw: model.apply(params, x, t, y, **kw),
        sched, DiffusionConfig(), SamplerConfig(),
    )

    n_batches = max(1, args.num_samples // B)
    gt_batches = []
    for bi in range(n_batches):
        idx = [(bi * B + i) % len(ds) for i in range(B)]
        gt_batches.append(collate([ds[j] for j in idx], T))

    results = {"accuracy": [], "fid": [], "diversity": []}
    for rep in range(mode["replication_times"]):
        gt_m, gt_l, gt_a, gen_m, gen_l = [], [], [], [], []
        for bi, batch in enumerate(gt_batches):
            actions = jnp.asarray(batch["action"])
            sample = pipe.sample(
                jax.random.key(args.seed + rep * 1000 + bi), (B, T, F),
                {"action": actions},
            )
            gt_m.append(batch["motion"])
            gt_l.append(batch["lengths"])
            gt_a.append(batch["action"])
            gen_m.append(np.asarray(sample))
            gen_l.append(batch["lengths"])
        out = evaluate_a2m(
            classifier,
            np.concatenate(gt_m), np.concatenate(gt_l), np.concatenate(gt_a),
            np.concatenate(gen_m), np.concatenate(gen_l), np.concatenate(gt_a),
            rng=np.random.default_rng(args.seed + rep),
        )
        for k in results:
            results[k].append(out[k])

    summary = OrderedDict()
    for k, vals in results.items():
        mean, ci = get_metric_statistics(np.asarray(vals), mode["replication_times"])
        summary[k] = dict(mean=np.asarray(mean).tolist(), conf=np.asarray(ci).tolist())
    print_summary(summary)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    log_file = out_dir / f"eval_a2m_{args.dataset}_{args.eval_mode}.json"
    log_file.write_text(json.dumps(summary, indent=1))
    write_report_meta(log_file, {
        "protocol": "a2m",
        "dataset": args.dataset,
        "synthetic_data": synthetic_data,
        "classifier": classifier_source,
        "model_path": args.model_path or "random_init",
        "eval_mode": args.eval_mode,
        "replications": mode["replication_times"],
        "num_samples": n_batches * B,
    })
    return summary


if __name__ == "__main__":
    main()
