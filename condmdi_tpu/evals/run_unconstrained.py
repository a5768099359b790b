"""Unconstrained-generation evaluation CLI (reference
eval/unconstrained/evaluate.py:21).

Protocol: sample an UNCONDITIONED model, extract recognition features for
generated + GT motions, score FID / KID / precision-recall / diversity
(reference metrics/kid.py, metrics/precision_recall.py), aggregate
mean ± 1.96σ/√n over replications.

Feature extractor: the reference uses an ST-GCN trained on openpose-mapped
xyz keypoints (evaluate.py:23 in_channels=3, layout 'openpose'), which
requires the SMPL body + keypoint-projection assets. In-image the extractor
runs on the a2m rot6d features directly (SMPL layout, in_channels 6) — the
protocol and metrics are identical; absolute numbers need the reference
recognition checkpoint, which `--classifier_ckpt` plugs in unchanged.

Usage:
  python -m condmdi_tpu.evals.run_unconstrained --eval_mode debug \
      [--model_path ...] [--classifier_ckpt ...]
"""

from __future__ import annotations

import argparse
import json
from collections import OrderedDict
from pathlib import Path

import numpy as np

from condmdi_tpu.evals.common import EVAL_MODES, print_summary, write_report_meta
from condmdi_tpu.evals.run_a2m import _STGCNOnA2MFeatures, load_a2m_data


def build_parser():
    p = argparse.ArgumentParser()
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
    p.add_argument("--kid_subsets", type=int, default=10)
    p.add_argument("--seed", type=int, default=10)
    p.add_argument("--output_dir", default="save/eval_out")
    return p


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
    from condmdi_tpu.evals.a2m import STGCNClassifier
    from condmdi_tpu.evals.metrics import get_metric_statistics
    from condmdi_tpu.evals.unconstrained import evaluate_unconstrained
    from condmdi_tpu.models import MDM
    from condmdi_tpu.sampling.pipeline import SamplePipeline
    from condmdi_tpu.utils.seed import seed_all

    args = build_parser().parse_args(argv)
    # reference parity: every eval entry pins the global RNGs (fixseed,
    # eval_humanml_condmdi.py:461) — the data layer's crop/text choice uses
    # the global numpy/python RNGs, so unseeded runs are not reproducible.
    seed_all(args.seed)

    args.dataset = "humanact12"  # reference protocol runs on HumanAct12
    mode = EVAL_MODES.get(args.eval_mode, EVAL_MODES["debug"])
    ds, _, synthetic_data = load_a2m_data(args)

    if args.classifier_ckpt and Path(args.classifier_ckpt).exists():
        clf = _STGCNOnA2MFeatures(
            STGCNClassifier.from_torch_checkpoint(args.classifier_ckpt)
        )
        classifier_source = "checkpoint"
    else:
        import warnings

        warnings.warn(
            "recognition checkpoint absent — random-init ST-GCN features; "
            "FID/KID are meaningless as absolute numbers.",
            stacklevel=2,
        )
        clf = _STGCNOnA2MFeatures(STGCNClassifier.random_init(num_class=12))
        classifier_source = "random_init"

    B = min(args.batch_size, len(ds))
    T = args.num_frames
    F = 150

    model = MDM(
        njoints=25, nfeats=6, latent_dim=args.latent_dim,
        ff_size=args.latent_dim * 2, num_layers=args.layers, num_heads=4,
        cond_mode="no_cond",
    )
    x0 = jnp.zeros((B, T, F))
    params = model.init(jax.random.key(args.seed), x0, jnp.zeros((B,), jnp.int32), {})
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
    gt = collate([ds[i % len(ds)] for i in range(n_batches * B)], T)
    _, gt_feat = clf(gt["motion"], gt["lengths"])

    results = {"fid": [], "kid": [], "precision": [], "recall": [], "diversity": []}
    for rep in range(mode["replication_times"]):
        gens = []
        for bi in range(n_batches):
            sample = pipe.sample(
                jax.random.key(args.seed + rep * 1000 + bi), (B, T, F), {}
            )
            gens.append(np.asarray(sample))
        gen = np.concatenate(gens)
        _, gen_feat = clf(gen, np.full((len(gen),), T, np.int32))
        out = evaluate_unconstrained(
            gen_feat, gt_feat, n_subsets=args.kid_subsets,
            subset_size=min(len(gen_feat), 64),
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
    log_file = out_dir / f"eval_unconstrained_{args.eval_mode}.json"
    log_file.write_text(json.dumps(summary, indent=1))
    write_report_meta(log_file, {
        "protocol": "unconstrained",
        "synthetic_data": synthetic_data,
        "classifier": classifier_source,
        "features": "stgcn_smpl_rot6d",
        "model_path": args.model_path or "random_init",
        "eval_mode": args.eval_mode,
        "replications": mode["replication_times"],
        "num_samples": n_batches * B,
    })
    return summary


if __name__ == "__main__":
    main()
