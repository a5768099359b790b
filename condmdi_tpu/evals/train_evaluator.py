"""Contrastive text-motion co-embedding training (in-image evaluator).

Reference: data_loaders/humanml/networks/trainers.py:879
(TextMotionMatchTrainer) — margin contrastive loss (modules.py:11
ContrastiveLoss, Hadsell-Chopra-LeCun) over TextEncoderBiGRUCo /
MotionEncoderBiGRUCo / MovementConvEncoder (modules.py:311,353,79):
  positives:  mean ||t - m||²                (matched pairs)
  negatives:  mean max(margin - ||t - m'||, 0)²   (batch shifted by s≥1)
with Adam and grad-norm clip 0.5 (trainers.py:925,966-1010).

Why this exists (VERDICT r2 #1): the reference ships its evaluator
pre-trained (`t2m/text_mot_match/model/finest.tar`), which is absent in an
air-gapped image — so every committed FID/R-precision was chance-level by
construction. This trainer produces a DISCRIMINATIVE evaluator from the
procedural synthetic set, whose captions are correlated with the generative
properties (drift direction/speed/body scale — data/dataset.py
synthetic_captions), making in-image quality numbers meaningful.

Deviations from the reference, all documented:
  * the movement (conv) encoder trains JOINTLY with the contrastive loss —
    the reference freezes one pretrained inside its decomposition VAE
    (trainers.py:941 `.detach()`), a stage that has no in-image equivalent;
  * the negative term is the EXACT EXPECTATION over all B-1 batch shifts
    (a [B,B] distance matrix with the diagonal masked) instead of the
    reference's ONE uniformly-drawn shift per step (trainers.py:976) — the
    same loss in expectation with (B-1)× lower gradient variance, which a
    single-negative run measurably needs (R@1 was still ~chance at step 800
    with the sampled shift; the reference's randint(0, B-1) can even draw
    shift 0, making the "negative" the positive pair).

Train step is one jitted function; runs on whatever jax.devices() offers
(TPU in the bench image, CPU under tests).

Usage:
  python -m condmdi_tpu.evals.train_evaluator --steps 3000 \
      --out save/evaluator_synth [--train_size 4096] [--batch_size 32]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

MARGIN = 10.0  # reference negative_margin for text_mot_match
UNIT_LENGTH = 4


# --------------------------------------------------------------------------- #
# Initialization (reference modules.py init_weight: xavier-normal linear/conv;
# GRU weights keep torch's U(-1/sqrt(H), 1/sqrt(H)) default)
# --------------------------------------------------------------------------- #
def init_params(rng: np.random.Generator, dim_pose: int = 263) -> dict:
    H, E, W, P = 1024, 512, 300, 15

    def xavier(shape, fan_in, fan_out):
        std = float(np.sqrt(2.0 / (fan_in + fan_out)))
        return rng.normal(0.0, std, shape).astype(np.float32)

    def dense(i, o):
        return {"kernel": xavier((i, o), i, o), "bias": np.zeros(o, np.float32)}

    def gru(i, h):
        k = 1.0 / np.sqrt(h)
        return {
            "wi": rng.uniform(-k, k, (3 * h, i)).astype(np.float32),
            "wh": rng.uniform(-k, k, (3 * h, h)).astype(np.float32),
            "bi": rng.uniform(-k, k, 3 * h).astype(np.float32),
            "bh": rng.uniform(-k, k, 3 * h).astype(np.float32),
        }

    return {
        "movement": {
            "conv1": {"kernel": xavier((4, dim_pose - 4, E), 4 * (dim_pose - 4), E),
                      "bias": np.zeros(E, np.float32)},
            "conv2": {"kernel": xavier((4, E, E), 4 * E, E),
                      "bias": np.zeros(E, np.float32)},
            "out": dense(E, E),
        },
        "motion": {
            "input_emb": dense(E, H),
            "gru_f": gru(H, H), "gru_b": gru(H, H),
            "h0": rng.normal(0, 1, (2, H)).astype(np.float32),
            "out1": dense(2 * H, H),
            "ln": {"scale": np.ones(H, np.float32), "bias": np.zeros(H, np.float32)},
            "out2": dense(H, E),
        },
        "text": {
            "pos_emb": dense(P, W),
            "input_emb": dense(W, E),
            "gru_f": gru(E, E), "gru_b": gru(E, E),
            "h0": rng.normal(0, 1, (2, E)).astype(np.float32),
            "out1": dense(2 * E, E),
            "ln": {"scale": np.ones(E, np.float32), "bias": np.zeros(E, np.float32)},
            "out2": dense(E, E),
        },
    }


# --------------------------------------------------------------------------- #
# npz (de)serialization — committed checkpoints store f16 (half the bytes;
# the evaluator is tolerant: embeddings move O(1e-3) relative)
# --------------------------------------------------------------------------- #
def save_params_npz(params: dict, path: str | Path) -> None:
    import jax

    flat = {
        "/".join(str(k.key) for k in keypath): np.asarray(leaf, np.float16)
        for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)


def load_params_npz(path: str | Path) -> dict:
    z = np.load(path)
    params: dict = {}
    for key in z.files:
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = z[key].astype(np.float32)
    return params


# --------------------------------------------------------------------------- #
# Batching
# --------------------------------------------------------------------------- #
def make_batch(ds, idx, vectorizer, max_len: int):
    """Indices → (word, pos, cap_lens, motions, m_lens) numpy arrays."""
    from condmdi_tpu.data.dataset import collate
    from condmdi_tpu.data.word_vectorizer import tokens_to_embeddings

    batch = collate([ds[int(i)] for i in idx], max_len)
    word, pos, cap_lens = tokens_to_embeddings(batch["tokens"], vectorizer)
    return word, pos, cap_lens, batch["motion"], batch["lengths"]


def r_precision_of_batch(evaluator, word, pos, cap_lens, motions, m_lens):
    from condmdi_tpu.evals import metrics as M

    text_emb, motion_emb = evaluator.get_co_embeddings(
        word, pos, cap_lens, motions, m_lens
    )
    top_k = M.calculate_R_precision(text_emb, motion_emb, 3, sum_all=True)
    match = M.calculate_matching_score(text_emb, motion_emb, sum_all=True)
    return np.asarray(top_k, np.float64) / len(text_emb), match / len(text_emb)


# --------------------------------------------------------------------------- #
# Training
# --------------------------------------------------------------------------- #
def train(args) -> dict:
    import jax

    try:  # persistent compile cache (the remote-TPU compiler is slow cold)
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import optax

    from condmdi_tpu.data.dataset import DatasetConfig, SyntheticMotionDataset
    from condmdi_tpu.data.word_vectorizer import HashWordVectorizer
    from condmdi_tpu.evals.evaluator import (
        EvaluatorWrapper,
        motion_encode,
        movement_encode,
        text_encode,
    )

    T = args.num_frames
    cfg = DatasetConfig(max_motion_length=T, abs_3d=False)
    train_ds = SyntheticMotionDataset(cfg, size=args.train_size, seed=args.seed)
    val_ds = SyntheticMotionDataset(cfg, size=args.val_size, seed=args.seed + 990_001)
    vec = HashWordVectorizer()

    params = init_params(np.random.default_rng(args.seed))
    tx = optax.chain(
        optax.clip_by_global_norm(0.5),
        optax.adam(args.lr),
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, word, pos, cap_lens, motions, m_lens):
        def loss_fn(p):
            movements = movement_encode(p["movement"], motions[..., :-4])
            mot = motion_encode(p["motion"], movements, m_lens // UNIT_LENGTH)
            txt = text_encode(p["text"], word, pos, cap_lens)
            # pairwise distances text_i ↔ motion_j [B, B]
            d2 = jnp.sum((txt[:, None, :] - mot[None, :, :]) ** 2, axis=-1)
            d = jnp.sqrt(d2 + 1e-12)
            B_ = d.shape[0]
            eye = jnp.eye(B_, dtype=bool)
            loss_pos = jnp.mean(jnp.diag(d2))
            hinge = jnp.maximum(MARGIN - d, 0.0) ** 2
            loss_neg = jnp.sum(jnp.where(eye, 0.0, hinge)) / (B_ * (B_ - 1))
            return loss_pos + loss_neg, (loss_pos, loss_neg)

        (loss, (lp, ln_)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, lp, ln_

    rng = np.random.default_rng(args.seed + 31)
    n = len(train_ds)
    B = args.batch_size
    t0 = time.time()
    log = []
    for it in range(args.steps):
        idx = rng.choice(n, size=B, replace=False)
        word, pos, cap_lens, motions, m_lens = make_batch(train_ds, idx, vec, T)
        params, opt_state, loss, lp, ln_ = step(
            params, opt_state,
            jnp.asarray(word), jnp.asarray(pos), jnp.asarray(cap_lens),
            jnp.asarray(motions), jnp.asarray(m_lens),
        )
        if it % args.log_every == 0 or it == args.steps - 1:
            ev = EvaluatorWrapper(params)
            vb = make_batch(val_ds, rng.choice(len(val_ds), B, replace=False), vec, T)
            rp, match = r_precision_of_batch(ev, *vb)
            rec = dict(step=it, loss=float(loss), loss_pos=float(lp),
                       loss_neg=float(ln_),
                       val_r_precision=[round(float(x), 4) for x in rp],
                       val_matching=round(float(match), 4),
                       elapsed_s=round(time.time() - t0, 1))
            log.append(rec)
            print(rec)

    # ---- final validation at protocol scale (val batches of 32) ---------- #
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    save_params_npz(params, out / "evaluator.npz")
    # re-load so the committed (f16-rounded) weights produce the committed
    # validation numbers
    ev = EvaluatorWrapper(load_params_npz(out / "evaluator.npz"))
    rps, matches = [], []
    vrng = np.random.default_rng(args.seed + 77)
    for _ in range(args.val_batches):
        vb = make_batch(val_ds, vrng.choice(len(val_ds), 32, replace=False), vec, T)
        rp, match = r_precision_of_batch(ev, *vb)
        rps.append(rp)
        matches.append(match)
    rp_mean = np.stack(rps).mean(axis=0)
    meta = dict(
        steps=args.steps, batch_size=B, lr=args.lr, margin=MARGIN,
        train_size=args.train_size, val_size=args.val_size, seed=args.seed,
        num_frames=T, word_vectorizer="hash",
        val_r_precision_top123=[round(float(x), 4) for x in rp_mean],
        val_matching_score=round(float(np.mean(matches)), 4),
        chance_r_precision=[round(k / 32, 4) for k in (1, 2, 3)],
        val_batches=args.val_batches,
        log=log,
    )
    (out / "meta.json").write_text(json.dumps(meta, indent=1))
    print("final:", {k: meta[k] for k in ("val_r_precision_top123", "val_matching_score")})
    return meta


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--train_size", type=int, default=4096)
    p.add_argument("--val_size", type=int, default=512)
    p.add_argument("--val_batches", type=int, default=16)
    p.add_argument("--num_frames", type=int, default=196)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--out", type=str, default="save/evaluator_synth")
    return p


def main(argv=None):
    return train(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
