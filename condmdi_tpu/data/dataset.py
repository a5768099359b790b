"""HumanML3D / text-to-motion datasets, collation, and the host data feed.

Behavior parity with the reference data layer (SURVEY §2.3):
  * Text2MotionDataset ≙ Text2MotionDatasetV2 (dataset.py:231): per-clip
    .npy (T×263) + texts/*.txt "caption#tokens#f_tag#to_tag" files, length
    filter [min_len, 200), random caption choice, crop to unit-length
    multiples with the single/single/double coin (:434-447), trajectory-only
    slice (:450), rot/full augmentation (:453-474), drop_redundant (:476),
    z-normalization with std_scale_shift (:481-483), random projection
    (:487), zero-pad to max_motion_length (:492).
  * TextOnlyDataset (dataset.py:866): caption-only, fixed length.
  * collate ≙ tensors.py:22-72 in the [B, T, F] layout with time masks.

TPU-first: everything here is host-side numpy (the accelerator only ever
sees fixed-shape device arrays); batches are produced as plain dicts that
`parallel.shard_batch` places onto the mesh. Multi-host sharding slices the
index list by (process_index, process_count).
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, Optional, Sequence

import numpy as np

from condmdi_tpu.utils.assets import NormStats, load_norm_stats

HML_DIM = 263


@dataclass
class DatasetConfig:
    name: str = "humanml"
    data_dir: str = ""
    split: str = "train"
    hml_mode: str = "train"  # train | eval | gt | text_only
    max_motion_length: int = 196
    min_motion_length: int = 40
    unit_length: int = 4
    abs_3d: bool = False
    traject_only: bool = False
    use_random_projection: bool = False
    random_projection_scale: float = 10.0
    augment_type: str = "none"  # none | rot | full
    std_scale_shift: tuple[float, float] = (1.0, 0.0)
    drop_redundant: bool = False
    fixed_len: int = 0
    # synthetic-fallback set size; 0 = env $CONDMDI_SYNTHETIC_SIZE or
    # batch_size*4 (see get_dataset_loader). Plumbed from TrainArgs so the
    # training data is reproducible from args.json alone.
    synthetic_size: int = 0


class Text2MotionDataset:
    """File-backed HumanML3D dataset (requires downloaded data)."""

    # __getitem__ draws randomness (caption choice, crop coin/start,
    # augmentation) — device HBM caching must re-collate periodically
    has_random_item_transforms = True

    def __init__(self, cfg: DatasetConfig, stats: Optional[NormStats] = None):
        self.cfg = cfg
        if cfg.name == "kit":
            # KIT: 251-dim, 21 joints, min length 24 (reference dataset.py:255)
            cfg.min_motion_length = min(cfg.min_motion_length, 24)
            root = Path(cfg.data_dir or "./dataset/KIT-ML")
        else:
            root = Path(cfg.data_dir or "./dataset/HumanML3D")
        suffix = "_abs_3d" if cfg.abs_3d else ""
        self.motion_dir = root / ("new_joint_vecs" + ("_abs_3d" if cfg.abs_3d else ""))
        if not self.motion_dir.is_dir():
            self.motion_dir = root / "new_joint_vecs"
        self.text_dir = root / "texts"
        split_file = root / f"{cfg.split}.txt"
        if not split_file.exists():
            raise FileNotFoundError(
                f"HumanML3D split file {split_file} not found — download the "
                "dataset (reference prepare/*.sh) or use SyntheticMotionDataset"
            )
        kind = "kit" if cfg.name == "kit" else ("abs3d" if cfg.abs_3d else "t2m")
        self.stats = stats or load_norm_stats(kind)
        self.rand_proj = None
        if cfg.use_random_projection:
            from condmdi_tpu.data.projection import RandomProjection

            self.rand_proj = RandomProjection.load_or_create(
                scale=cfg.random_projection_scale
            )

        ids = [l.strip() for l in open(split_file) if l.strip()]
        self.entries = []
        for name in ids:
            mpath = self.motion_dir / f"{name}.npy"
            if not mpath.exists():
                continue
            motion = np.load(mpath, mmap_mode="r")
            if len(motion) < cfg.min_motion_length or len(motion) >= 200:
                continue
            texts = []
            tpath = self.text_dir / f"{name}.txt"
            if tpath.exists():
                for line in open(tpath):
                    parts = line.strip().split("#")
                    if len(parts) < 4:
                        continue
                    caption, tokens, f_tag, to_tag = parts[0], parts[1], parts[2], parts[3]
                    f_tag = 0.0 if f_tag in ("", "nan") else float(f_tag)
                    to_tag = 0.0 if to_tag in ("", "nan") else float(to_tag)
                    texts.append(dict(caption=caption, tokens=tokens.split(" "),
                                      f_tag=f_tag, to_tag=to_tag))
            if not texts:
                continue
            # split sub-clips with explicit tags like the reference (:300-330)
            base_texts = [t for t in texts if t["f_tag"] == 0.0 and t["to_tag"] == 0.0]
            for t in texts:
                if t["f_tag"] != 0.0 or t["to_tag"] != 0.0:
                    n_frames = int(to_tag * 20) - int(f_tag * 20)
                    if cfg.min_motion_length <= n_frames < 200:
                        self.entries.append(
                            dict(name=name, span=(int(t["f_tag"] * 20), int(t["to_tag"] * 20)),
                                 texts=[t])
                        )
            if base_texts:
                self.entries.append(dict(name=name, span=None, texts=base_texts))

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, i: int) -> dict:
        cfg = self.cfg
        e = self.entries[i]
        motion = np.load(self.motion_dir / f"{e['name']}.npy").astype(np.float32)
        if e["span"] is not None:
            motion = motion[e["span"][0] : e["span"][1]]
        text = random.choice(e["texts"])

        m_length = len(motion)
        coin2 = (
            np.random.choice(["single", "single", "double"])
            if cfg.unit_length < 10
            else "single"
        )
        if coin2 == "double":
            m_length = (m_length // cfg.unit_length - 1) * cfg.unit_length
        else:
            m_length = (m_length // cfg.unit_length) * cfg.unit_length
        start = random.randint(0, len(motion) - m_length)
        motion = motion[start : start + m_length]

        if cfg.traject_only:
            motion = motion[:, :4]
        motion = apply_augmentation(motion, cfg.augment_type)
        if cfg.drop_redundant:
            motion = motion[:, :67]

        motion = self.normalize(motion)

        return dict(
            motion=motion,
            length=m_length,
            caption=text["caption"],
            tokens=text["tokens"],
        )

    # -- transform hooks (reference transform_th/inv_transform_th :384-399) --
    def normalize(self, x: np.ndarray) -> np.ndarray:
        scale, shift = self.cfg.std_scale_shift
        std = self.stats.std[: x.shape[-1]] * scale + shift
        x = (x - self.stats.mean[: x.shape[-1]]) / std
        # project AFTER normalization (reference __getitem__:481-489; no
        # projection in eval/gt modes)
        if self.rand_proj is not None and self.cfg.hml_mode not in ("eval", "gt"):
            x = self.rand_proj(x)
        return x

    def denormalize(self, x: np.ndarray) -> np.ndarray:
        if self.rand_proj is not None and self.cfg.hml_mode not in ("eval", "gt"):
            x = self.rand_proj.inverse(x)
        scale, shift = self.cfg.std_scale_shift
        std = self.stats.std[: x.shape[-1]] * scale + shift
        return x * std + self.stats.mean[: x.shape[-1]]


def apply_augmentation(motion: np.ndarray, augment_type: str) -> np.ndarray:
    """Random yaw (rot) ± random xz translation (full) on abs-root features
    (reference dataset.py:453-474)."""
    if augment_type not in ("rot", "full"):
        return motion
    motion = motion.copy()
    rand_rot = (np.random.rand() * 2.0 - 1.0) * np.pi / 4.0
    motion[:, 0] = motion[:, 0] + rand_rot
    c, s = np.cos(-rand_rot), np.sin(-rand_rot)
    x, z = motion[:, 1].copy(), motion[:, 2].copy()
    # rotate xz by -rand_rot about y (qrot with inverse yaw quaternion)
    motion[:, 1] = c * x + s * z
    motion[:, 2] = -s * x + c * z
    if augment_type == "full":
        rand_trans = (np.random.rand(2) * 2.0 - 1.0) * 3.0
        motion[:, 1] += rand_trans[0]
        motion[:, 2] += rand_trans[1]
    return motion


class TextOnlyDataset:
    """Caption-only dataset for generation without GT motions (ref :866)."""

    has_random_item_transforms = False

    def __init__(self, cfg: DatasetConfig, captions: Sequence[str], fixed_length: int = 120):
        self.cfg = cfg
        self.captions = list(captions)
        self.fixed_length = fixed_length

    def __len__(self):
        return len(self.captions)

    def __getitem__(self, i):
        return dict(
            motion=np.zeros((self.fixed_length, HML_DIM), np.float32),
            length=self.fixed_length,
            caption=self.captions[i],
            tokens=[],
        )


# --------------------------------------------------------------------------- #
# Procedural captions for the synthetic population
# --------------------------------------------------------------------------- #
# tertile thresholds of the generative draws (computed analytically from the
# U(-0.02,0.02)^2 drift and the mean-of-22 U(0.25,0.45) scale distributions)
_SPEED_T = (0.01304, 0.01843)
_SCALE_T = (0.34467, 0.35532)
# (adverb, verb, gerund) per speed tertile; slowly/quickly are Desc_VIP words
_SPEED_WORDS = (
    ("slowly", "strolls", "strolling"),
    ("steadily", "walks", "walking"),
    ("quickly", "jogs", "jogging"),
)
_SIZE_WORDS = ("short", "average", "tall")
# 8 compass sectors of atan2(x, z), 0 = +z = "forward"; left/right etc. are
# Loc_VIP words for the evaluator's POS stream
_DIR_PHRASES = (
    "forward", "forward and right", "right", "backward and right",
    "backward", "backward and left", "left", "forward and left",
)
_POS_TAGS = {
    "a": "DET", "the": "DET", "person": "NOUN", "figure": "NOUN",
    "is": "AUX", "and": "OTHER", "to": "ADP", "while": "OTHER",
    "moving": "VERB", "heading": "VERB",
}


def synthetic_captions(props: dict, rng: np.random.Generator) -> list:
    """Paraphrased captions whose words are CORRELATED with the generative
    properties of a synthetic item (drift direction, drift speed, body
    scale) — the signal a contrastive text-motion evaluator needs to be
    discriminative (VERDICT r2 #1). Tokens come out in the T2M 'word/POS'
    format consumed by the word vectorizer."""
    drift, scale = props["drift"], props["scale"]
    speed = float(np.linalg.norm(drift))
    si = int(speed > _SPEED_T[0]) + int(speed > _SPEED_T[1])
    zi = int(scale > _SCALE_T[0]) + int(scale > _SCALE_T[1])
    ang = float(np.degrees(np.arctan2(drift[0], drift[1]))) % 360.0
    di = int(((ang + 22.5) % 360.0) // 45.0)

    adv, verb, gerund = _SPEED_WORDS[si]
    size = _SIZE_WORDS[zi]
    direc = _DIR_PHRASES[di]

    templates = (
        f"a {size} person {verb} {adv} {direc}",
        f"the {size} figure is {gerund} {direc} {adv}",
        f"a {size} person is moving {direc} while {gerund}",
        f"the {size} person {verb} {direc}",
    )
    # 3 paraphrases per item, order shuffled per-item (mirrors HumanML3D's
    # multiple captions per clip); all paraphrases carry the same signal
    picks = rng.permutation(len(templates))[:3]

    def tokenize(caption: str) -> list:
        toks = []
        for w in caption.split(" "):
            if w in (adv, "forward", "backward", "left", "right"):
                pos = "ADV"
            elif w == size:
                pos = "ADJ"
            elif w in (verb, gerund):
                pos = "VERB"
            else:
                pos = _POS_TAGS.get(w, "OTHER")
            toks.append(f"{w}/{pos}")
        return toks

    return [dict(caption=templates[p], tokens=tokenize(templates[p])) for p in picks]


class SyntheticMotionDataset:
    """Procedural plausible-motion dataset (FK on smooth random walks).

    Stands in for HumanML3D when assets are absent: tests, benches, and
    end-to-end pipeline validation. Features are generated through the real
    codec (`extract_features`), so downstream recover_from_ric round-trips
    behave like real data.
    """

    # population normalization stats, memoized per feature layout: every
    # instance shares them, exactly as every HumanML3D split shares the
    # dataset-level Mean.npy/Std.npy — so a model trained on one instance
    # normalizes test instances consistently
    _POP_STATS: dict = {}
    _STATS_SEED = 1_000_003  # disjoint from any instance seed in practice
    _STATS_ITEMS = 64
    # random crop start in __getitem__ (1-frame jitter at default lengths)
    has_random_item_transforms = True

    def __init__(self, cfg: DatasetConfig, size: int = 64, seed: int = 0):
        self.cfg = cfg
        T = min(cfg.max_motion_length + 1, 200)
        feats, props = self._make_items(cfg, seed, size, T, return_props=True)
        self.items = []
        for i in range(size):
            texts = synthetic_captions(props[i], np.random.default_rng((seed, i, 7)))
            self.items.append(dict(motion=feats[i], texts=texts))
        self.stats = self._population_stats(cfg)

    @staticmethod
    def _make_items(cfg: DatasetConfig, seed: int, size: int, T: int,
                    return_props: bool = False):
        """(size, T-1, 263) motions from the shared procedural distribution.

        Each item draws its OWN body scale and random walk from an
        item-keyed rng, so datasets with different seeds are iid draws from
        the same population (a seed-0-trained model generalizes to a seed-5
        instance); a single per-instance body would make every seed its own
        distribution. FK + codec run as ONE vmapped jit call per chunk —
        per-item dispatch would dominate startup for training-size sets.

        return_props=True additionally returns the per-item generative
        properties (xz drift vector, mean body scale) so procedural captions
        can describe the motion — the rng draw ORDER is untouched, keeping
        the motion population bit-identical to the round-2 committed stats
        and gate checkpoint.
        """
        import jax.numpy as jnp

        from condmdi_tpu.geometry.skeleton import T2M_RAW_OFFSETS

        # training-scale sets are deterministic in (abs_3d, T, seed, size):
        # cache them on disk so a process restart doesn't pay minutes of
        # FK+codec regeneration (generation is jitted, but in a TPU process
        # it also pays the remote compile)
        cache_path = None
        if size >= 512:
            import os
            import tempfile

            cdir = Path(
                os.environ.get("CONDMDI_SYNTH_CACHE", "~/.cache/condmdi_synth")
            ).expanduser()
            cache_path = cdir / f"synth_{int(cfg.abs_3d)}_{T}_{seed}_{size}.npz"
            if cache_path.exists():
                try:
                    z = np.load(cache_path)
                    feats = z["feats"]
                    props = [
                        dict(drift=z["drift"][i], scale=float(z["scale"][i]))
                        for i in range(size)
                    ]
                    return (feats, props) if return_props else feats
                except Exception:
                    pass  # corrupt/partial cache: regenerate

        batch_features = SyntheticMotionDataset._feature_fn(cfg.abs_3d)
        qs, roots, offs, props = [], [], [], []
        for i in range(size):
            rng = np.random.default_rng((seed, i))
            scale = rng.uniform(0.25, 0.45, size=(22, 1))
            offs.append((T2M_RAW_OFFSETS * scale).astype(np.float32))
            base = rng.normal(size=(1, 22, 4))
            steps = rng.normal(size=(T, 22, 4)) * 0.03
            q = base + np.cumsum(steps, axis=0)
            qs.append((q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32))
            root = np.cumsum(rng.normal(size=(T, 3)) * 0.01, axis=0).astype(np.float32)
            # meters-scale locomotion: constant per-item xz drift (real
            # HumanML3D motions travel; without it the population-mean pose
            # is a near-optimal predictor and conditioning has nothing to say
            # about where the body is)
            drift = rng.uniform(-0.02, 0.02, size=2).astype(np.float32)
            root[:, [0, 2]] += drift * np.arange(T, dtype=np.float32)[:, None]
            root[:, 1] += 0.9
            roots.append(root)
            props.append(dict(drift=drift, scale=float(scale.mean())))

        out = []
        for c in range(0, size, 256):
            out.append(
                np.asarray(
                    batch_features(
                        jnp.asarray(np.stack(qs[c : c + 256])),
                        jnp.asarray(np.stack(roots[c : c + 256])),
                        jnp.asarray(np.stack(offs[c : c + 256])),
                    )
                ).astype(np.float32)
            )
        feats = np.concatenate(out, axis=0)
        if cache_path is not None:
            try:
                cache_path.parent.mkdir(parents=True, exist_ok=True)
                import os
                import tempfile

                fd, tmp = tempfile.mkstemp(
                    dir=str(cache_path.parent), suffix=".npz.tmp"
                )
                with os.fdopen(fd, "wb") as f:
                    np.savez(
                        f, feats=feats,
                        drift=np.stack([p["drift"] for p in props]),
                        scale=np.asarray([p["scale"] for p in props]),
                    )
                os.replace(tmp, cache_path)  # atomic vs concurrent writers
            except Exception:
                pass  # read-only home etc. — cache is best-effort
        return (feats, props) if return_props else feats

    _FEATURE_FNS: dict = {}

    @classmethod
    def _feature_fn(cls, abs_3d: bool):
        """Memoized jitted FK+codec — one compile per (abs_3d, shapes) for
        the whole process instead of one per dataset instantiation (the
        per-call @jax.jit closure used to recompile identical programs,
        dominating test/startup time)."""
        fn = cls._FEATURE_FNS.get(abs_3d)
        if fn is None:
            import jax

            from condmdi_tpu.data.humanml_repr import extract_features
            from condmdi_tpu.geometry.skeleton import (
                T2M_KINEMATIC_CHAIN,
                T2M_RAW_OFFSETS,
                Skeleton,
            )

            skel = Skeleton(T2M_RAW_OFFSETS, T2M_KINEMATIC_CHAIN)

            @jax.jit
            def batch_features(q, root, off):
                import jax.numpy as jnp

                off_t = jnp.broadcast_to(off[:, None], q.shape[:-1] + (3,))
                joints = skel.forward_kinematics(q, root, off_t)
                return jax.vmap(
                    lambda j: extract_features(j, 0.002, abs_3d=abs_3d)
                )(joints)

            fn = cls._FEATURE_FNS[abs_3d] = batch_features
        return fn

    @classmethod
    def _population_stats(cls, cfg: DatasetConfig) -> "NormStats":
        key = "abs" if cfg.abs_3d else "rel"
        if key not in cls._POP_STATS:
            # shipped with the package (≙ the reference's dataset-level
            # Mean.npy/Std.npy); regenerated on the fly if absent
            path = Path(__file__).parent / f"synthetic_stats_{key}.npz"
            if path.exists():
                z = np.load(path)
                cls._POP_STATS[key] = NormStats(z["mean"], z["std"])
            else:
                per_item = cls._make_items(cfg, cls._STATS_SEED, cls._STATS_ITEMS, 200)
                feats = per_item.reshape(-1, per_item.shape[-1])
                cls._POP_STATS[key] = NormStats(
                    feats.mean(axis=0).astype(np.float32),
                    (feats.std(axis=0) + 1e-6).astype(np.float32),
                )
                # atomic + best-effort: two concurrent processes must not
                # race on a partial file, and a read-only install falls back
                # to the in-memory stats (ADVICE r2)
                try:
                    import os
                    import tempfile

                    fd, tmp = tempfile.mkstemp(dir=str(path.parent), suffix=".npz")
                    os.close(fd)
                    np.savez(tmp, mean=cls._POP_STATS[key].mean,
                             std=cls._POP_STATS[key].std)
                    os.replace(tmp, path)
                except OSError:
                    pass
        return cls._POP_STATS[key]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        cfg = self.cfg
        it = self.items[i]
        motion = it["motion"]
        m_length = min(len(motion), cfg.max_motion_length)
        m_length = (m_length // cfg.unit_length) * cfg.unit_length
        start = np.random.randint(0, len(motion) - m_length + 1)
        motion = motion[start : start + m_length]
        if cfg.traject_only:
            motion = motion[:, :4]
        motion = self.normalize(motion)
        # random caption choice among paraphrases, like the reference
        # (dataset.py:407 random.choice(self.text_list))
        text = it["texts"][np.random.randint(len(it["texts"]))]
        return dict(motion=motion, length=m_length,
                    caption=text["caption"], tokens=text["tokens"])

    def normalize(self, x):
        return (x - self.stats.mean[: x.shape[-1]]) / self.stats.std[: x.shape[-1]]

    def denormalize(self, x):
        return x * self.stats.std[: x.shape[-1]] + self.stats.mean[: x.shape[-1]]


# --------------------------------------------------------------------------- #
# Collation + loader
# --------------------------------------------------------------------------- #
def collate(samples: Sequence[dict], max_motion_length: int, text_encoder=None) -> dict:
    """Pad to max length, build masks. Layout [B, T, F] (tensors.py:22-72)."""
    B = len(samples)
    F = samples[0]["motion"].shape[-1]
    motion = np.zeros((B, max_motion_length, F), np.float32)
    lengths = np.zeros((B,), np.int32)
    captions, tokens, actions = [], [], []
    for i, s in enumerate(samples):
        L = min(len(s["motion"]), max_motion_length)
        motion[i, :L] = s["motion"][:L]
        lengths[i] = L
        captions.append(s["caption"])
        tokens.append(s.get("tokens", []))
        actions.append(s.get("action", 0))
    time_mask = np.arange(max_motion_length)[None, :] < lengths[:, None]
    batch = dict(
        motion=motion,
        time_mask=time_mask,
        lengths=lengths,
        text=captions,
        tokens=tokens,
    )
    if any(s.get("action") is not None for s in samples if "action" in s):
        batch["action"] = np.asarray(actions, np.int32)
    if text_encoder is not None:
        batch["text_embed"] = text_encoder.encode(captions)
    return batch


class DataLoader:
    """Shuffling epoch iterator with per-process sharding.

    Replaces torch DataLoader(num_workers=8): batches are small (≤64×224×263
    f32 ≈ 15 MB) and the transform is cheap numpy, so a single-threaded feed
    keeps a TPU step ahead; per-host sharding slices the shuffled index by
    process_index (the reference has no multi-host path at all).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        max_motion_length: int,
        shuffle: bool = True,
        seed: int = 0,
        text_encoder=None,
        process_index: int = 0,
        process_count: int = 1,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_motion_length = max_motion_length
        self.shuffle = shuffle
        self.seed = seed
        self.text_encoder = text_encoder
        self.process_index = process_index
        self.process_count = process_count
        self.drop_last = drop_last
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.process_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        idx = idx[self.process_index :: self.process_count]
        self.epoch += 1
        for i in range(0, len(idx) - (self.batch_size - 1 if self.drop_last else 0), self.batch_size):
            chunk = idx[i : i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            samples = [self.dataset[int(j)] for j in chunk]
            yield collate(samples, self.max_motion_length, self.text_encoder)


class PrefetchIterator:
    """Background-thread prefetch wrapper: keeps `depth` batches ready so
    the host collate path never stalls the device step (the reference leans
    on torch DataLoader workers for this)."""

    def __init__(self, iterable, depth: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._sentinel = object()
        self._err = None

        def feed():
            try:
                for item in iterable:
                    self._q.put(item)
            except BaseException as e:  # surface worker errors to the consumer
                self._err = e
            finally:
                self._q.put(self._sentinel)

        self._thread = threading.Thread(target=feed, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._sentinel:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def get_dataset_loader(cfg: DatasetConfig, batch_size: int, text_encoder=None, **kw):
    """Factory ≙ reference get_data.py:77 — picks the dataset class by
    config and wraps it in a loader."""
    try:
        ds = Text2MotionDataset(cfg)
    except FileNotFoundError:
        # size priority: explicit cfg.synthetic_size (recorded in args.json,
        # reproducible) > $CONDMDI_SYNTHETIC_SIZE (legacy env; NOT recorded —
        # this is how the round-4 retrain lost the 4096-item set) >
        # batch_size*4 heuristic. Bigger = less memorization when training
        # gate/proof models on synthetic data.
        import os

        size = (
            cfg.synthetic_size
            or int(os.environ.get("CONDMDI_SYNTHETIC_SIZE", 0))
            or max(batch_size * 4, 64)
        )
        ds = SyntheticMotionDataset(cfg, size=size)
    return DataLoader(
        ds, batch_size, cfg.max_motion_length, text_encoder=text_encoder, **kw
    )
