"""Training entry point (reference train/train_condmdi.py:39 + the host side
of train/training_loop.py TrainLoop).

Usage:
  python -m condmdi_tpu.training.train --config motion_abs_unet_adagn_xl \
      --keyframe_conditioned true [--save_dir save/exp] [--num_steps N]

The device-side step is built by training/loop.py (one jitted function);
this module owns the host loop: data feed, logging (KV logger), checkpoint
save/resume (Orbax + args.json card), the DIFFUSION_TRAINING_TEST smoke hook
(reference training_loop.py:240-243), and the data-parallel mesh placement.
"""

from __future__ import annotations

import os
import time
from pathlib import Path

import numpy as np


from condmdi_tpu.utils.seed import seed_all  # noqa: F401  (canonical home)


class TrainLoop:
    def __init__(self, args, model, params, sched, dcfg, data_loader, text_encoder=None):
        import jax

        from condmdi_tpu.parallel import make_mesh, replicate
        from condmdi_tpu.training.loop import TrainConfig, create_train_state, make_train_step
        from condmdi_tpu.utils import checkpoint as ckpt
        from condmdi_tpu.utils import logger

        self.args = args
        self.model = model
        self.data_loader = data_loader
        self.save_dir = Path(args.save_dir or "save/condmdi_run")
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.logger = logger
        logger.configure(str(self.save_dir), log_suffix="")

        self.tcfg = TrainConfig(
            lr=args.lr,
            weight_decay=args.weight_decay,
            adam_beta2=args.adam_beta2,
            grad_clip=args.grad_clip,
            avg_model_beta=args.avg_model_beta,
            lr_anneal_steps=args.lr_anneal_steps,
            num_steps=args.num_steps,
            batch_size=args.batch_size,
            log_interval=args.log_interval,
            save_interval=args.save_interval,
            schedule_sampler=getattr(args, "schedule_sampler", "uniform"),
            keyframe_conditioned=args.keyframe_conditioned,
            keyframe_selection_scheme=args.keyframe_selection_scheme,
            keyframe_mask_prob=args.keyframe_mask_prob,
            zero_keyframe_loss=args.zero_keyframe_loss,
            use_bf16=args.use_fp16,  # legacy flag name; bf16 on TPU
            remat=getattr(args, "remat", False),
        )
        self.state = create_train_state(params, self.tcfg, sched)
        self.resume_step = 0
        resume = args.resume_checkpoint or ckpt.latest_checkpoint(self.save_dir)
        if resume and Path(str(resume)).exists():
            restored = ckpt.load_checkpoint(resume, jax.tree_util.tree_map(np.asarray, _to_state_dict(self.state)))
            self.state = _from_state_dict(self.state, restored)
            self.resume_step = int(np.asarray(restored["step"]))
            print(f"resumed from {resume} at step {self.resume_step}")

        def apply_fn(params, x, t, y, train=False, rngs=None, **kw):
            return model.apply(params, x, t, y, train=train, rngs=rngs, **kw)

        self.step_fn = make_train_step(apply_fn, sched, dcfg, self.tcfg)
        self._step_builder_args = (apply_fn, sched, dcfg)
        # mesh size must divide the per-process batch
        ndev = len(jax.devices())
        n_use = max(k for k in range(1, ndev + 1) if args.batch_size % k == 0)
        self.mesh = make_mesh(jax.devices()[:n_use])
        self.state = replicate(self.mesh, self.state)
        self.rng = jax.random.key(args.seed)
        self.device_data = self._maybe_cache_dataset_on_device()

    def _maybe_cache_dataset_on_device(self):
        """Cache the whole collated dataset in device HBM when small enough.

        TPU-first data path: batches are then GATHERED on-device from the
        cache and only a [B] int32 index vector crosses host→device each
        step, instead of the full ~13 MB batch. Besides bandwidth, this
        sidesteps unbounded host-RSS growth observed in the remote-TPU
        relay, which retains a host copy of every transferred buffer.
        HumanML3D's 263-d features (~4.7 GB) fit v5e HBM; gate with
        --device_data_cache true. 'auto' caps at 1 GiB AND skips datasets
        whose __getitem__ draws randomness (crop starts, caption choice,
        augmentation) — caching would freeze those draws for the whole run,
        silently diverging from the reference's per-epoch re-sampling. When
        forced with 'true', the cached shard is RE-COLLATED every
        --device_cache_refresh steps (default 1000) so the random transforms
        keep re-sampling at epoch-ish cadence.
        """
        import jax

        from condmdi_tpu.data.dataset import collate

        mode = str(getattr(self.args, "device_data_cache", "false")).lower()
        if mode not in ("auto", "true"):
            return None
        loader = self.data_loader
        ds = loader.dataset
        random_items = bool(getattr(ds, "has_random_item_transforms", True))
        if mode == "auto" and random_items:
            print(
                "device data cache skipped (dataset re-samples crops/captions/"
                "augmentations per access; caching would freeze them — pass "
                "--device_data_cache true to force with periodic re-collation)"
            )
            return None
        # each process caches only ITS shard (same partition the streaming
        # DataLoader uses), so multi-host runs keep disjoint data
        my_idx = list(range(len(ds)))[loader.process_index :: loader.process_count]
        n = len(my_idx)
        if n == 0:
            return None
        try:
            # estimate size from ONE collated item before collating the
            # world — 'auto' must not pay a multi-GB host spike just to
            # decide to skip
            one = collate([ds[my_idx[0]]], loader.max_motion_length,
                          loader.text_encoder)
            one.pop("text", None)
            one.pop("tokens", None)
            est = n * sum(
                a.nbytes for a in jax.tree_util.tree_leaves(one)
                if hasattr(a, "nbytes")
            )
            if mode == "auto" and est > (1 << 30):
                print(
                    f"device data cache skipped (dataset ≈{est / 2**20:.0f} MiB"
                    " > 1 GiB auto cap; pass --device_data_cache true to force)"
                )
                return None
        except Exception as e:
            print(f"device data cache disabled (collate failed: {e})")
            return None
        self._cache_idx = my_idx
        full = self._collate_shard()
        if full is None:
            return None
        if random_items:
            refresh = int(getattr(self.args, "device_cache_refresh", 1000) or 0)
            print(
                "device data cache WARNING: item transforms (crops/captions/"
                "augmentations) are frozen between refreshes; re-collating "
                + (f"every {refresh} steps" if refresh > 0 else
                   "NEVER (--device_cache_refresh 0)")
            )
        nbytes = sum(
            a.nbytes for a in jax.tree_util.tree_leaves(full)
            if hasattr(a, "nbytes")
        )
        print(
            f"device data cache: {n} clips (process {loader.process_index}/"
            f"{loader.process_count}), {nbytes / 2**20:.1f} MiB in HBM; "
            "per-step transfer = index vector only"
        )
        return full, n

    def _collate_shard(self):
        """(Re-)collate this process's shard and place it in device HBM.

        Called at startup and every --device_cache_refresh steps so the
        per-access random transforms re-sample (ADVICE r2: a one-shot cache
        froze them for the whole run)."""
        import jax

        from condmdi_tpu.data.dataset import collate

        loader = self.data_loader
        try:
            full = collate(
                [loader.dataset[i] for i in self._cache_idx],
                loader.max_motion_length, loader.text_encoder,
            )
        except Exception as e:
            print(f"device data cache disabled (collate failed: {e})")
            return None
        full.pop("text", None)
        full.pop("tokens", None)
        return jax.tree_util.tree_map(jax.device_put, full)

    def _batches(self):
        """Endless stream of mesh-sharded device batches (either gathered
        from the HBM cache or streamed through the host loader)."""
        import jax
        import jax.numpy as jnp

        from condmdi_tpu.data.dataset import PrefetchIterator
        from condmdi_tpu.parallel import shard_batch

        if self.device_data is not None:
            data, n = self.device_data
            B = self.args.batch_size
            refresh = (
                int(getattr(self.args, "device_cache_refresh", 1000) or 0)
                if getattr(self.data_loader.dataset, "has_random_item_transforms", True)
                else 0
            )
            # distinct stream per process so multi-host runs draw disjoint
            # (per-shard) AND differently-ordered batches
            rng = np.random.default_rng(
                self.args.seed + 17 + 1009 * self.data_loader.process_index
            )
            gather = jax.jit(
                lambda d, i: jax.tree_util.tree_map(lambda a: a[i], d)
            )
            served = 0
            while True:
                if refresh and served and served % refresh == 0:
                    fresh = self._collate_shard()
                    if fresh is not None:
                        data = fresh
                idx = rng.choice(n, size=B, replace=n < B)
                served += 1
                yield shard_batch(self.mesh, gather(data, jnp.asarray(idx)))
        else:
            while True:
                for batch in PrefetchIterator(self.data_loader, depth=2):
                    batch.pop("text", None)
                    batch.pop("tokens", None)
                    yield shard_batch(self.mesh, batch)

    def run_loop(self):
        import jax

        K = int(getattr(self.args, "steps_per_dispatch", 1) or 1)
        if K > 1 and self.device_data is not None:
            return self._run_loop_chained(K)

        step = self.resume_step
        t_last = time.time()
        prev_metrics = None

        for batch in self._batches():
            if step >= self.tcfg.num_steps:
                break
            self.rng, sub = jax.random.split(self.rng)
            # bound in-flight dispatch to ~2 steps: without a regular
            # block the host runs ahead of the device and every queued
            # step pins its transferred batch in host memory (observed
            # as unbounded RSS growth through the remote-TPU relay);
            # blocking on the PREVIOUS step's loss keeps the pipeline
            # full while capping the queue
            if prev_metrics is not None:
                jax.block_until_ready(prev_metrics["loss"])
            self.state, metrics = self.step_fn(self.state, batch, sub)
            prev_metrics = metrics

            if step % self.tcfg.log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["step"] = step
                m["steps_per_sec"] = (
                    self.tcfg.log_interval / max(time.time() - t_last, 1e-9)
                    if step else 0.0
                )
                t_last = time.time()
                self.logger.logkvs(m)
                self.logger.dumpkvs()
                print(f"step[{step}]: loss[{m['loss']:.5f}]")

            # checkpoint labels = steps COMPLETED; incrementing first
            # avoids re-saving the restored step after a resume
            step += 1
            if step % self.tcfg.save_interval == 0:
                self.save(step)
                self.evaluate(step)
                if os.environ.get("DIFFUSION_TRAINING_TEST", ""):
                    return
        # final save unless the loop just saved (reference :250-252)
        if step % self.tcfg.save_interval != 0:
            self.save(step)

    def _run_loop_chained(self, K: int):
        """K steps per dispatch via make_chained_train_step (lax.scan over
        the train step, on-device batch gather from the HBM cache). Only a
        [K,B] index array + one rng key cross the link per dispatch —
        ~50× throughput for relay-latency-bound small configs."""
        import jax
        import jax.numpy as jnp

        from condmdi_tpu.training.loop import make_chained_train_step

        apply_fn, sched, dcfg = self._step_builder_args
        chained = make_chained_train_step(
            apply_fn, sched, dcfg, self.tcfg, mesh=self.mesh
        )
        data, n = self.device_data
        B = self.args.batch_size
        refresh = (
            int(getattr(self.args, "device_cache_refresh", 1000) or 0)
            if getattr(self.data_loader.dataset, "has_random_item_transforms", True)
            else 0
        )
        rng_idx = np.random.default_rng(
            self.args.seed + 17 + 1009 * self.data_loader.process_index
        )
        from concurrent.futures import ThreadPoolExecutor

        refresh_pool = ThreadPoolExecutor(max_workers=1)
        refresh_future = None
        step = self.resume_step
        t_last = time.time()
        last_logged = step
        print(f"chained training: {K} steps/dispatch")
        while step < self.tcfg.num_steps:
            k = min(K, self.tcfg.num_steps - step)
            if k < K:
                # final partial chunk reuses the same compiled K-step program
                # shape by padding with extra draws; extra steps are real but
                # past num_steps only within the last chunk — acceptable for
                # a budget counted in 100k units... no: keep exact semantics,
                # fall back to the single-step path for the tail
                break
            if refresh and step and (step // refresh) != ((step - K) // refresh):
                # overlap the host-side re-collate with device compute: at a
                # refresh boundary swap in the batch a background thread
                # prepared and immediately start collating the next one.
                # Training-scale synthetic sets (4096 items) take tens of
                # host-seconds to collate — done synchronously that stalls
                # the chip 100× per run. One worker + the main thread not
                # touching the global numpy RNG between refreshes keeps the
                # global-RNG draw ORDER identical to the synchronous path.
                if refresh_future is None:  # first boundary: nothing staged
                    refresh_future = refresh_pool.submit(self._collate_shard)
                fresh = refresh_future.result()
                refresh_future = refresh_pool.submit(self._collate_shard)
                if fresh is not None:
                    data = fresh
            idx = rng_idx.choice(n, size=(K, B), replace=True)
            self.rng, sub = jax.random.split(self.rng)
            self.state, metrics = chained(self.state, data, jnp.asarray(idx), sub)
            prev = step
            step += K
            if step - last_logged >= self.tcfg.log_interval or step >= self.tcfg.num_steps:
                jax.block_until_ready(metrics["loss"])
                m = {key: float(v) for key, v in metrics.items()}
                m["step"] = step
                m["steps_per_sec"] = (step - last_logged) / max(time.time() - t_last, 1e-9)
                t_last = time.time()
                last_logged = step
                self.logger.logkvs(m)
                self.logger.dumpkvs()
                print(f"step[{step}]: loss[{m['loss']:.5f}] "
                      f"({m['steps_per_sec']:.1f} steps/s)")
            if (step // self.tcfg.save_interval) != (prev // self.tcfg.save_interval):
                self.save(step)
                self.evaluate(step)
                if os.environ.get("DIFFUSION_TRAINING_TEST", ""):
                    refresh_pool.shutdown(wait=False, cancel_futures=True)
                    return
        refresh_pool.shutdown(wait=False, cancel_futures=True)
        # exact tail (num_steps not divisible by K) runs single-step
        if step < self.tcfg.num_steps:
            for batch in self._batches():
                if step >= self.tcfg.num_steps:
                    break
                self.rng, sub = jax.random.split(self.rng)
                self.state, metrics = self.step_fn(self.state, batch, sub)
                step += 1
        if step % self.tcfg.save_interval != 0:
            self.save(step)

    def evaluate(self, step: int):
        """In-training eval (reference TrainLoop.evaluate:255 — the humanml
        path there raises NotImplementedError; here it runs a debug-size
        pass of the real harness)."""
        if not getattr(self.args, "eval_during_training", False):
            return
        # eval_main reseeds the GLOBAL RNGs (fixseed parity) — snapshot and
        # restore them so the in-process eval doesn't rewind the training
        # data stream's crop/caption draws to the same subsequence after
        # every eval interval
        import random

        py_state, np_state = random.getstate(), np.random.get_state()
        try:
            from condmdi_tpu.evals.run import main as eval_main

            summary = eval_main([
                "--eval_mode", "debug",
                "--model_path", str(self.save_dir / f"ckpt_{step:09d}"),
                "--num_frames", str(self.args.num_frames),
                "--diffusion_steps", str(self.args.diffusion_steps),
                "--num_samples", str(self.args.eval_num_samples),
                "--guidance_param", "1.0",
            ])
            self.logger.logkvs(
                {f"eval/{k}": float(np.ravel(v["mean"])[0]) for k, v in summary.items()}
            )
            self.logger.dumpkvs()
        except Exception as e:  # eval must never kill training
            print(f"in-training eval failed: {e}")
        finally:
            random.setstate(py_state)
            np.random.set_state(np_state)

    def save(self, step: int):
        from condmdi_tpu.utils import checkpoint as ckpt

        path = ckpt.save_checkpoint(
            self.save_dir, step, _to_state_dict(self.state)
        )
        print(f"saved checkpoint {path}")


def _to_state_dict(state):
    return {
        "step": state.step,
        "params": state.params,
        "ema_params": state.ema_params,
        "opt_state": state.opt_state,
    }


def _from_state_dict(state, d):
    import dataclasses

    return dataclasses.replace(
        state,
        step=d["step"],
        params=d["params"],
        ema_params=d["ema_params"],
        opt_state=d["opt_state"],
    )


def main(argv=None):
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the jitted train step costs ~10-20 min
    # to compile cold on the remote TPU compiler; cache hits make restarts
    # and resumes near-instant (same recipe as bench.py)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    from condmdi_tpu.data.dataset import DatasetConfig, get_dataset_loader
    from condmdi_tpu.models.factory import create_gaussian_diffusion, create_model
    from condmdi_tpu.models.text import make_text_encoder
    from condmdi_tpu.utils.config import TrainArgs, parse_args, save_args_json

    args = parse_args(TrainArgs, argv, base_card="motion_abs_unet_adagn_xl")
    seed_all(args.seed)

    save_dir = Path(args.save_dir or "save/condmdi_run")
    # reference train_condmdi.py: an existing save_dir is an error unless
    # --overwrite. Here an existing dir auto-resumes (TrainLoop discovers the
    # latest checkpoint); --overwrite instead clears stale checkpoints so the
    # run genuinely restarts (leaving them would both resume at their step
    # AND let later samplers/evals pick up a model trained under old args)
    if args.overwrite and save_dir.exists():
        import shutil

        for stale in sorted(save_dir.glob("ckpt_*")):
            shutil.rmtree(stale, ignore_errors=True)
    save_dir.mkdir(parents=True, exist_ok=True)
    save_args_json(args, save_dir / "args.json")

    data_cfg = DatasetConfig(
        name=args.dataset,
        data_dir=args.data_dir,
        max_motion_length=args.num_frames,
        abs_3d=args.abs_3d,
        traject_only=args.traj_only,
        use_random_projection=args.use_random_proj,
        augment_type=args.augment_type,
        std_scale_shift=tuple(args.std_scale_shift),
        drop_redundant=args.drop_redundant,
        synthetic_size=getattr(args, "synthetic_size", 0),
    )
    encoder = make_text_encoder(args)
    loader = get_dataset_loader(
        data_cfg, args.batch_size, text_encoder=encoder,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )

    model = create_model(args)
    sched, dcfg = create_gaussian_diffusion(args)

    B, T, F = 2, args.num_frames, model.njoints * model.nfeats
    x = jnp.zeros((B, T, F))
    t = jnp.zeros((B,), jnp.int32)
    y = {"text_embed": jnp.zeros((B, 512))}
    kw = {}
    if args.keyframe_conditioned:
        kw = dict(obs_x0=x, obs_mask=jnp.zeros((B, T, F), bool))
    params = model.init(jax.random.key(args.seed), x, t, y, **kw)

    loop = TrainLoop(args, model, params, sched, dcfg, loader, encoder)
    loop.run_loop()
    return loop


if __name__ == "__main__":
    main()
