"""Serving runtime: precompiled samplers + request micro-batching.

The reference has no serving story (research CLIs only). For production
deployment this module owns:

  * shape-bucketed AOT compilation of the full sampling program (the
    1000-step scan compiles once per (batch, frames) bucket; requests never
    trigger recompilation),
  * a background micro-batcher that coalesces concurrent requests up to
    `max_batch` or `max_wait_ms`, padding the tail with dummy rows so every
    launch hits a compiled bucket,
  * per-request keyframe conditioning (obs_x0 / obs_mask rows are batched
    together with unconditional rows — the mask is all-False for pure text
    requests, which the conditional model treats as uncond in-betweening).
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp


@dataclass
class MotionRequest:
    text_embed: np.ndarray  # [512]
    obs_x0: Optional[np.ndarray] = None  # [T, F]
    obs_mask: Optional[np.ndarray] = None  # [T, F] bool
    seed: int = 0
    _event: threading.Event = field(default_factory=threading.Event, repr=False)
    _result: Optional[np.ndarray] = None

    def result(self, timeout: Optional[float] = None) -> np.ndarray:
        if not self._event.wait(timeout):
            raise TimeoutError("motion request timed out")
        return self._result


class MotionServer:
    """Micro-batching inference server over a SamplePipeline."""

    def __init__(
        self,
        pipe,  # sampling.pipeline.SamplePipeline
        n_frames: int,
        feature_dim: int = 263,
        max_batch: int = 32,
        max_wait_ms: float = 20.0,
        guidance_param: float = 1.0,
    ):
        self.pipe = pipe
        self.T = n_frames
        self.F = feature_dim
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.guidance_param = guidance_param

        self._queue: "queue.Queue[MotionRequest]" = queue.Queue()
        self._stop = threading.Event()
        self._compiled: dict[int, Callable] = {}
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------ #
    def warmup(self, buckets=(1, 8, 32)):
        """Pre-compile the sampler for the given batch buckets."""
        for b in buckets:
            if b <= self.max_batch:
                self._get_compiled(min(b, self.max_batch))

    def _get_compiled(self, B: int):
        B = self._bucket(B)
        if B not in self._compiled:
            pipe, T, F, g = self.pipe, self.T, self.F, self.guidance_param

            def run(rng, text_embed, obs_x0, obs_mask):
                y = {"text_embed": text_embed}
                return pipe.sample(
                    rng, (B, T, F), y, guidance_param=g,
                    obs_x0=obs_x0, obs_mask=obs_mask,
                )

            fn = jax.jit(run)
            # trigger compile
            fn(
                jax.random.key(0),
                jnp.zeros((B, 512)),
                jnp.zeros((B, self.T, F)),
                jnp.zeros((B, self.T, F), bool),
            )
            self._compiled[B] = fn
        return self._compiled[B]

    def _bucket(self, n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return min(b, self.max_batch)

    # ------------------------------------------------------------------ #
    def submit(self, req: MotionRequest) -> MotionRequest:
        self._queue.put(req)
        return req

    def generate(self, text_embed: np.ndarray, **kw) -> np.ndarray:
        return self.submit(MotionRequest(text_embed=text_embed, **kw)).result()

    def shutdown(self):
        self._stop.set()
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------ #
    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            self._run_batch(batch)

    def _run_batch(self, batch: list[MotionRequest]):
        n = len(batch)
        B = self._bucket(n)
        fn = self._get_compiled(B)
        text = np.zeros((B, 512), np.float32)
        obs_x0 = np.zeros((B, self.T, self.F), np.float32)
        obs_mask = np.zeros((B, self.T, self.F), bool)
        for i, r in enumerate(batch):
            text[i] = r.text_embed
            if r.obs_x0 is not None:
                obs_x0[i] = r.obs_x0
                obs_mask[i] = r.obs_mask
        rng = jax.random.key(batch[0].seed)
        out = np.asarray(
            fn(rng, jnp.asarray(text), jnp.asarray(obs_x0), jnp.asarray(obs_mask))
        )
        for i, r in enumerate(batch):
            r._result = out[i]
            r._event.set()
