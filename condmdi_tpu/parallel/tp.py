"""Tensor parallelism for the MDM transformer denoiser.

The reference has no distributed path at all (utils/dist_util.py:18-41 is a
dead stub) — data parallelism in `mesh.py` already exceeds its capability.
This module adds the second mesh axis for scale-out past what DP alone
covers: serving very large batch×model products, or denoiser variants whose
weights outgrow one chip's HBM.

Design (GSPMD, Megatron-style): a 2-D ('dp', 'tp') mesh; the batch is
sharded over 'dp' and each transformer layer's matmuls are split over 'tp'
by annotating PARAMETER shardings only —

    qkv.kernel  [D, 3D]  → P(None, 'tp')   column-parallel
    qkv.bias    [3D]     → P('tp')
    attn_out.kernel [D,D]→ P('tp', None)   row-parallel → psum on exit
    ff1.kernel  [D, ff]  → P(None, 'tp')   column-parallel
    ff1.bias    [ff]     → P('tp')
    ff2.kernel  [ff, D]  → P('tp', None)   row-parallel → psum on exit

XLA propagates these through the forward/backward graph and inserts the
all-reduces itself (the scaling-book recipe: pick a mesh, annotate, let the
compiler place collectives on ICI). Model code is untouched — the same
`MDM.apply` runs single-chip, DP, or DP×TP depending only on how its params
are laid out.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from condmdi_tpu.parallel.mesh import DATA_AXIS

TP_AXIS = "tp"

# (path suffix, spec): a rule applies when the last keys of a leaf's path
# equal the suffix. Biases of the row-parallel matmuls stay replicated —
# they are added after the implicit psum (standard Megatron placement).
MDM_TP_RULES: Sequence[Tuple[Tuple[str, ...], P]] = (
    (("qkv", "kernel"), P(None, TP_AXIS)),
    (("qkv", "bias"), P(TP_AXIS)),
    (("attn_out", "kernel"), P(TP_AXIS, None)),
    (("ff1", "kernel"), P(None, TP_AXIS)),
    (("ff1", "bias"), P(TP_AXIS)),
    (("ff2", "kernel"), P(TP_AXIS, None)),
)


def make_mesh_2d(
    n_dp: int, n_tp: int, devices: Sequence | None = None
) -> Mesh:
    """2-D ('dp', 'tp') mesh. On real hardware order the device list so the
    'tp' axis rides the fastest ICI links (jax.devices() default order does
    this on TPU slices)."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_dp * n_tp
    if len(devices) < need:
        raise ValueError(f"need {need} devices for dp={n_dp}×tp={n_tp}, have {len(devices)}")
    return Mesh(np.asarray(devices[:need]).reshape(n_dp, n_tp), (DATA_AXIS, TP_AXIS))


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "idx"):
            names.append(str(k.idx))
        else:  # pragma: no cover
            names.append(str(k))
    return tuple(names)


def tp_spec_for_path(path, rules=MDM_TP_RULES) -> P:
    names = _path_names(path)
    for suffix, spec in rules:
        if names[-len(suffix):] == tuple(suffix):
            return spec
    return P()


def shard_params_tp(mesh: Mesh, tree: Any, rules=MDM_TP_RULES) -> Any:
    """Lay out a param/EMA/opt-state tree per the TP rules; unmatched leaves
    are replicated. Divisibility guard: a matched axis not divisible by the
    tp size falls back to replicated (e.g. the 263-dim output projection)."""
    n_tp = mesh.shape[TP_AXIS]

    def put(path, x):
        spec = tp_spec_for_path(path, rules)
        for ax, name in enumerate(spec):
            if name == TP_AXIS and x.shape[ax] % n_tp != 0:
                spec = P()
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, tree)
