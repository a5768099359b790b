"""Tensor parallelism for the denoisers (MDM transformer + flagship UNet).

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

from fnmatch import fnmatchcase
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


# UNet (flagship CondMDI denoiser) TP rules. Megatron-style pairing inside
# each ResidualTemporalBlock (models/unet.py:219):
#
#   block1.conv kernel [k,Cin,Cout] → P(None,None,'tp')  column-parallel
#     (input replicated; output h channel-sharded)
#   GN1 scale/bias + AdaGN scale/shift [C] → P('tp'): GroupNorm(8) groups are
#     128 channels at C=1024, so any tp ∈ {2,4,8} shards on GROUP boundaries
#     and the normalization reductions stay device-local (no collective);
#     non-aligned tp is still correct — GSPMD partitions the reduce.
#   time_mlp kernel [E,2C] → P(None,'tp') so the AdaGN scale/shift land
#     channel-aligned with h (the split at C crosses shard boundaries for
#     tp>2; XLA reshards the tiny [B,C] cond tensors).
#   block2.conv kernel [k,Cin,Cout] → P(None,'tp',None)  row-parallel
#     (consumes the sharded h; XLA inserts the psum on exit — the one
#     all-reduce per resblock, riding ICI)
#   residual 1×1 conv: replicated (adds to the post-psum replicated h).
#
# Down/upsample convs and final_block are column-parallel on Cout;
# final_conv ([1, C, 263]) is row-parallel so the unsharded 263-dim output
# emerges from a psum. Suffix elements may be fnmatch globs ('down*_downsample').
UNET_TP_RULES: Sequence[Tuple[Tuple[str, ...], P]] = (
    (("time_fc1", "kernel"), P(None, TP_AXIS)),
    (("time_fc1", "bias"), P(TP_AXIS)),
    (("time_fc2", "kernel"), P(TP_AXIS, None)),
    (("time_mlp", "kernel"), P(None, TP_AXIS)),
    (("time_mlp", "bias"), P(TP_AXIS)),
    (("block1", "conv", "kernel"), P(None, None, TP_AXIS)),
    (("block1", "conv", "bias"), P(TP_AXIS)),
    (("block1", "norm", "scale"), P(TP_AXIS)),
    (("block1", "norm", "bias"), P(TP_AXIS)),
    (("block2", "conv", "kernel"), P(None, TP_AXIS, None)),
    (("down*_downsample", "kernel"), P(None, None, TP_AXIS)),
    (("down*_downsample", "bias"), P(TP_AXIS)),
    (("up*_upsample", "kernel"), P(None, None, TP_AXIS)),
    (("up*_upsample", "bias"), P(TP_AXIS)),
    (("final_block", "conv", "kernel"), P(None, None, TP_AXIS)),
    (("final_block", "conv", "bias"), P(TP_AXIS)),
    (("final_block", "norm", "scale"), P(TP_AXIS)),
    (("final_block", "norm", "bias"), P(TP_AXIS)),
    (("final_conv", "kernel"), P(None, TP_AXIS, None)),
)


def tp_spec_for_path(path, rules=MDM_TP_RULES) -> P:
    names = _path_names(path)
    for suffix, spec in rules:
        if len(names) >= len(suffix) and all(
            fnmatchcase(n, pat)
            for n, pat in zip(names[-len(suffix):], suffix)
        ):
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
