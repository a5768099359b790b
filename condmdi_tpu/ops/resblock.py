"""Fused conv1d → GroupNorm → (AdaGN) → Mish (→ +residual) Pallas TPU kernel.

Round-3 swing at the flagship UNet's residual MFU gap (BENCH_NOTES: 76%
e2e MFU, the loss living inside XLA's conv kernels at the downsampled
stages T=56/28 and the GroupNorm/AdaGN reduction chains between them).
This kernel executes ONE whole Conv1d(AdaGN)Block half of a
ResidualTemporalBlock (models/unet.py:219, reference gmd temporal.py
Conv1dBlock/Conv1dAdaGNBlock) in a single VMEM residency:

  * the k-tap temporal conv is computed as k FULL-WIDTH matmuls on the
    flattened [B·T, C] activation — the MXU sees M = Bt·T rows (1792 at
    T=56, Bt=32) instead of XLA's per-batch T-row tiles, fixing the low-T
    underfill — with the tap offsets applied on the OUTPUT side as
    static `pltpu.roll`s plus boundary masks (batch tiling keeps taps from
    crossing batch items: rows of one b are contiguous and self-contained);
  * GroupNorm statistics are segment reductions (per batch item × group)
    expressed as tiny one-hot matmuls (S_red [Bt, M] @ acc, then group
    pooling G [CO, g]) so they ride the MXU and never leave VMEM;
  * the AdaGN (1+scale)·x+shift, Mish, and optional residual add are fused
    into the same epilogue, so h never round-trips to HBM between the conv
    and its normalization.

Grid is (batch_tiles, cout_tiles); the cout tile equals one or more whole
GroupNorm groups so the stats are tile-local. Weights stream per batch
tile (the price of keeping x resident once); at the target shapes the
kernel stays compute-bound.

Falls back to the XLA path (models/unet.py Conv1dBlock) unless the shape
satisfies the tiling constraints — this is an optional acceleration, not a
second code path for correctness (parity tested in tests/test_resblock.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def mish(x: Array) -> Array:
    return x * jnp.tanh(jax.nn.softplus(x))


# --------------------------------------------------------------------------- #
# Kernel body
# --------------------------------------------------------------------------- #
def _kernel(
    x_ref,        # [Mb, Cin]  (Mb = Bt*T, rows b-major)
    w_ref,        # [k, Cin, CO]
    b_ref,        # [1, CO]
    gamma_ref,    # [1, CO]
    beta_ref,     # [1, CO]
    *rest,        # optional (scale, shift) [Bt, CO], optional res [Mb, CO], out
    T: int,
    k: int,
    group_size: int,
    eps: float,
    has_adagn: bool,
    has_res: bool,
):
    if has_adagn and has_res:
        scale_ref, shift_ref, res_ref, o_ref = rest
    elif has_adagn:
        scale_ref, shift_ref, o_ref = rest
        res_ref = None
    elif has_res:
        (res_ref, o_ref) = rest
        scale_ref = shift_ref = None
    else:
        (o_ref,) = rest
        scale_ref = shift_ref = res_ref = None

    Mb, CO = o_ref.shape
    Bt = Mb // T
    p = k // 2
    x = x_ref[:]

    # t index of each flattened row (rows are b-major: m = b*T + t)
    t_row = jax.lax.broadcasted_iota(jnp.int32, (Mb, CO), 0) % T

    # conv: k full-width matmuls, tap offsets applied on the output side
    acc = jnp.zeros((Mb, CO), jnp.float32)
    for dk in range(k):
        off = dk - p  # y[b,t] += x[b, t+off] @ w[dk]
        y = jax.lax.dot_general(
            x, w_ref[dk],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if off:
            # row m of the result needs y[m + off]; roll is cyclic, the
            # wrapped rows are exactly the out-of-range ones masked below
            y = pltpu.roll(y, shift=-off % Mb, axis=0)
            valid = ((t_row + off) >= 0) & ((t_row + off) < T)
            acc = acc + jnp.where(valid, y, 0.0)
        else:
            acc = acc + y
    acc = acc + b_ref[0][None, :].astype(jnp.float32)

    # GroupNorm stats as one-hot segment matmuls (per batch item × group)
    g_per_tile = CO // group_size
    denom = float(T * group_size)
    row_b = jax.lax.broadcasted_iota(jnp.int32, (Bt, Mb), 1) // T
    seg = jax.lax.broadcasted_iota(jnp.int32, (Bt, Mb), 0)
    S_red = (row_b == seg).astype(jnp.float32)            # [Bt, Mb]
    col_g = jax.lax.broadcasted_iota(jnp.int32, (CO, g_per_tile), 0) // group_size
    gid = jax.lax.broadcasted_iota(jnp.int32, (CO, g_per_tile), 1)
    G = (col_g == gid).astype(jnp.float32)                # [CO, g]
    col_g2 = jax.lax.broadcasted_iota(jnp.int32, (g_per_tile, CO), 1) // group_size
    gid2 = jax.lax.broadcasted_iota(jnp.int32, (g_per_tile, CO), 0)
    GT = (col_g2 == gid2).astype(jnp.float32)             # [g, CO]

    sums_c = jax.lax.dot_general(
        S_red, acc, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                                     # [Bt, CO]
    sq_c = jax.lax.dot_general(
        S_red, acc * acc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mean_g = jax.lax.dot_general(
        sums_c, G, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / denom                                             # [Bt, g]
    var_g = jax.lax.dot_general(
        sq_c, G, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / denom - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)

    mean_c = jax.lax.dot_general(
        mean_g, GT, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                                     # [Bt, CO]
    rstd_c = jax.lax.dot_general(
        rstd_g, GT, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    row_b2 = jax.lax.broadcasted_iota(jnp.int32, (Mb, Bt), 0) // T
    seg2 = jax.lax.broadcasted_iota(jnp.int32, (Mb, Bt), 1)
    S_bcast = (row_b2 == seg2).astype(jnp.float32)        # [Mb, Bt]
    mean_rows = jax.lax.dot_general(
        S_bcast, mean_c, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    rstd_rows = jax.lax.dot_general(
        S_bcast, rstd_c, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    h = (acc - mean_rows) * rstd_rows
    h = h * gamma_ref[0][None, :].astype(jnp.float32) + beta_ref[0][None, :].astype(
        jnp.float32
    )

    if has_adagn:
        # broadcast the per-(b, channel) conditioning to rows via S_bcast
        sc = jax.lax.dot_general(
            S_bcast, scale_ref[:].astype(jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        sh = jax.lax.dot_general(
            S_bcast, shift_ref[:].astype(jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        h = h * (1.0 + sc) + sh

    h = h * jnp.tanh(jax.nn.softplus(h))  # Mish
    if has_res:
        h = h + res_ref[:].astype(jnp.float32)
    o_ref[:] = h.astype(o_ref.dtype)


# --------------------------------------------------------------------------- #
# Host wrapper
# --------------------------------------------------------------------------- #
def _vmem_estimate(bt: int, T: int, cin: int, co_tile: int, k: int,
                   has_res: bool) -> int:
    """Rough per-grid-step VMEM residency (f32 bytes) of _kernel.

    Counts the x tile, the streamed weight tile, the ~6 live [Mb, co_tile]
    f32 temporaries the body materializes (acc, y, t_row/mask, mean/rstd row
    broadcasts, h), the two [Bt, Mb] segment matrices, and the out/res
    tiles. Mosaic's scoped-vmem limit is 16 MB; round 4 found the old
    x-only 4 MB budget overflowing it by ~5% at cin=cout=1024 (bench leg 7
    VMEM OOM on v5e), so the picker now budgets the whole working set."""
    Mb = bt * T
    # Mosaic double-buffers every streamed (grid-mapped) ref — x, w, out,
    # res each hold TWO copies in scoped vmem. Round-4 follow-up: the
    # single-copy estimate passed 12 MB while the compiled kernel's scoped
    # allocation hit 16.73 MB at bt=4/T=224/cin=cout=1024 (bench fused leg),
    # a ~1.75x miss that the 2x streamed-ref terms account for.
    est = 2 * Mb * cin * 4                  # x tile (double-buffered)
    est += 2 * k * cin * co_tile * 4        # w tile (double-buffered)
    est += 6 * Mb * co_tile * 4             # body temporaries
    est += 2 * bt * Mb * 4                  # S_red / S_bcast
    est += 2 * Mb * co_tile * 4             # out tile (double-buffered)
    if has_res:
        est += 2 * Mb * co_tile * 4
    return est


def _valid_batch_tiles(B: int):
    """Divisors of B usable as the batch tile. The AdaGN scale/shift refs
    are blocked (bt, co_tile) on a [B, cout] array, so Pallas requires
    bt % 8 == 0 or bt == B (sublane divisibility) — round-4 follow-up: the
    tighter vmem budget picked bt=4 at B=64 and tripped exactly that."""
    return [bt for bt in range(B, 0, -1)
            if B % bt == 0 and (bt == B or bt % 8 == 0)]


def _pick_batch_tile(B: int, T: int, cin: int, co_tile: int, k: int,
                     has_res: bool):
    """Largest valid divisor of B whose estimated working set fits under a
    12 MB budget (16 MB Mosaic scoped-vmem limit minus headroom). Returns
    None when even the smallest valid tile does not fit — callers fall back
    to the unfused path via supports()."""
    budget = 12 * 1024 * 1024
    for bt in _valid_batch_tiles(B):
        if _vmem_estimate(bt, T, cin, co_tile, k, has_res) <= budget:
            return bt
    return None


def supports(B: int, T: int, cin: int, cout: int, k: int, n_groups: int,
             interpret: bool = False) -> bool:
    """Tiling constraints for the compiled kernel (interpret mode is lax)."""
    if cout % n_groups:
        return False
    group_size = cout // n_groups
    if interpret:
        return True
    # lane dim: the cout tile (≥1 whole group) must be a multiple of 128
    if group_size % 128 and 128 % group_size:
        return False
    if max(group_size, 128) > cout or cout % max(group_size, 128):
        return False
    # sublane: flattened rows per batch tile must tile by 8
    if not ((T % 8 == 0) or (B * T) % 8 == 0):
        return False
    # some valid batch tile must fit the scoped-vmem budget (worst case:
    # residual present); otherwise callers must take the unfused path
    co_tile = min(cout, max(group_size, 128))
    if co_tile % group_size:
        co_tile = cout
    return _pick_batch_tile(B, T, cin, co_tile, k, True) is not None


def fused_conv_gn_mish(*args, interpret: Optional[bool] = None, **kw):
    """One fused Conv1d(k, SAME) → GroupNorm → [AdaGN] → Mish [→ +res].

    `interpret=None` resolves to Pallas interpret mode off-TPU so the same
    call sites run in CPU tests and compiled on hardware."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fused_conv_gn_mish(*args, interpret=interpret, **kw)


@partial(
    jax.jit,
    static_argnames=(
        "n_groups", "eps", "batch_tile", "interpret",
    ),
)
def _fused_conv_gn_mish(
    x: Array,                       # [B, T, Cin]
    w: Array,                       # [k, Cin, Cout]
    b: Array,                       # [Cout]
    gamma: Array,                   # [Cout]
    beta: Array,                    # [Cout]
    scale: Optional[Array] = None,  # [B, Cout] (AdaGN)
    shift: Optional[Array] = None,  # [B, Cout]
    res: Optional[Array] = None,    # [B, T, Cout] residual added after Mish
    *,
    n_groups: int = 8,
    eps: float = 1e-5,
    batch_tile: Optional[int] = None,
    interpret: bool = False,
) -> Array:
    """One fused Conv1d(k, SAME) → GroupNorm → [AdaGN] → Mish [→ +res]."""
    B, T, cin = x.shape
    k, _, cout = w.shape
    assert (scale is None) == (shift is None)
    group_size = cout // n_groups
    co_tile = cout if interpret else min(cout, max(group_size, 128))
    # keep the one-group-per-tile invariant
    if co_tile % group_size:
        co_tile = cout
    n_co = cout // co_tile

    if batch_tile is not None:
        Bt = batch_tile
    elif interpret:
        Bt = B  # no vmem limit in interpret mode
    else:
        Bt = _pick_batch_tile(B, T, cin, co_tile, k, res is not None)
    if Bt is None:
        raise ValueError(
            f"fused resblock: no valid batch tile fits scoped vmem at "
            f"B={B} T={T} cin={cin} cout={cout} k={k} — gate call sites on "
            "resblock.supports()"
        )
    Mb = Bt * T
    n_b = B // Bt

    xf = x.reshape(B * T, cin)
    b2 = b.reshape(1, cout)
    g2 = gamma.reshape(1, cout)
    be2 = beta.reshape(1, cout)

    has_adagn = scale is not None
    has_res = res is not None

    in_specs = [
        pl.BlockSpec((Mb, cin), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, cin, co_tile), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, co_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, co_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, co_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [xf, w, b2, g2, be2]
    if has_adagn:
        in_specs += [
            pl.BlockSpec((Bt, co_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, co_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ]
        operands += [scale, shift]
    if has_res:
        in_specs.append(
            pl.BlockSpec((Mb, co_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        )
        operands.append(res.reshape(B * T, cout))

    flops = 2 * B * T * cin * cout * k
    out = pl.pallas_call(
        partial(
            _kernel, T=T, k=k, group_size=group_size, eps=eps,
            has_adagn=has_adagn, has_res=has_res,
        ),
        grid=(n_b, n_co),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (Mb, co_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * T, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xf.size * xf.dtype.itemsize * max(1, n_co)
            + w.size * w.dtype.itemsize * n_b
            + B * T * cout * x.dtype.itemsize,
            transcendentals=2 * B * T * cout,
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(B, T, cout)


def reference_conv_gn_mish(
    x, w, b, gamma, beta, scale=None, shift=None, res=None, *,
    n_groups=8, eps=1e-5,
):
    """Pure-XLA reference (mirrors models/unet.py Conv1d(AdaGN)Block)."""
    k = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(k // 2, k // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ) + b.astype(jnp.float32)
    B, T, C = y.shape
    g = y.reshape(B, T, n_groups, C // n_groups)
    mean = g.mean(axis=(1, 3), keepdims=True)
    var = g.var(axis=(1, 3), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    y = g.reshape(B, T, C) * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if scale is not None:
        y = y * (1.0 + scale[:, None, :].astype(jnp.float32)) + shift[
            :, None, :
        ].astype(jnp.float32)
    y = mish(y)
    if res is not None:
        y = y + res.astype(jnp.float32)
    return y.astype(x.dtype)
