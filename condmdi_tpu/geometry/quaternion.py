"""Quaternion algebra in pure JAX (wxyz convention, real part first).

Functional parity targets (behavior, not code) in the reference:
/root/reference/data_loaders/humanml/common/quaternion.py — qinv:16, qmul:33,
qrot:54, qfix:149, quaternion_to_matrix:274, quaternion_to_cont6d:314,
cont6d_to_matrix:320, qbetween:387, qslerp:369.

All functions broadcast over arbitrary leading dimensions, are jittable,
vmappable, and differentiable. Unlike the torch reference (which reshapes to
(-1, 4) and uses bmm), these are written as fused elementwise expressions so
XLA keeps them on the VPU with no layout churn.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def qinv(q: Array) -> Array:
    """Conjugate of unit quaternion(s): negate the vector part. (*, 4)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qnormalize(q: Array, eps: float = 1e-12) -> Array:
    """Normalize quaternion(s) to unit norm. (*, 4)."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def qmul(q: Array, r: Array) -> Array:
    """Hamilton product q*r for (*, 4) tensors (broadcasting leading dims)."""
    qw, qx, qy, qz = jnp.split(q, 4, axis=-1)
    rw, rx, ry, rz = jnp.split(r, 4, axis=-1)
    return jnp.concatenate(
        [
            qw * rw - qx * rx - qy * ry - qz * rz,
            qw * rx + qx * rw + qy * rz - qz * ry,
            qw * ry - qx * rz + qy * rw + qz * rx,
            qw * rz + qx * ry - qy * rx + qz * rw,
        ],
        axis=-1,
    )


def qrot(q: Array, v: Array) -> Array:
    """Rotate vector(s) v (*, 3) by unit quaternion(s) q (*, 4).

    Uses the Rodrigues-style identity v' = v + 2*(w*(u x v) + u x (u x v)).
    """
    qvec = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (w * uv + uuv)


def qfix(q: Array) -> Array:
    """Enforce sign continuity along the time axis (axis 0) of (L, J, 4).

    Picks q or -q per frame so consecutive frames have non-negative dot
    product (cumulative parity flip, matching reference qfix semantics).
    """
    dots = jnp.sum(q[1:] * q[:-1], axis=-1)
    flip = (jnp.cumsum((dots < 0).astype(jnp.int32), axis=0) % 2).astype(bool)
    sign = jnp.where(flip, -1.0, 1.0)[..., None].astype(q.dtype)
    return jnp.concatenate([q[:1], q[1:] * sign], axis=0)


def qbetween(v0: Array, v1: Array, eps: float = 1e-12) -> Array:
    """Quaternion rotating v0 into v1. Both (*, 3); returns (*, 4).

    Total: a zero input direction has no defined rotation — return the
    identity quaternion instead of the zero quaternion. Degenerate inputs
    (a generated pose with coincident joints) must yield garbage-but-finite
    features downstream, not NaN the whole eval batch.
    """
    v = jnp.cross(v0, v1)
    n0n1 = jnp.sqrt(
        jnp.sum(v0 * v0, axis=-1, keepdims=True)
        * jnp.sum(v1 * v1, axis=-1, keepdims=True)
    )
    w = n0n1 + jnp.sum(v0 * v1, axis=-1, keepdims=True)
    q = qnormalize(jnp.concatenate([w, v], axis=-1), eps=eps)
    identity = jnp.zeros_like(q).at[..., 0].set(1.0)
    return jnp.where(n0n1 > eps, q, identity)


def quaternion_to_matrix(q: Array) -> Array:
    """(*, 4) quaternion (not necessarily unit) → (*, 3, 3) rotation matrix."""
    r, i, j, k = (q[..., n] for n in range(4))
    # guarded: the zero quaternion (degenerate IK input) must map to a
    # finite (garbage) matrix, not inf
    two_s = 2.0 / jnp.maximum(jnp.sum(q * q, axis=-1), 1e-12)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def quaternion_to_cont6d(q: Array) -> Array:
    """Quaternion → continuous 6D rotation (first two matrix *columns*).

    Note: the HumanML3D codec stacks columns (mat[..., 0], mat[..., 1]),
    not rows — this matches reference quaternion_to_cont6d:314.
    """
    m = quaternion_to_matrix(q)
    return jnp.concatenate([m[..., 0], m[..., 1]], axis=-1)


def cont6d_to_matrix(c: Array, eps: float = 1e-12) -> Array:
    """Continuous 6D (column convention) → (*, 3, 3) via Gram-Schmidt."""
    x_raw = c[..., 0:3]
    y_raw = c[..., 3:6]
    x = x_raw / jnp.maximum(jnp.linalg.norm(x_raw, axis=-1, keepdims=True), eps)
    z = jnp.cross(x, y_raw)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), eps)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def qslerp(q0: Array, q1: Array, t: Array) -> Array:
    """Spherical interpolation between unit quaternions, elementwise in t.

    t broadcasts against the leading dims of q0/q1 (unlike the reference's
    outer-product variant; use vmap for the outer-product behavior).
    """
    q0 = qnormalize(q0)
    q1 = qnormalize(q1)
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) < q0.ndim else t
    # Fall back to lerp near theta=0 to stay differentiable.
    small = sin_theta < 1e-6
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_theta))
    return qnormalize(w0 * q0 + w1 * q1)


def lerp(p0: Array, p1: Array, t: Array) -> Array:
    return p0 + t * (p1 - p0)
