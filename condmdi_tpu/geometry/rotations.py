"""Rotation representation conversions in pure JAX.

Behavior-parity targets: /root/reference/utils/rotation_conversions.py
(pytorch3d-lineage): quaternion_to_matrix:38, matrix_to_quaternion:98,
euler_angles_to_matrix:151, matrix_to_euler_angles:218,
axis_angle_to_quaternion:450, quaternion_to_axis_angle:482,
rotation_6d_to_matrix:513 (Zhou et al. — ROW convention, unlike the
HumanML3D codec's column-convention cont6d in geometry/quaternion.py),
matrix_to_rotation_6d:537.

Everything is jittable, vmappable, differentiable, broadcasting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _sqrt_positive_part(x: Array) -> Array:
    """sqrt(max(0, x)) with a subgradient of 0 at x=0."""
    return jnp.sqrt(jnp.maximum(x, 0.0))


def standardize_quaternion(q: Array) -> Array:
    """Flip sign so the real part is non-negative."""
    return jnp.where(q[..., 0:1] < 0, -q, q)


def quaternion_raw_multiply(a: Array, b: Array) -> Array:
    from condmdi_tpu.geometry.quaternion import qmul

    return qmul(a, b)


def quaternion_multiply(a: Array, b: Array) -> Array:
    return standardize_quaternion(quaternion_raw_multiply(a, b))


def quaternion_invert(q: Array) -> Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quaternion_apply(q: Array, point: Array) -> Array:
    from condmdi_tpu.geometry.quaternion import qrot

    return qrot(q, point)


def quaternion_to_matrix(q: Array) -> Array:
    from condmdi_tpu.geometry.quaternion import quaternion_to_matrix as _qtm

    return _qtm(q)


def matrix_to_quaternion(matrix: Array) -> Array:
    """(*, 3, 3) → (*, 4) wxyz. Branch-free variant of the pytorch3d trick:
    compute all four candidate quaternions from the diagonal and pick the
    best-conditioned one with where-selects (TPU-friendly, no gather)."""
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs = jnp.stack(
        [
            _sqrt_positive_part(1.0 + m00 + m11 + m22),
            _sqrt_positive_part(1.0 + m00 - m11 - m22),
            _sqrt_positive_part(1.0 - m00 + m11 - m22),
            _sqrt_positive_part(1.0 - m00 - m11 + m22),
        ],
        axis=-1,
    )

    quat_by_w = jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    quat_by_x = jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1)
    quat_by_y = jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1)
    quat_by_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1)
    candidates = jnp.stack([quat_by_w, quat_by_x, quat_by_y, quat_by_z], axis=-2)

    # denominator 2*q_abs[i], guarded for the (unchosen) near-zero entries
    denom = 2.0 * jnp.maximum(q_abs[..., None], 0.1 * jnp.finfo(matrix.dtype).eps)
    candidates = candidates / denom

    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax.nn.one_hot(best, 4, dtype=matrix.dtype)[..., None]
    q = jnp.sum(candidates * onehot, axis=-2)
    return standardize_quaternion(q / jnp.linalg.norm(q, axis=-1, keepdims=True))


def _axis_angle_rotation(axis: str, angle: Array) -> Array:
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError(f"letter must be X/Y/Z, got {axis}")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: Array, convention: str) -> Array:
    if len(convention) != 3 or any(c not in "XYZ" for c in convention):
        raise ValueError(f"invalid convention {convention}")
    ms = [
        _axis_angle_rotation(c, euler_angles[..., i])
        for i, c in enumerate(convention)
    ]
    return ms[0] @ ms[1] @ ms[2]


def _index_from_letter(letter: str) -> int:
    return "XYZ".index(letter)


def _angle_from_tan(axis: str, other_axis: str, data: Array, horizontal: bool, tait_bryan: bool) -> Array:
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ["XY", "YZ", "ZX"]
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: Array, convention: str) -> Array:
    if len(convention) != 3 or any(c not in "XYZ" for c in convention):
        raise ValueError(f"invalid convention {convention}")
    i0 = _index_from_letter(convention[0])
    i2 = _index_from_letter(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(
            jnp.clip(matrix[..., i0, i2] * (-1.0 if i0 - i2 in [-1, 2] else 1.0), -1.0, 1.0)
        )
    else:
        central = jnp.arccos(jnp.clip(matrix[..., i0, i0], -1.0, 1.0))
    o = (
        _angle_from_tan(convention[0], convention[1], matrix[..., i2], False, tait_bryan),
        central,
        _angle_from_tan(convention[2], convention[1], matrix[..., i0, :], True, tait_bryan),
    )
    return jnp.stack(o, axis=-1)


def axis_angle_to_quaternion(axis_angle: Array) -> Array:
    """(*, 3) exponential map → (*, 4) wxyz, Taylor-guarded near zero.

    Gradient-safe at the zero rotation: the norm uses sqrt(x²+ε²) so autodiff
    through identity poses (e.g. SMPLify init) never produces NaNs.
    """
    sq = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    angles = jnp.sqrt(sq + 1e-24)
    half = angles * 0.5
    small = jnp.abs(angles) < 1e-6
    # sin(x/2)/x, with series 0.5 - x^2/48 for small x
    sin_half_over = jnp.where(
        small, 0.5 - (angles * angles) / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angles)
    )
    return jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over], axis=-1)


def quaternion_to_axis_angle(q: Array) -> Array:
    norms = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    half = jnp.arctan2(norms, q[..., :1])
    angles = 2.0 * half
    small = jnp.abs(angles) < 1e-6
    sin_half_over = jnp.where(
        small, 0.5 - (angles * angles) / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angles)
    )
    return q[..., 1:] / sin_half_over


def axis_angle_to_matrix(axis_angle: Array) -> Array:
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: Array) -> Array:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def rotation_6d_to_matrix(d6: Array, eps: float = 1e-12) -> Array:
    """Zhou et al. 6D (first two ROWS of R) → (*, 3, 3)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), eps)
    a2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 / jnp.maximum(jnp.linalg.norm(a2, axis=-1, keepdims=True), eps)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: Array) -> Array:
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def random_quaternions(key: jax.Array, n: int, dtype=jnp.float32) -> Array:
    q = jax.random.normal(key, (n, 4), dtype=dtype)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def random_rotations(key: jax.Array, n: int, dtype=jnp.float32) -> Array:
    return quaternion_to_matrix(random_quaternions(key, n, dtype))
