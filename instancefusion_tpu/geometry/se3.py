"""SE(3)/SO(3) Lie-group utilities, pure jnp.

Replaces the Sophus/Eigen pose algebra used throughout the reference's
tracking stack (expected ``Core/src/RGBDOdometry.cpp`` — SURVEY.md §3; the
reference solves its 6x6 normal equations on the CPU and applies
``exp(xi)`` updates per ICP iteration).  Here everything is traced jnp so
the full ICP iteration loop stays on-device inside one ``jit``.

Conventions:
- Poses are 4x4 float32 row-major matrices ``T`` mapping points from the
  "source" frame to the "destination" frame: ``p_dst = T @ [p_src, 1]``.
- Camera poses are camera-to-world ``T_wc`` unless suffixed otherwise.
- Twists are 6-vectors ``xi = [v, w]`` — translation part first, rotation
  (so(3)) part second.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-8

# Pose algebra operates on 3x3/4x4 matrices — negligible FLOPs, but on TPU
# the default matmul precision routes through bf16 MXU passes (~3 decimal
# digits), which is far too coarse for mm-level tracking.  Force full-f32
# for every matmul in this module.
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def _skew(w: jnp.ndarray) -> jnp.ndarray:
    """[w]_x such that [w]_x @ p = w x p.  w: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula. w: (..., 3) axis-angle -> (..., 3, 3) rotation.

    Branch-free small-angle handling (Taylor series blended via where) so it
    is safe under jit/grad.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks near 0.
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    K = _skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (_mm(K, K))


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of so3_exp. R: (..., 3, 3) -> (..., 3) axis-angle.

    Valid away from theta == pi (sufficient for incremental tracking where
    per-step rotations are small).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    small = theta < 1e-4
    # vee = 2 sin(theta) * axis; w = theta * axis.
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * sin_t + _EPS))
    return scale[..., None] * vee


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """xi = [v, w] (..., 6) -> (..., 4, 4) rigid transform.

    T = [[exp([w]x), V v], [0, 1]] with the standard left-Jacobian V.
    """
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / theta2)
    K = _skew(w)
    K2 = _mm(K, K)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    R = eye + a[..., None, None] * K + b[..., None, None] * K2
    V = eye + b[..., None, None] * K + c[..., None, None] * K2
    t = (_mm(V, v[..., None]))[..., 0]
    batch = xi.shape[:-1]
    T = jnp.zeros(batch + (4, 4), dtype=xi.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 6) twist [v, w]. Inverse of se3_exp."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    K = _skew(w)
    K2 = _mm(K, K)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    # V^-1 = I - K/2 + (1/theta^2)(1 - a/(2b)) K^2
    vinv_c = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - a / (2.0 * b)) / jnp.maximum(theta2, _EPS),
    )
    Vinv = eye - 0.5 * K + vinv_c[..., None, None] * K2
    v = (_mm(Vinv, t[..., None]))[..., 0]
    return jnp.concatenate([v, w], axis=-1)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form rigid-transform inverse: [R^T, -R^T t]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(_mm(Rt, t[..., None]))[..., 0]
    Ti = jnp.zeros_like(T)
    Ti = Ti.at[..., :3, :3].set(Rt)
    Ti = Ti.at[..., :3, 3].set(ti)
    Ti = Ti.at[..., 3, 3].set(1.0)
    return Ti


def transform_points(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply (4,4) T to points (..., 3)."""
    return _mm(p, T[:3, :3].T) + T[:3, 3]


def rotate_vectors(T: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Apply only the rotation of (4,4) T to vectors (..., 3)."""
    return _mm(n, T[:3, :3].T)
