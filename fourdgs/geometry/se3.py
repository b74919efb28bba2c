"""SO(3)/SE(3) exponential maps and the pose-retraction step.

Functional JAX versions of the reference pose math
(/root/reference/utils/pose_utils.py:25-97). Small-angle behaviour uses
`jnp.where` rather than Python branches so the functions are jittable and
batchable with `vmap`; the Taylor fallbacks match the reference's
`angle < 1e-5` branches.

Convention: `tau = [rho(3), theta(3)]` (translation first, rotation last),
matching `update_pose`'s `cat([trans_delta, rot_delta])`
(reference utils/pose_utils.py:81). Poses are 4x4 world-to-camera
matrices T_cw acting on column vectors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-5


def skew(v: jax.Array) -> jax.Array:
    """3-vector -> 3x3 skew-symmetric matrix. Supports leading batch dims."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def _safe_angle(theta: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Angle and a boolean 'small' mask, with the angle clamped away from 0
    so divisions are well-defined under autodiff even when masked out."""
    sq = jnp.sum(theta * theta, axis=-1)
    small = sq < _EPS * _EPS
    angle = jnp.sqrt(jnp.where(small, 1.0, sq))
    return angle, small


def so3_exp(theta: jax.Array) -> jax.Array:
    """Rodrigues formula with 2nd-order Taylor fallback near zero."""
    W = skew(theta)
    W2 = W @ W
    angle, small = _safe_angle(theta)
    a = angle[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), W.shape)
    sin_t = jnp.where(small[..., None, None], 1.0, jnp.sin(a) / a)
    cos_t = jnp.where(small[..., None, None], 0.5, (1.0 - jnp.cos(a)) / (a * a))
    return eye + sin_t * W + cos_t * W2


def so3_log(R: jax.Array) -> jax.Array:
    """Inverse of so3_exp (principal branch). Used by tests and ATE eval."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_angle = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    angle = jnp.arccos(cos_angle)
    small = angle < _EPS
    safe = jnp.where(small, 1.0, angle)
    scale = jnp.where(small, 0.5, 0.5 * safe / jnp.sin(safe))
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    return scale[..., None] * w


def se3_V(theta: jax.Array) -> jax.Array:
    """Left-Jacobian V(theta) so that t = V @ rho
    (reference utils/pose_utils.py:45-59)."""
    W = skew(theta)
    W2 = W @ W
    angle, small = _safe_angle(theta)
    a = angle[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), W.shape)
    c1 = jnp.where(small[..., None, None], 0.5, (1.0 - jnp.cos(a)) / (a * a))
    c2 = jnp.where(small[..., None, None], 1.0 / 6.0, (a - jnp.sin(a)) / (a * a * a))
    return eye + c1 * W + c2 * W2


def se3_exp(tau: jax.Array) -> jax.Array:
    """tau = [rho, theta] -> 4x4 transform. Batchable over leading dims."""
    rho = tau[..., :3]
    theta = tau[..., 3:]
    R = so3_exp(theta)
    t = jnp.einsum("...ij,...j->...i", se3_V(theta), rho)
    T = jnp.zeros(tau.shape[:-1] + (4, 4), dtype=tau.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_apply(T: jax.Array, points: jax.Array) -> jax.Array:
    """Apply a 4x4 transform to (..., N, 3) points."""
    return points @ T[..., :3, :3].swapaxes(-1, -2) + T[..., :3, 3][..., None, :]


def update_pose(
    tau: jax.Array, T_cw: jax.Array, converged_threshold: float = 1e-4
) -> tuple[jax.Array, jax.Array]:
    """Left-multiplicative pose retraction: T' = exp(tau) @ T_cw.

    Returns (new_T_cw, converged) where converged = |tau| < threshold,
    mirroring reference utils/pose_utils.py:80-97. The caller zeroes the
    deltas (functionally: just uses fresh zeros next iteration).
    """
    new_T = se3_exp(tau) @ T_cw
    converged = jnp.linalg.norm(tau) < converged_threshold
    return new_T, converged
