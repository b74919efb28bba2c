"""Quaternion helpers (wxyz convention, matching 3DGS `rot = [r, x, y, z]`,
reference cuda_rasterizer/forward.cu:129-141)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_normalize(q: jax.Array, eps: float = 1e-8) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz (assumed normalized) -> (..., 3, 3)."""
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 ⊗ q2 in wxyz."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) wxyz. Shepperd's branch-free variant using
    jnp.where so it is jittable/vmappable."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    trace = m00 + m11 + m22

    def case0():
        s = jnp.sqrt(jnp.maximum(trace + 1.0, 1e-12)) * 2
        return jnp.stack(
            [0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s], axis=-1
        )

    def case1():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2
        return jnp.stack(
            [(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s], axis=-1
        )

    def case2():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-12)) * 2
        return jnp.stack(
            [(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s], axis=-1
        )

    def case3():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-12)) * 2
        return jnp.stack(
            [(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s], axis=-1
        )

    q0, q1, q2, q3 = case0(), case1(), case2(), case3()
    use0 = trace > 0
    use1 = (m00 >= m11) & (m00 >= m22)
    use2 = m11 >= m22
    q = jnp.where(
        use0[..., None],
        q0,
        jnp.where(use1[..., None], q1, jnp.where(use2[..., None], q2, q3)),
    )
    return quat_normalize(q)
