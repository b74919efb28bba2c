"""Pinhole projection matrices and depth back-projection.

Matches the math of the reference's graphics utils
(/root/reference/gaussian_splatting/utils/graphics_utils.py:33-100) but in
column-vector convention throughout: clip = P @ W2V @ [x; 1]. The
reference stores transposed matrices for torch's row-vector `bmm`; we
never transpose and the rasterizer consumes P @ W2V directly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def projection_matrix(
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    znear: float = 0.01,
    zfar: float = 100.0,
    dtype=jnp.float32,
) -> jax.Array:
    """Off-center perspective projection (getProjectionMatrix2 semantics,
    reference graphics_utils.py:72-95): maps camera space to clip space
    with z in [0, zfar/(zfar-znear)·(z−znear·…)] and w = z."""
    left = ((2.0 * cx - width) / width - 1.0) * width / 2.0
    right = ((2.0 * cx - width) / width + 1.0) * width / 2.0
    top = ((2.0 * cy - height) / height + 1.0) * height / 2.0
    bottom = ((2.0 * cy - height) / height - 1.0) * height / 2.0
    left *= znear / fx
    right *= znear / fx
    top *= znear / fy
    bottom *= znear / fy

    P = jnp.zeros((4, 4), dtype=dtype)
    P = P.at[0, 0].set(2.0 * znear / (right - left))
    P = P.at[1, 1].set(2.0 * znear / (top - bottom))
    P = P.at[0, 2].set((right + left) / (right - left))
    P = P.at[1, 2].set((top + bottom) / (top - bottom))
    P = P.at[3, 2].set(1.0)
    P = P.at[2, 2].set(zfar / (zfar - znear))
    P = P.at[2, 3].set(-(zfar * znear) / (zfar - znear))
    return P


def world_to_view(R: jax.Array, t: jax.Array) -> jax.Array:
    """Assemble T_cw from rotation + translation (already world-to-camera,
    matching getWorld2View2 which does NOT transpose R — reference
    graphics_utils.py:33-46 builds [R|t] and round-trips through inverses)."""
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def full_projection(P: jax.Array, T_cw: jax.Array) -> jax.Array:
    """Clip-from-world matrix."""
    return P @ T_cw


def camera_center(T_cw: jax.Array) -> jax.Array:
    """Camera position in world coordinates: -R^T t."""
    return -T_cw[:3, :3].T @ T_cw[:3, 3]


def backproject_depth(
    depth: jax.Array,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    T_cw: jax.Array,
) -> jax.Array:
    """Depth map (H, W) -> world-space points (H*W, 3).

    Replaces the reference's Open3D point-cloud creation
    (gaussian_model.py:185-233) with a pure-jnp unprojection. Invalid
    (depth<=0) pixels still produce rows; callers mask them.
    """
    H, W = depth.shape
    v, u = jnp.mgrid[0:H, 0:W]
    z = depth
    x = (u.astype(depth.dtype) - cx) * z / fx
    y = (v.astype(depth.dtype) - cy) * z / fy
    pts_cam = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    # camera -> world: X_w = R^T (X_c - t)
    R = T_cw[:3, :3]
    t = T_cw[:3, 3]
    return (pts_cam - t) @ R
