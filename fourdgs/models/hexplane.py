"""HexPlane deformation field (4DGaussians-style, the reference's
secondary deformation mechanism).

Re-design of gaussian_splatting/utils/hexplane.py:51-189 (HexPlaneField),
utils/deformation.py:17-152 (Deformation MLP heads) and the TV/L1 plane
regularizers (gaussian_model.py:980-1030). In the reference this branch
is constructed for every run but trained nowhere (optimizer entries
commented out — SURVEY §2.4); it is exercised by `get_dynamic_mask` and
the dynamic=True render path, so it is provided here with the same API
surface plus a working training path.

Representation: 6 multi-resolution 2D feature planes over the coordinate
pairs (xy, xz, yz, xt, yt, zt); features are bilinearly interpolated,
multiplied across the 6 planes per scale, concatenated across scales, and
decoded by MLP heads into (dx, ds, dr).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

PAIRS = ((0, 1), (0, 2), (1, 2), (0, 3), (1, 3), (2, 3))
SPATIAL_PAIRS = (0, 1, 2)
TIME_PAIRS = (3, 4, 5)


class HexPlaneParams(NamedTuple):
    planes: tuple          # 6 * n_scales arrays (C, R1, R2)
    head_w1: jax.Array
    head_b1: jax.Array
    dx_w: jax.Array
    dx_b: jax.Array
    ds_w: jax.Array
    ds_b: jax.Array
    dr_w: jax.Array
    dr_b: jax.Array
    aabb_min: jax.Array    # (3,)
    aabb_max: jax.Array    # (3,)


def init_hexplane(
    key: jax.Array,
    resolution=(64, 64, 64, 25),
    out_dim: int = 32,
    multires=(1, 2, 4, 8),
    width: int = 64,
    aabb_min=(-2.0, -2.0, -2.0),
    aabb_max=(2.0, 2.0, 2.0),
) -> HexPlaneParams:
    """Matches kplanes_config (reference arguments.py:88-93): grid
    resolution upsampled per scale (spatial dims only, hexplane.py:86-91),
    features init U(0.1, 0.5) (hexplane.py:33-39)."""
    planes = []
    keys = jax.random.split(key, len(multires) * 6 + 4)
    ki = 0
    for scale in multires:
        res = [resolution[0] * scale, resolution[1] * scale,
               resolution[2] * scale, resolution[3]]
        for a, b in PAIRS:
            planes.append(
                jax.random.uniform(
                    keys[ki], (out_dim, res[b], res[a]), minval=0.1, maxval=0.5
                )
            )
            ki += 1
    feat_dim = out_dim * len(multires)
    w1 = jax.random.normal(keys[ki], (feat_dim, width)) * jnp.sqrt(2.0 / feat_dim)
    dx_w = jax.random.normal(keys[ki + 1], (width, 3)) * 1e-5
    ds_w = jax.random.normal(keys[ki + 2], (width, 3)) * 1e-5
    dr_w = jax.random.normal(keys[ki + 3], (width, 4)) * 1e-5
    return HexPlaneParams(
        planes=tuple(planes),
        head_w1=w1, head_b1=jnp.zeros(width),
        dx_w=dx_w, dx_b=jnp.zeros(3),
        ds_w=ds_w, ds_b=jnp.zeros(3),
        dr_w=dr_w, dr_b=jnp.zeros(4),
        aabb_min=jnp.asarray(aabb_min, jnp.float32),
        aabb_max=jnp.asarray(aabb_max, jnp.float32),
    )


def _grid_sample_2d(plane: jax.Array, uv: jax.Array) -> jax.Array:
    """plane (C, H, W), uv (N, 2) in [0,1] -> (N, C) bilinear
    (align_corners=True semantics like torch grid_sample in hexplane)."""
    c, h, w = plane.shape
    x = jnp.clip(uv[:, 0], 0.0, 1.0) * (w - 1)
    y = jnp.clip(uv[:, 1], 0.0, 1.0) * (h - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    dx = x - x0
    dy = y - y0
    p = plane.reshape(c, h * w)

    def g(yy, xx):
        return p[:, yy * w + xx].T  # (N, C)

    v00 = g(y0, x0)
    v01 = g(y0, x0 + 1)
    v10 = g(y0 + 1, x0)
    v11 = g(y0 + 1, x0 + 1)
    return (
        v00 * ((1 - dx) * (1 - dy))[:, None]
        + v01 * (dx * (1 - dy))[:, None]
        + v10 * ((1 - dx) * dy)[:, None]
        + v11 * (dx * dy)[:, None]
    )


def hexplane_features(hp: HexPlaneParams, xyz: jax.Array, t: jax.Array) -> jax.Array:
    """(N, 3) points + scalar t -> (N, out_dim * n_scales)."""
    n = xyz.shape[0]
    norm = (xyz - hp.aabb_min) / (hp.aabb_max - hp.aabb_min)
    tt = jnp.broadcast_to(jnp.reshape(t, (1,)), (n,))
    coords = jnp.concatenate([norm, tt[:, None]], axis=1)  # (N, 4)
    n_scales = len(hp.planes) // 6
    feats = []
    for s in range(n_scales):
        prod = None
        for pi, (a, b) in enumerate(PAIRS):
            plane = hp.planes[s * 6 + pi]
            uv = jnp.stack([coords[:, a], coords[:, b]], axis=1)
            f = _grid_sample_2d(plane, uv)
            prod = f if prod is None else prod * f
        feats.append(prod)
    return jnp.concatenate(feats, axis=1)


def hexplane_deform(hp: HexPlaneParams, xyz: jax.Array, t: jax.Array):
    """(dx, ds, dr) per point — Deformation.forward_dynamic
    (utils/deformation.py:87-152 with the default no_do/no_dshs)."""
    feat = hexplane_features(hp, xyz, t)
    h = jax.nn.relu(feat @ hp.head_w1 + hp.head_b1)
    dx = h @ hp.dx_w + hp.dx_b
    ds = h @ hp.ds_w + hp.ds_b
    dr = h @ hp.dr_w + hp.dr_b
    return dx, ds, dr


def get_dynamic_mask(
    hp: HexPlaneParams, xyz: jax.Array, t: jax.Array,
    dx_th: float = 1e-3, ds_th: float = 1e-3, dr_th: float = 1e-3,
) -> jax.Array:
    """Threshold the field's deltas to flag dynamic Gaussians (reference
    gaussian_renderer/__init__.py:364-414)."""
    dx, ds, dr = hexplane_deform(hp, xyz, t)
    return (
        (jnp.linalg.norm(dx, axis=-1) > dx_th)
        | (jnp.linalg.norm(ds, axis=-1) > ds_th)
        | (jnp.linalg.norm(dr, axis=-1) > dr_th)
    )


# ---------------------------------------------------------------------------
# Plane regularizers (reference gaussian_model.py:980-1030)
# ---------------------------------------------------------------------------


def _plane_tv(plane: jax.Array) -> jax.Array:
    d1 = plane[:, 1:, :] - plane[:, :-1, :]
    d2 = plane[:, :, 1:] - plane[:, :, :-1]
    return jnp.mean(d1 * d1) + jnp.mean(d2 * d2)


def plane_tv_loss(hp: HexPlaneParams) -> jax.Array:
    """TV over the spatial planes (compute_plane_smoothness on grids 0-2)."""
    total = 0.0
    n_scales = len(hp.planes) // 6
    for s in range(n_scales):
        for pi in SPATIAL_PAIRS:
            total = total + _plane_tv(hp.planes[s * 6 + pi])
    return total


def time_smoothness_loss(hp: HexPlaneParams) -> jax.Array:
    """Second-difference smoothness over the time axis of spatio-temporal
    planes (time is the second coordinate of pairs 3-5 -> rows)."""
    total = 0.0
    n_scales = len(hp.planes) // 6
    for s in range(n_scales):
        for pi in TIME_PAIRS:
            p = hp.planes[s * 6 + pi]
            dd = p[:, 2:, :] - 2 * p[:, 1:-1, :] + p[:, :-2, :]
            total = total + jnp.mean(dd * dd)
    return total


def l1_time_planes_loss(hp: HexPlaneParams) -> jax.Array:
    """L1 pull of spatio-temporal planes toward the identity feature 1."""
    total = 0.0
    n_scales = len(hp.planes) // 6
    for s in range(n_scales):
        for pi in TIME_PAIRS:
            total = total + jnp.mean(jnp.abs(1.0 - hp.planes[s * 6 + pi]))
    return total
