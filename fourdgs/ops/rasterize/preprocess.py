"""Per-Gaussian screen-space preprocessing (EWA splatting).

Pure-jnp re-derivation of the reference CUDA preprocess
(cuda_rasterizer/forward.cu:76-154,156-258): camera transform, frustum
cull, 3D covariance from scale/quaternion, EWA 2D covariance with the
clamped projective Jacobian and the 0.3-pixel low-pass, conic inversion,
3-sigma radius, and pixel-space means.

Being plain jnp, the whole chain is differentiable by autodiff —
including through the SE(3) retraction that produces the camera pose, so
camera-pose gradients (the reference's hand-written `dL_dtau`,
backward.cu:150-346,418-539) come for free.

All functions are batched over N Gaussians and jit-friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fourdgs.geometry.quaternion import quat_to_rotmat

# CUDA reference constants (auxiliary.h / forward.cu)
LOW_PASS = 0.3          # 2D covariance low-pass (forward.cu:113-115)
NEAR_Z = 0.2            # frustum near plane (auxiliary.h in_frustum)
ALPHA_MIN = 1.0 / 255.0  # min contributing alpha (forward.cu:355)
ALPHA_MAX = 0.99        # alpha clamp (forward.cu:353)
T_EPS = 1e-4            # transmittance termination (forward.cu:357)


class ScreenGaussians(NamedTuple):
    """Screen-space per-Gaussian quantities feeding the tile compositor."""

    mean2d: jax.Array   # (N, 2) pixel coords
    depth: jax.Array    # (N,) camera-space z
    conic: jax.Array    # (N, 3) inverse 2D covariance (a, b, c)
    opacity: jax.Array  # (N,) activated opacity
    color: jax.Array    # (N, C) RGB (or flow channels)
    radius: jax.Array   # (N,) int32 pixel radius (0 = culled)
    visible: jax.Array  # (N,) bool — in frustum, alive, radius > 0


def compute_cov3d(scales: jax.Array, quats: jax.Array, scale_mod: float = 1.0) -> jax.Array:
    """Sigma = R S S^T R^T, packed upper-triangular (N, 6) as
    [xx, xy, xz, yy, yz, zz] (forward.cu:120-154). `quats` assumed
    normalized (callers normalize, matching pc.get_rotation)."""
    R = quat_to_rotmat(quats)                      # (N, 3, 3)
    M = R * (scale_mod * scales)[..., None, :]     # columns scaled: R @ diag(s)
    sigma = M @ M.swapaxes(-1, -2)
    return jnp.stack(
        [
            sigma[..., 0, 0],
            sigma[..., 0, 1],
            sigma[..., 0, 2],
            sigma[..., 1, 1],
            sigma[..., 1, 2],
            sigma[..., 2, 2],
        ],
        axis=-1,
    )


def ewa_cov2d(
    means3d: jax.Array,
    cov3d: jax.Array,
    T_cw: jax.Array,
    fx: float,
    fy: float,
    tan_fovx: float,
    tan_fovy: float,
) -> jax.Array:
    """EWA projection of the 3D covariance to 2D (forward.cu:76-117).

    Returns (N, 3) packed symmetric 2x2 [a, b, c] with the low-pass added.
    """
    R = T_cw[:3, :3]
    t_cam = means3d @ R.T + T_cw[:3, 3]
    # Guard the divide for culled/dead Gaussians: a 0 or negative depth
    # would produce inf/NaN forward values that poison the backward pass
    # through `where` masking (0 * NaN = NaN). Guarded slots are masked
    # out downstream by the frustum cull.
    tz = jnp.where(t_cam[:, 2] > NEAR_Z, t_cam[:, 2], 1.0)
    # clamp the projective point to 1.3x the frustum (forward.cu:84-89)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(t_cam[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t_cam[:, 1] / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J = d(pixel)/d(camera xyz), rows: [fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    # A = J @ R : (N, 2, 3)
    A0 = j00[:, None] * R[0] + j02[:, None] * R[2]
    A1 = j11[:, None] * R[1] + j12[:, None] * R[2]

    # Sigma (N, 3, 3) from packed
    c3 = cov3d
    Sig = jnp.stack(
        [
            jnp.stack([c3[:, 0], c3[:, 1], c3[:, 2]], axis=-1),
            jnp.stack([c3[:, 1], c3[:, 3], c3[:, 4]], axis=-1),
            jnp.stack([c3[:, 2], c3[:, 4], c3[:, 5]], axis=-1),
        ],
        axis=-2,
    )
    S0 = jnp.einsum("nij,nj->ni", Sig, A0)
    S1 = jnp.einsum("nij,nj->ni", Sig, A1)
    a = jnp.sum(A0 * S0, axis=-1) + LOW_PASS
    b = jnp.sum(A0 * S1, axis=-1)
    c = jnp.sum(A1 * S1, axis=-1) + LOW_PASS
    return jnp.stack([a, b, c], axis=-1)


def preprocess(
    means3d: jax.Array,
    scales: jax.Array,
    quats: jax.Array,
    opacities: jax.Array,
    colors: jax.Array,
    alive: jax.Array,
    T_cw: jax.Array,
    proj: jax.Array,
    fx: float,
    fy: float,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    scale_mod: float = 1.0,
    max_radius: int | None = None,
) -> ScreenGaussians:
    """Full preprocess: cull + project + cov2d + conic + radius.

    `alive` masks dead capacity slots (and optionally dynamic Gaussians
    during tracking — the reference's `mask=~dygs` subsetting at
    gaussian_renderer/__init__.py:179-191 becomes a mask here).
    `max_radius` caps the pixel radius so the tile footprint fits the
    static MAX_RECT bound of the binner (the reference is uncapped;
    over-cap Gaussians are clipped, which pruning makes rare).
    """
    n = means3d.shape[0]
    R = T_cw[:3, :3]
    t_cam = means3d @ R.T + T_cw[:3, 3]
    depth = t_cam[:, 2]
    in_front = depth > NEAR_Z

    # clip-space projection -> pixel coords (forward.cu:190-198 + ndc2Pix)
    full_proj = proj @ T_cw
    hom = means3d @ full_proj[:3, :3].T + full_proj[:3, 3]
    w = means3d @ full_proj[3, :3].T + full_proj[3, 3]
    inv_w = 1.0 / (w + 1e-7)
    ndc = hom * inv_w[:, None]
    px = ((ndc[:, 0] + 1.0) * width - 1.0) * 0.5
    py = ((ndc[:, 1] + 1.0) * height - 1.0) * 0.5
    mean2d = jnp.stack([px, py], axis=-1)

    cov3d = compute_cov3d(scales, quats, scale_mod)
    cov2d = ewa_cov2d(means3d, cov3d, T_cw, fx, fy, tan_fovx, tan_fovy)

    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
    det_ok = det > 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / safe_det
    conic = jnp.stack(
        [cov2d[:, 2] * inv_det, -cov2d[:, 1] * inv_det, cov2d[:, 0] * inv_det],
        axis=-1,
    )

    # 3-sigma radius from the larger eigenvalue (forward.cu:205-210)
    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))
    if max_radius is not None:
        radius = jnp.minimum(radius, float(max_radius))
    visible = alive & in_front & det_ok
    radius = jnp.where(visible, radius, 0.0).astype(jnp.int32)
    visible = visible & (radius > 0)

    return ScreenGaussians(
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        opacity=jnp.where(visible, opacities, 0.0),
        color=colors,
        radius=radius,
        visible=visible,
    )
