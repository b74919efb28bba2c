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
    sigma3: jax.Array   # (N,) float UNCAPPED 3-sigma radius (cull bound)


def _rotmat_components(quats: jax.Array):
    """Quaternion (N, 4) [w, x, y, z] -> the 9 rotation-matrix entries as
    (N,) vectors. Component (structure-of-arrays) form: (N, small) arrays
    waste 124/128 TPU lanes, so the whole preprocess runs on (N,)
    vectors and only packs at the boundary."""
    r, x, y, z = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    rx, ry, rz = r * x, r * y, r * z
    return (
        1 - 2 * (yy + zz), 2 * (xy - rz), 2 * (xz + ry),
        2 * (xy + rz), 1 - 2 * (xx + zz), 2 * (yz - rx),
        2 * (xz - ry), 2 * (yz + rx), 1 - 2 * (xx + yy),
    )


def _cov3d_components(scales: jax.Array, quats: jax.Array, scale_mod: float = 1.0):
    """Sigma = R S S^T R^T as 6 (N,) components
    [xx, xy, xz, yy, yz, zz] (forward.cu:120-154). `quats` assumed
    normalized (callers normalize, matching pc.get_rotation)."""
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = _rotmat_components(quats)
    s0 = scale_mod * scales[:, 0]
    s1 = scale_mod * scales[:, 1]
    s2 = scale_mod * scales[:, 2]
    # M = R @ diag(s): m_ij = r_ij * s_j
    m00, m01, m02 = r00 * s0, r01 * s1, r02 * s2
    m10, m11, m12 = r10 * s0, r11 * s1, r12 * s2
    m20, m21, m22 = r20 * s0, r21 * s1, r22 * s2
    sxx = m00 * m00 + m01 * m01 + m02 * m02
    sxy = m00 * m10 + m01 * m11 + m02 * m12
    sxz = m00 * m20 + m01 * m21 + m02 * m22
    syy = m10 * m10 + m11 * m11 + m12 * m12
    syz = m10 * m20 + m11 * m21 + m12 * m22
    szz = m20 * m20 + m21 * m21 + m22 * m22
    return sxx, sxy, sxz, syy, syz, szz


def compute_cov3d(scales: jax.Array, quats: jax.Array, scale_mod: float = 1.0) -> jax.Array:
    """Packed (N, 6) [xx, xy, xz, yy, yz, zz] wrapper around the
    component form (kept for external callers/tests)."""
    return jnp.stack(_cov3d_components(scales, quats, scale_mod), axis=-1)


def _ewa_cov2d_components(
    tx_cam, ty_cam, tz_cam,
    cov3d_c,
    T_cw: jax.Array,
    fx: float,
    fy: float,
    tan_fovx: float,
    tan_fovy: float,
):
    """EWA projection of the 3D covariance to 2D (forward.cu:76-117),
    component form. Inputs are camera-space coordinates as (N,) vectors
    and the 6 cov3d components; returns (a, b, c) (N,) with the low-pass
    added."""
    R = T_cw[:3, :3]
    # Guard the divide for culled/dead Gaussians: a 0 or negative depth
    # would produce inf/NaN forward values that poison the backward pass
    # through `where` masking (0 * NaN = NaN). Guarded slots are masked
    # out downstream by the frustum cull.
    tz = jnp.where(tz_cam > NEAR_Z, tz_cam, 1.0)
    # clamp the projective point to 1.3x the frustum (forward.cu:84-89)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(tx_cam / tz, -limx, limx) * tz
    ty = jnp.clip(ty_cam / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J = d(pixel)/d(camera xyz), rows: [fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    # A = J @ R_cw (2, 3), per-Gaussian components (R rows are scalars)
    a00 = j00 * R[0, 0] + j02 * R[2, 0]
    a01 = j00 * R[0, 1] + j02 * R[2, 1]
    a02 = j00 * R[0, 2] + j02 * R[2, 2]
    a10 = j11 * R[1, 0] + j12 * R[2, 0]
    a11 = j11 * R[1, 1] + j12 * R[2, 1]
    a12 = j11 * R[1, 2] + j12 * R[2, 2]

    sxx, sxy, sxz, syy, syz, szz = cov3d_c
    # Sig @ A0^T components
    s0x = sxx * a00 + sxy * a01 + sxz * a02
    s0y = sxy * a00 + syy * a01 + syz * a02
    s0z = sxz * a00 + syz * a01 + szz * a02
    s1x = sxx * a10 + sxy * a11 + sxz * a12
    s1y = sxy * a10 + syy * a11 + syz * a12
    s1z = sxz * a10 + syz * a11 + szz * a12
    a = a00 * s0x + a01 * s0y + a02 * s0z + LOW_PASS
    b = a00 * s1x + a01 * s1y + a02 * s1z
    c = a10 * s1x + a11 * s1y + a12 * s1z + LOW_PASS
    return a, b, c


def ewa_cov2d(
    means3d: jax.Array,
    cov3d: jax.Array,
    T_cw: jax.Array,
    fx: float,
    fy: float,
    tan_fovx: float,
    tan_fovy: float,
) -> jax.Array:
    """Packed (N, 3) [a, b, c] wrapper (kept for external callers/tests)."""
    R = T_cw[:3, :3]
    t_cam = means3d @ R.T + T_cw[:3, 3]
    a, b, c = _ewa_cov2d_components(
        t_cam[:, 0], t_cam[:, 1], t_cam[:, 2],
        tuple(cov3d[:, i] for i in range(6)),
        T_cw, fx, fy, tan_fovx, tan_fovy,
    )
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
    # all math below runs on (N,) component vectors (full TPU lane use);
    # (N, 3)/(N, 4) inputs are unpacked once at the boundary
    x, y, z = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    R = T_cw[:3, :3]
    t = T_cw[:3, 3]
    tcx = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z + t[0]
    tcy = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z + t[1]
    depth = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z + t[2]
    in_front = depth > NEAR_Z

    # clip-space projection -> pixel coords (forward.cu:190-198 + ndc2Pix)
    fp = proj @ T_cw
    hom_x = fp[0, 0] * x + fp[0, 1] * y + fp[0, 2] * z + fp[0, 3]
    hom_y = fp[1, 0] * x + fp[1, 1] * y + fp[1, 2] * z + fp[1, 3]
    w = fp[3, 0] * x + fp[3, 1] * y + fp[3, 2] * z + fp[3, 3]
    inv_w = 1.0 / (w + 1e-7)
    px = ((hom_x * inv_w + 1.0) * width - 1.0) * 0.5
    py = ((hom_y * inv_w + 1.0) * height - 1.0) * 0.5
    mean2d = jnp.stack([px, py], axis=-1)

    cov3d_c = _cov3d_components(scales, quats, scale_mod)
    c2a, c2b, c2c = _ewa_cov2d_components(
        tcx, tcy, depth, cov3d_c, T_cw, fx, fy, tan_fovx, tan_fovy
    )

    det = c2a * c2c - c2b * c2b
    det_ok = det > 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / safe_det
    conic = jnp.stack(
        [c2c * inv_det, -c2b * inv_det, c2a * inv_det], axis=-1
    )

    # 3-sigma radius from the larger eigenvalue (forward.cu:205-210)
    mid = 0.5 * (c2a + c2c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    sigma3 = 3.0 * jnp.sqrt(lam1)
    radius = jnp.ceil(sigma3)
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
        # UNCAPPED 3-sigma radius: the binner's opacity-aware tile
        # culling bound (alpha <= op * exp(-4.5 d^2 / sigma3^2)) is only
        # sound against the true largest eigenvalue — using the
        # max_radius-capped footprint radius there would over-cull tiles
        # of radius-capped Gaussians
        sigma3=jnp.where(visible, sigma3, 0.0),
    )
