"""SLAM loss library — functional jnp versions of the reference losses
(/root/reference/utils/slam_utils.py:57-378 and
gaussian_splatting/utils/loss_utils.py).

Conventions:
  - images are (3, H, W) float32 in [0,1]; depths are (H, W); opacity is
    (H, W) accumulated alpha from the renderer,
  - `motion_mask` is True on STATIC (usable) pixels, False on dynamic
    pixels (the reference stores it the same way: YOLO person pixels are
    cleared, see utils/dataset.py:352-373),
  - every loss takes arrays only (no config objects) so it jits cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_exposure(image: jax.Array, exposure_a: jax.Array, exposure_b: jax.Array) -> jax.Array:
    """Affine exposure compensation: exp(a) * I + b
    (reference utils/slam_utils.py:58)."""
    return jnp.exp(exposure_a) * image + exposure_b


def tracking_loss_rgbd(
    image: jax.Array,
    depth: jax.Array,
    opacity: jax.Array,
    gt_image: jax.Array,
    gt_depth: jax.Array,
    grad_mask: jax.Array,
    motion_mask: jax.Array | None = None,
    extra_mask: jax.Array | None = None,
    alpha: float = 0.95,
    rgb_boundary_threshold: float = 0.01,
) -> jax.Array:
    """Opacity-weighted L1 RGB on edge pixels + L1 depth on confident
    pixels (reference get_loss_tracking_rgbd, utils/slam_utils.py:109-173).

    Means are taken over the FULL image like the reference's `.mean()`
    (masked pixels contribute zeros) — this matches its loss scale, which
    the Adam LRs were tuned against.
    """
    rgb_mask = (jnp.sum(gt_image, axis=0) > rgb_boundary_threshold) & grad_mask
    if motion_mask is not None:
        rgb_mask = rgb_mask & motion_mask
    if extra_mask is not None:
        rgb_mask = rgb_mask & extra_mask
    rgb_maskf = rgb_mask.astype(image.dtype)[None]
    l1_rgb = jnp.mean(opacity[None] * jnp.abs((image - gt_image) * rgb_maskf))

    depth_mask = (gt_depth > 0.01) & (gt_depth < 1000.0) & (opacity > 0.95)
    if motion_mask is not None:
        depth_mask = depth_mask & motion_mask
    if extra_mask is not None:
        depth_mask = depth_mask & extra_mask
    depth_maskf = depth_mask.astype(depth.dtype)
    l1_depth = jnp.mean(jnp.abs((depth - gt_depth) * depth_maskf))

    return alpha * l1_rgb + (1.0 - alpha) * l1_depth


def mapping_loss_rgbd(
    image: jax.Array,
    depth: jax.Array,
    gt_image: jax.Array,
    gt_depth: jax.Array,
    motion_mask: jax.Array | None = None,
    flow_consistency_mask: jax.Array | None = None,
    extra_mask: jax.Array | None = None,
    alpha: float = 0.95,
    rgb_boundary_threshold: float = 0.01,
    rm_dynamic: bool = False,
    dynamic: bool | jax.Array = False,
) -> jax.Array:
    """L1 RGB + L1 depth mapping loss (reference get_loss_mapping_rgbd,
    utils/slam_utils.py:274-364). With `dynamic=True` the per-pixel L1 is
    upweighted x2 on dynamic regions (~motion_mask, and optionally the
    flow-consistency mask) instead of the reference's in-place writes.
    `dynamic` may be a TRACED bool: the dynamic mapping loop flips it at
    the half-iteration phase switch (reference slam_backend.py:349-356)
    inside a fori_loop. `extra_mask` is the reproject_mask path
    (reference `mask=` kwarg, slam_utils.py:292-294): ANDed into both
    pixel masks when rm_dynamic."""
    rgb_mask = jnp.sum(gt_image, axis=0) > rgb_boundary_threshold
    depth_mask = (gt_depth > 0.01) & (gt_depth < 10000.0)
    if motion_mask is not None and rm_dynamic:
        rgb_mask = rgb_mask & motion_mask
        depth_mask = depth_mask & motion_mask
    if flow_consistency_mask is not None and rm_dynamic:
        rgb_mask = rgb_mask & flow_consistency_mask
        depth_mask = depth_mask & flow_consistency_mask
    if extra_mask is not None and rm_dynamic:
        rgb_mask = rgb_mask & extra_mask
        depth_mask = depth_mask & extra_mask

    l1_rgb = jnp.abs((image - gt_image) * rgb_mask.astype(image.dtype)[None])
    l1_depth = jnp.abs((depth - gt_depth) * depth_mask.astype(depth.dtype))

    if dynamic is not False and motion_mask is not None:
        up = ~motion_mask
        if flow_consistency_mask is not None:
            up = up | flow_consistency_mask
        dyn = jnp.asarray(dynamic)   # static True or a traced phase flag
        w = jnp.where(up & dyn, 2.0, 1.0).astype(image.dtype)
        l1_rgb = l1_rgb * w[None]
        l1_depth = l1_depth * w

    return alpha * jnp.mean(l1_rgb) + (1.0 - alpha) * jnp.mean(l1_depth)


def network_loss_rgbd(
    image: jax.Array,
    depth: jax.Array,
    opacity: jax.Array,
    gt_image: jax.Array,
    gt_depth: jax.Array,
    motion_mask: jax.Array | None = None,
    alpha: float = 0.9,
    dynamic: bool = False,
) -> jax.Array:
    """Deform-network warmup loss (reference get_loss_network,
    utils/slam_utils.py:219-249): RGB mask is opacity>0.95; with
    dynamic=True, non-static pixels are upweighted x3."""
    rgb_mask = opacity > 0.95
    l1_rgb = jnp.abs((image - gt_image) * rgb_mask.astype(image.dtype)[None])
    depth_mask = (gt_depth > 0.01) & (opacity > 0.95)
    l1_depth = jnp.abs((depth - gt_depth) * depth_mask.astype(depth.dtype))
    if dynamic and motion_mask is not None:
        w = jnp.where(motion_mask, 1.0, 3.0).astype(image.dtype)
        l1_rgb = l1_rgb * w[None]
        l1_depth = l1_depth * w
    return alpha * jnp.mean(l1_rgb) + (1.0 - alpha) * jnp.mean(l1_depth)


def pearson_depth_loss(depth: jax.Array, gt_depth: jax.Array) -> jax.Array:
    """1 - Pearson correlation between rendered and GT depth over valid
    pixels (reference utils/slam_utils.py:197-216)."""
    valid = (gt_depth > 0.01).astype(depth.dtype)
    d = (depth * valid).reshape(-1)
    g = (gt_depth * valid).reshape(-1)
    dm = d - jnp.mean(d)
    gm = g - jnp.mean(g)
    num = jnp.sum(dm * gm)
    den = jnp.sqrt(jnp.sum(dm**2) * jnp.sum(gm**2) + 1e-12)
    return 1.0 - num / den


def isotropic_loss(scaling: jax.Array, alive: jax.Array) -> jax.Array:
    """|s - mean(s)| per Gaussian, masked mean over alive slots
    (reference utils/slam_backend.py:653-655)."""
    dev = jnp.abs(scaling - jnp.mean(scaling, axis=1, keepdims=True))
    alivef = alive.astype(scaling.dtype)[:, None]
    return jnp.sum(dev * alivef) / jnp.maximum(jnp.sum(alivef) * scaling.shape[1], 1.0)


def masked_flow_l1(
    rendered_flow: jax.Array,
    target_flow: jax.Array,
    mask: jax.Array,
) -> jax.Array:
    """L1 between rendered and RAFT flow on masked (dynamic ∩ consistent)
    pixels, normalized by mask size (reference utils/slam_backend.py:486-503).

    rendered_flow/target_flow: (2, H, W); mask: (H, W) bool."""
    m = mask.astype(rendered_flow.dtype)[None]
    return jnp.sum(jnp.abs((rendered_flow - target_flow) * m)) / jnp.maximum(
        jnp.sum(m) * 2.0, 1.0
    )


def median_depth(depth: jax.Array, opacity: jax.Array | None = None, mask: jax.Array | None = None):
    """Median of valid rendered depth (reference utils/slam_utils.py:367-378).
    Invalid entries are excluded via quantile over a masked sort trick:
    we set invalid pixels to NaN and use nanmedian."""
    valid = depth > 0
    if opacity is not None:
        valid = valid & (opacity > 0.95)
    if mask is not None:
        valid = valid & mask
    vals = jnp.where(valid, depth, jnp.nan)
    med = jnp.nanmedian(vals)
    std = jnp.sqrt(jnp.nanmean((vals - med) ** 2))
    return med, std, valid


def depth_smoothness_loss(depth: jax.Array, gt_image: jax.Array) -> jax.Array:
    """Edge-aware depth smoothness (reference depth_reg,
    utils/slam_utils.py:42-55): depth gradients weighted by
    exp(-10 * image-gradient^2) on valid-gradient pixels."""
    from fourdgs.ops.image import image_gradient, image_gradient_mask

    gray = jnp.mean(gt_image, axis=0, keepdims=True)
    gray_v, gray_h = image_gradient(gray)
    d = depth[None]
    mask_v, mask_h = image_gradient_mask(d)
    depth_v, depth_h = image_gradient(d)
    w_v = jnp.exp(-10.0 * gray_v**2) * mask_v
    w_h = jnp.exp(-10.0 * gray_h**2) * mask_h
    nv = jnp.maximum(jnp.sum(mask_v), 1.0)
    nh = jnp.maximum(jnp.sum(mask_h), 1.0)
    return (
        jnp.sum(w_h * jnp.abs(depth_h)) / nh
        + jnp.sum(w_v * jnp.abs(depth_v)) / nv
    )
