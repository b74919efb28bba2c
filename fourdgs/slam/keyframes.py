"""Device-resident keyframe store and window management.

The reference keeps keyframe Cameras in per-process Python dicts and
ships them through mp.Queues (utils/slam_backend.py viewpoints,
slam_frontend.py current_window). Here keyframes live in one
fixed-capacity device pytree (images as uint8 to bound HBM) so the
jitted mapping loop can gather any keyframe — including the random
replay picks — without host round-trips.

Window policy (host-side, numpy): covisibility eviction and the
inverse-distance eviction of the reference `add_to_window`
(utils/slam_frontend.py:501-560), and the covisibility-overlap selection
`keyframe_selection_overlap` (utils/camera_utils.py:319-366).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs.slam.camera import Frame


class KeyframeStore(NamedTuple):
    images_u8: jax.Array   # (M, 3, H, W) uint8
    depths: jax.Array      # (M, H, W) f32
    motion: jax.Array      # (M, H, W) bool (True = static)
    times: jax.Array       # (M,)
    uids: jax.Array        # (M,) int32
    T_cw: jax.Array        # (M, 4, 4) current pose estimates
    exposure: jax.Array    # (M, 2)
    valid: jax.Array       # (M,) bool

    @property
    def capacity(self) -> int:
        return self.valid.shape[0]


def empty_store(capacity: int, height: int, width: int) -> KeyframeStore:
    return KeyframeStore(
        images_u8=jnp.zeros((capacity, 3, height, width), jnp.uint8),
        depths=jnp.zeros((capacity, height, width), jnp.float32),
        motion=jnp.ones((capacity, height, width), bool),
        times=jnp.zeros((capacity,), jnp.float32),
        uids=jnp.full((capacity,), -1, jnp.int32),
        T_cw=jnp.tile(jnp.eye(4, dtype=jnp.float32), (capacity, 1, 1)),
        exposure=jnp.zeros((capacity, 2), jnp.float32),
        valid=jnp.zeros((capacity,), bool),
    )


def store_keyframe(
    store: KeyframeStore, slot: int, frame: Frame, T_cw, exposure
) -> KeyframeStore:
    img = jnp.clip(frame.image * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
    return store._replace(
        images_u8=store.images_u8.at[slot].set(img),
        depths=store.depths.at[slot].set(frame.depth),
        motion=store.motion.at[slot].set(frame.motion_mask),
        times=store.times.at[slot].set(frame.time),
        uids=store.uids.at[slot].set(frame.uid),
        T_cw=store.T_cw.at[slot].set(T_cw),
        exposure=store.exposure.at[slot].set(jnp.asarray(exposure, jnp.float32)),
        valid=store.valid.at[slot].set(True),
    )


def fetch_image(store: KeyframeStore, slot) -> jax.Array:
    return store.images_u8[slot].astype(jnp.float32) / 255.0


# ---------------------------------------------------------------------------
# Host-side window policy (small-matrix math on numpy poses)
# ---------------------------------------------------------------------------


def is_keyframe(
    T_cur: np.ndarray,
    T_last_kf: np.ndarray,
    median_depth: float,
    cur_visibility: np.ndarray,
    last_kf_visibility: np.ndarray,
    kf_translation: float,
    kf_min_translation: float,
    kf_overlap: float,
) -> bool:
    """Translation + covisibility-IoU keyframe test (reference
    slam_frontend.py:472-499)."""
    rel = T_cur @ np.linalg.inv(T_last_kf)
    dist = float(np.linalg.norm(rel[:3, 3]))
    dist_check = dist > kf_translation * median_depth
    dist_check2 = dist > kf_min_translation * median_depth
    union = np.count_nonzero(cur_visibility | last_kf_visibility)
    inter = np.count_nonzero(cur_visibility & last_kf_visibility)
    ratio = inter / union if union > 0 else 0.0
    return bool((ratio < kf_overlap and dist_check2) or dist_check)


def add_to_window(
    cur_idx: int,
    cur_visibility: np.ndarray,
    occ_visibility: dict[int, np.ndarray],
    window: list[int],
    poses: dict[int, np.ndarray],
    kf_cutoff: float,
    window_size: int,
    initialized: bool = True,
) -> tuple[list[int], int | None]:
    """Window update (reference add_to_window, slam_frontend.py:501-560):
    prepend the new keyframe, evict the last low-overlap frame
    (Szymkiewicz-Simpson vs the current frame), then if over capacity
    evict the frame maximizing sqrt(d(i,0)) * sum_j 1/d(i,j)."""
    n_dont_touch = 2
    window = [cur_idx] + window
    removed = None
    to_remove = []
    for kf_idx in window[n_dont_touch:]:
        vis = occ_visibility[kf_idx]
        inter = np.count_nonzero(cur_visibility & vis)
        denom = min(np.count_nonzero(cur_visibility), np.count_nonzero(vis))
        cut = kf_cutoff if initialized else 0.4
        if denom == 0 or inter / denom <= cut:
            to_remove.append(kf_idx)
    if to_remove:
        window.remove(to_remove[-1])
        removed = to_remove[-1]

    if len(window) > window_size:
        inv_w2c_0 = np.linalg.inv(poses[cur_idx])
        scores = []
        for i in range(n_dont_touch, len(window)):
            kf_i = window[i]
            T_i = poses[kf_i]
            inv_dists = []
            for j in range(n_dont_touch, len(window)):
                if i == j:
                    continue
                T_ij = T_i @ np.linalg.inv(poses[window[j]])
                inv_dists.append(1.0 / (np.linalg.norm(T_ij[:3, 3]) + 1e-6))
            T_i0 = T_i @ inv_w2c_0
            k = float(np.sqrt(np.linalg.norm(T_i0[:3, 3])))
            scores.append(k * sum(inv_dists))
        idx = int(np.argmax(scores))
        removed = window[n_dont_touch + idx]
        window.remove(removed)
    return window, removed


def keyframe_selection_overlap(
    depth0: np.ndarray,
    T0: np.ndarray,
    intrinsics,
    candidate_poses: dict[int, np.ndarray],
    before_uid: int,
    max_selected: int,
    rng: np.random.Generator,
    sample_pixels: int = 1600,
) -> list[int]:
    """Project the anchor keyframe's depth into candidate keyframes and
    keep those with any overlap (reference keyframe_selection_overlap,
    utils/camera_utils.py:319-366). NOTE the reference's sort is dead
    code: it permutes ALL percent_inside > 0 candidates with
    np.random.permutation and takes the first 8-pose_window (:362-365) —
    this function reproduces exactly that (sort, filter > 0, permute,
    truncate). Subsamples pixels for speed (the reference projects all
    valid pixels)."""
    h, w = depth0.shape
    vs, us = np.nonzero(depth0 > 0)
    if vs.size == 0:
        return []
    if vs.size > sample_pixels:
        pick = rng.choice(vs.size, sample_pixels, replace=False)
        vs, us = vs[pick], us[pick]
    z = depth0[vs, us]
    x = (us - intrinsics.cx) * z / intrinsics.fx
    y = (vs - intrinsics.cy) * z / intrinsics.fy
    pts_cam = np.stack([x, y, z, np.ones_like(z)], axis=0)
    pts_w = np.linalg.inv(T0) @ pts_cam

    ranked = []
    for uid, T in candidate_poses.items():
        if uid >= before_uid:
            continue
        pc = (T @ pts_w)[:3]
        zc = pc[2] + 1e-5
        u = intrinsics.fx * pc[0] / zc + intrinsics.cx
        v = intrinsics.fy * pc[1] / zc + intrinsics.cy
        edge = 20
        ok = (u > edge) & (u < w - edge) & (v > edge) & (v < h - edge) & (zc > 0)
        ranked.append((uid, float(np.mean(ok))))
    ranked = [u for u, p in sorted(ranked, key=lambda t: -t[1]) if p > 0.0]
    return list(rng.permutation(np.array(ranked, dtype=np.int64)))[:max_selected] if ranked else []


# ---------------------------------------------------------------------------
# Depth-reprojection consistency mask
# ---------------------------------------------------------------------------


def _dilate3x3(mask: jax.Array, iters: int = 3) -> jax.Array:
    """Binary dilation by a 3x3 structuring element, `iters` times
    (reference: three F.conv2d passes with a ones(3,3) kernel,
    utils/camera_utils.py:300-306)."""
    m = mask
    for _ in range(iters):
        m = jax.lax.reduce_window(
            m, False, jax.lax.bitwise_or,
            window_dimensions=(3, 3), window_strides=(1, 1), padding="SAME",
        )
    return m


def reproject_mask(
    anchor_depth: jax.Array,   # (H, W) f32 — anchor keyframe GT depth
    anchor_static: jax.Array,  # (H, W) bool — anchor motion mask (True = static)
    T_anchor_cw: jax.Array,    # (4, 4) anchor world->camera
    T_curr_cw: jax.Array,      # (4, 4) current-view world->camera
    fx: float, fy: float, cx: float, cy: float,
) -> jax.Array:
    """Depth-reprojection consistency mask (reference
    utils/camera_utils.py:267-317 `Camera.reproject_mask`): back-project
    the anchor keyframe's valid static depth, reproject into the current
    view, mark hit pixels, dilate 3x with a 3x3 kernel, and return the
    complement — True on pixels the anchor's static geometry does NOT
    cover. The reference computes it under no_grad when `rm_initdy` in
    map/map_static (slam_backend.py:465-469,586-590,1063-1067) and ANDs
    it into the rgb/depth loss masks (slam_utils.py:292-294).

    Degenerate anchor (no valid static depth) returns all-True, like the
    reference's early exit (camera_utils.py:275-276).
    """
    H, W = anchor_depth.shape
    ys, xs = jnp.mgrid[0:H, 0:W]
    valid = (anchor_depth > 0) & anchor_static
    d = anchor_depth
    # back-project to anchor camera space, then world
    x_c = (xs - cx) / fx * d
    y_c = (ys - cy) / fy * d
    pts_c = jnp.stack([x_c, y_c, d, jnp.ones_like(d)], axis=-1).reshape(-1, 4)
    T_wc = jnp.linalg.inv(T_anchor_cw)
    pts_curr = (pts_c @ T_wc.T) @ T_curr_cw.T      # (H*W, 4) current cam
    z = pts_curr[:, 2] + 1e-5
    u = pts_curr[:, 0] / z * fx + cx
    v = pts_curr[:, 1] / z * fy + cy
    # torch .long() truncates toward zero; inputs here are >= -eps before
    # the bounds check so int32 cast matches
    iu = u.astype(jnp.int32)
    iv = v.astype(jnp.int32)
    ok = (
        valid.reshape(-1)
        & (z > 1e-5)
        & (iu >= 0) & (iu < W) & (iv >= 0) & (iv < H)
        & (u >= 0) & (v >= 0)
    )
    # route rejected points out of bounds; scatter-drop ignores them
    iu = jnp.where(ok, iu, W)
    iv = jnp.where(ok, iv, H)
    hit = jnp.zeros((H, W), bool).at[iv, iu].set(True, mode="drop")
    hit = _dilate3x3(hit, 3)
    # all-invalid anchor -> keep everything (reference early exit)
    return jnp.where(jnp.any(valid), ~hit, True)


reproject_mask = jax.jit(reproject_mask, static_argnames=("fx", "fy", "cx", "cy"))
