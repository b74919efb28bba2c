"""Optical-flow plumbing: providers, consistency masks, per-pair cache.

Counterpart of the reference's per-keyframe lazily cached RAFT flow
(utils/camera_utils.py:368-436 generate_flow / compute_fwdbwd_mask). Flow
providers are pluggable:

  - `RaftFlowProvider` (fourdgs/perception/raft.py) when checkpoint
    weights are available,
  - `SyntheticFlowProvider` computes EXACT flow for the synthetic
    dataset (camera reprojection + known blob motion), giving the 4D
    pipeline a ground-truth supervision signal in this zero-egress
    container,
  - any callable (img1, img2) -> (flow_fwd, flow_bwd) in pixel units.

Flows are normalized to the reference's units (px / [W, H] * 2 —
camera_utils.py:399-401) before entering the flow loss.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def warp_flow(img: np.ndarray, flow: np.ndarray) -> np.ndarray:
    """Backward-warp img by flow (reference warp_flow,
    camera_utils.py:412-419). Falls back to nearest-neighbour gathers if
    cv2 is unavailable."""
    h, w = flow.shape[:2]
    grid = flow.copy()
    grid[:, :, 0] += np.arange(w)
    grid[:, :, 1] += np.arange(h)[:, None]
    if cv2 is not None:
        return cv2.remap(
            img, grid.astype(np.float32), None, cv2.INTER_CUBIC,
            borderMode=cv2.BORDER_CONSTANT,
        )
    xi = np.clip(np.round(grid[:, :, 0]).astype(int), 0, w - 1)
    yi = np.clip(np.round(grid[:, :, 1]).astype(int), 0, h - 1)
    return img[yi, xi]


def compute_fwdbwd_mask(fwd_flow: np.ndarray, bwd_flow: np.ndarray,
                        alpha_1: float = 0.5, alpha_2: float = 0.5):
    """Forward-backward consistency masks (camera_utils.py:421-436)."""
    bwd2fwd = warp_flow(bwd_flow, fwd_flow)
    fwd_err = np.linalg.norm(fwd_flow + bwd2fwd, axis=-1)
    fwd_mask = fwd_err < alpha_1 * (
        np.linalg.norm(fwd_flow, axis=-1) + np.linalg.norm(bwd2fwd, axis=-1)
    ) + alpha_2
    fwd2bwd = warp_flow(fwd_flow, bwd_flow)
    bwd_err = np.linalg.norm(bwd_flow + fwd2bwd, axis=-1)
    bwd_mask = bwd_err < alpha_1 * (
        np.linalg.norm(bwd_flow, axis=-1) + np.linalg.norm(fwd2bwd, axis=-1)
    ) + alpha_2
    return fwd_mask, bwd_mask


def normalize_flow(flow_px: np.ndarray) -> np.ndarray:
    """(H, W, 2) pixel flow -> reference NDC-ish units: px/[W,H]*2."""
    h, w = flow_px.shape[:2]
    return flow_px / np.array([w, h], np.float32) * 2.0


class FlowCache:
    """Per-(uid1, uid2) flow cache (the reference caches on the Camera).
    Returns ((2,H,W) fwd, (2,H,W) bwd, fwd_mask, bwd_mask) in normalized
    units, channel-first for the loss."""

    def __init__(self, provider):
        self.provider = provider
        self._cache: dict[tuple[int, int], tuple] = {}

    def get(self, uid1: int, uid2: int, img1=None, img2=None):
        key = (uid1, uid2)
        if key not in self._cache:
            fwd_px, bwd_px = self.provider(uid1, uid2, img1, img2)
            fwd_mask, bwd_mask = compute_fwdbwd_mask(fwd_px, bwd_px)
            fwd = normalize_flow(fwd_px).transpose(2, 0, 1)
            bwd = normalize_flow(bwd_px).transpose(2, 0, 1)
            self._cache[key] = (fwd, bwd, fwd_mask, bwd_mask)
        return self._cache[key]


class SyntheticFlowProvider:
    """Exact optical flow for the synthetic dataset: every pixel of frame
    `uid1` is backprojected with its GT depth, advected by the known blob
    motion if dynamic, and reprojected into frame `uid2`."""

    def __init__(self, dataset):
        self.dataset = dataset

    def _flow(self, uid_a: int, uid_b: int) -> np.ndarray:
        from fourdgs.data.synthetic import blob_offset

        ds = self.dataset
        img, depth, T_a, motion = ds[uid_a]
        T_b = ds.poses[uid_b]
        h, w = depth.shape
        v, u = np.mgrid[0:h, 0:w].astype(np.float32)
        z = depth
        x = (u - ds.cx) * z / ds.fx
        y = (v - ds.cy) * z / ds.fy
        pc = np.stack([x, y, z], -1).reshape(-1, 3)
        Ra, ta = T_a[:3, :3], T_a[:3, 3]
        pw = (pc - ta) @ Ra
        if ds.blob is not None:
            t_a = uid_a / max(ds.num_imgs - 1, 1)
            t_b = uid_b / max(ds.num_imgs - 1, 1)
            delta = blob_offset(t_b) - blob_offset(t_a)
            dyn = (~motion).reshape(-1)
            pw = pw + dyn[:, None] * delta[None]
        pb = pw @ T_b[:3, :3].T + T_b[:3, 3]
        zb = np.maximum(pb[:, 2], 1e-6)
        ub = ds.fx * pb[:, 0] / zb + ds.cx
        vb = ds.fy * pb[:, 1] / zb + ds.cy
        flow = np.stack([ub - u.reshape(-1), vb - v.reshape(-1)], -1)
        flow = flow.reshape(h, w, 2).astype(np.float32)
        flow[depth <= 0] = 0.0
        return flow

    def __call__(self, uid1: int, uid2: int, img1=None, img2=None):
        # convention from the reference flow usage (generate_flow(image,
        # image_last)): fwd = pair(uid2) -> view(uid1), bwd = view -> pair
        return self._flow(uid2, uid1), self._flow(uid1, uid2)
