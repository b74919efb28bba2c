"""Dynamic-object segmentation providers (the reference's YOLOv9-seg
role: person/chair/clock/teddy masks fused into motion_mask,
utils/dataset.py:352-373, slam.py:80).

Providers return a (H, W) bool DYNAMIC mask from an (H, W, 3) uint8 frame:

  - `Yolov9SegSegmenter`: TPU-native — the same yolov9e-seg checkpoint
    executed as a pure-JAX inference graph (fourdgs/perception/yolov9.py,
    converter + module set parity-tested in tests/test_yolov9_parity.py).
    Preferred whenever the .pt weights resolve (only torch's unpickler is
    needed for loading; inference is jitted JAX),
  - `UltralyticsSegmenter`: the reference's exact path (YOLO
    'yolov9e-seg.pt' predict on configured class ids) when the
    `ultralytics` package + checkpoint are installed — neither ships in
    this zero-egress image, so it is gated,
  - `MotionSegmenter`: a dependency-free fallback that works here —
    ego-motion-compensated RGB-D frame differencing: the previous frame
    is warped into the current one with the depth + tracked poses, and
    coherent high-residual regions (box-filtered, thresholded, largest
    connected blobs) are flagged dynamic. This is a TPU-era take on the
    classic geometric residual segmentation used by dynamic-SLAM systems
    when no learned segmenter is available,
  - `NullSegmenter`: everything static (= reference with YOLO disabled).

COCO class ids mirror the reference: person 0, chair 56, clock 74,
teddy bear 77.
"""

from __future__ import annotations

import numpy as np

PERSON, CHAIR, CLOCK, TEDDY = 0, 56, 74, 77


class NullSegmenter:
    def __call__(self, img_u8: np.ndarray) -> np.ndarray:
        return np.zeros(img_u8.shape[:2], bool)


class Yolov9SegSegmenter:
    """Pure-JAX YOLOv9-seg inference on the ultralytics checkpoint
    (reference surface: slam.py:80 + utils/dataset.py:352-373, folded
    into the JAX process per the BASELINE north star)."""

    def __init__(self, weights: str = "pretrained/yolov9e-seg.pt",
                 classes=(PERSON,), conf: float = 0.25):
        from fourdgs.perception.yolov9 import load_yolov9

        self.model = load_yolov9(weights)  # raises if weights absent
        self.classes = list(classes)
        self.conf = conf

    def __call__(self, img_u8: np.ndarray) -> np.ndarray:
        chw = img_u8[..., :3].astype(np.float32).transpose(2, 0, 1) / 255.0
        return self.model.segment(chw, self.classes, conf=self.conf)


class UltralyticsSegmenter:
    """Reference-parity YOLO segmentation (requires ultralytics + weights)."""

    def __init__(self, weights: str = "pretrained/yolov9e-seg.pt",
                 classes=(PERSON,), conf: float = 0.25):
        from ultralytics import YOLO  # gated import

        self.model = YOLO(weights)
        self.classes = list(classes)
        self.conf = conf

    def __call__(self, img_u8: np.ndarray) -> np.ndarray:
        h, w = img_u8.shape[:2]
        combined = np.zeros((h, w), bool)
        results = self.model.predict(
            source=img_u8, classes=self.classes, conf=self.conf,
            save=False, stream=False, verbose=False,
        )
        for result in results:
            if result.masks is None:
                continue
            for m in result.masks.data:
                mm = np.asarray(m).astype(bool)
                if mm.shape != (h, w):
                    try:
                        import cv2

                        mm = cv2.resize(
                            mm.astype(np.uint8), (w, h)
                        ).astype(bool)
                    except Exception:
                        continue
                combined |= mm
        return combined


class MotionSegmenter:
    """Ego-motion-compensated residual segmentation.

    Stateful: feed frames in order via update(img, depth, T_cw); __call__
    with just an image reuses the most recent geometry."""

    def __init__(self, intrinsics, residual_threshold: float = 0.12,
                 min_region: int = 200, pose_provider=None):
        self.intr = intrinsics
        self.th = residual_threshold
        self.min_region = min_region
        self._prev = None  # (gray, depth, T_cw)
        # pose_provider: () -> (4,4) w2c estimate for the INCOMING frame.
        # On a real run this is the runner's constant-velocity prediction
        # from TRACKED poses — never the dataset's GT pose (which would
        # quietly GT-assist the segmentation).
        self.pose_provider = pose_provider

    @staticmethod
    def _gray(img_u8: np.ndarray) -> np.ndarray:
        return img_u8[..., :3].astype(np.float32).mean(-1) / 255.0

    def update(self, img_u8: np.ndarray, depth: np.ndarray, T_cw: np.ndarray) -> np.ndarray:
        gray = self._gray(img_u8)
        mask = np.zeros(gray.shape, bool)
        if self._prev is not None and depth is not None:
            pg, pd, pT = self._prev
            mask = self._segment(gray, depth, T_cw, pg, pd, pT)
        self._prev = (gray, depth, np.asarray(T_cw))
        return mask

    def _segment(self, gray, depth, T_cw, prev_gray, prev_depth, prev_T):
        intr = self.intr
        h, w = gray.shape
        v, u = np.mgrid[0:h, 0:w].astype(np.float32)
        z = depth
        valid = z > 0
        x = (u - intr.cx) * z / intr.fx
        y = (v - intr.cy) * z / intr.fy
        pc = np.stack([x, y, z], -1).reshape(-1, 3)
        # current cam -> world -> previous cam
        R, t = T_cw[:3, :3], T_cw[:3, 3]
        pw = (pc - t) @ R
        pp = pw @ prev_T[:3, :3].T + prev_T[:3, 3]
        zp = np.maximum(pp[:, 2], 1e-6)
        up = (intr.fx * pp[:, 0] / zp + intr.cx).reshape(h, w)
        vp = (intr.fy * pp[:, 1] / zp + intr.cy).reshape(h, w)
        ui = np.clip(np.round(up).astype(int), 0, w - 1)
        vi = np.clip(np.round(vp).astype(int), 0, h - 1)
        warped = prev_gray[vi, ui]
        inb = (up >= 0) & (up < w) & (vp >= 0) & (vp < h)
        resid = np.abs(gray - warped) * (valid & inb)

        # box filter for coherence
        k = 5
        pad = np.pad(resid, k // 2, mode="edge")
        csum = np.cumsum(np.cumsum(pad, 0), 1)
        csum = np.pad(csum, ((1, 0), (1, 0)))
        box = (
            csum[k:, k:] - csum[:-k, k:] - csum[k:, :-k] + csum[:-k, :-k]
        ) / (k * k)
        raw = box > self.th
        return self._filter_regions(raw)

    def _filter_regions(self, raw: np.ndarray) -> np.ndarray:
        # native C++ union-find CC filter (fourdgs/native) — this runs
        # per frame on the host prefetch thread, the one hot path that
        # is NOT jitted; scipy fallback, then a crude global count
        try:
            from fourdgs.native import has_native, region_filter

            if has_native():
                return region_filter(raw, self.min_region)
        except Exception:
            pass
        try:
            from scipy.ndimage import label

            lab, n = label(raw)
            out = np.zeros_like(raw)
            for i in range(1, n + 1):
                if (lab == i).sum() >= self.min_region:
                    out |= lab == i
            return out
        except Exception:
            return raw if raw.sum() >= self.min_region else np.zeros_like(raw)

    def __call__(self, img_u8: np.ndarray, depth: np.ndarray | None = None) -> np.ndarray:
        if depth is not None and self.pose_provider is not None:
            return self.update(img_u8, depth, np.asarray(self.pose_provider()))
        # no pose source: no geometry to compensate with
        return np.zeros(img_u8.shape[:2], bool)


def make_segmenter(config, intrinsics):
    """Pick a provider matching the reference's config surface: YOLO when
    available, residual fallback otherwise; classes from seg_* flags."""
    ds = config["Dataset"]
    classes = [PERSON]
    if ds.get("seg_chair"):
        classes.append(CHAIR)
    if ds.get("seg_clock"):
        classes.append(CLOCK)
    if ds.get("seg_teddy"):
        classes.append(TEDDY)
    weights = ds.get("yolo_weights", "pretrained/yolov9e-seg.pt")
    try:
        return Yolov9SegSegmenter(weights, classes=tuple(classes))
    except Exception:
        pass
    try:
        return UltralyticsSegmenter(weights, classes=tuple(classes))
    except Exception:
        return MotionSegmenter(intrinsics)
