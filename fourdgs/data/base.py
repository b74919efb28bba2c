"""Dataset layer: RGB-D sequence loaders returning numpy frames.

Counterpart of the reference utils/dataset.py (976 LoC): per-dataset
parsers + indexable datasets returning (image, depth, w2c pose,
motion_mask). Differences by design:

  - frames come back as numpy (host); the SLAM runner moves them to HBM
    through the double-buffered prefetcher (fourdgs/data/prefetch.py)
    instead of the reference's per-access .cuda() copies,
  - the YOLO person/chair segmentation hook is pluggable (a callable
    image -> bool mask); when the segmenter is unavailable the mask is
    all-static, matching the reference with YOLO disabled,
  - motion_mask is True on STATIC pixels (reference dataset.py:352-373
    returns ~person_mask the same way).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from PIL import Image


MaskFn = Callable[[np.ndarray], np.ndarray]  # (H,W,3) uint8 -> (H,W) bool dynamic


class BaseDataset:
    """Indexable RGB-D dataset. Subclasses fill color_paths, depth_paths,
    poses (w2c, 4x4 float64)."""

    def __init__(self, args, path: str, config):
        self.args = args
        self.path = path
        self.config = config
        self.device = "tpu"
        calibration = config["Dataset"]["Calibration"]
        self.fx = calibration["fx"]
        self.fy = calibration["fy"]
        self.cx = calibration["cx"]
        self.cy = calibration["cy"]
        self.width = calibration["width"]
        self.height = calibration["height"]
        self.depth_scale = calibration.get("depth_scale", 1.0)
        self.has_depth = config["Dataset"].get("sensor_type", "depth") == "depth"

        self.distorted = calibration.get("distorted", False)
        self.dist_coeffs = np.array(
            [
                calibration.get("k1", 0.0),
                calibration.get("k2", 0.0),
                calibration.get("p1", 0.0),
                calibration.get("p2", 0.0),
                calibration.get("k3", 0.0),
            ]
        )
        self.K = np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]]
        )
        if self.distorted and cv2 is not None:
            self.map1x, self.map1y = cv2.initUndistortRectifyMap(
                self.K, self.dist_coeffs, np.eye(3), self.K,
                (self.width, self.height), cv2.CV_32FC1,
            )
        else:
            self.map1x = self.map1y = None

        # fovs (reference dataset.py:66-69)
        self.fovx = 2 * np.arctan(self.width / (2 * self.fx))
        self.fovy = 2 * np.arctan(self.height / (2 * self.fy))

        self.color_paths: list[str] = []
        self.depth_paths: list[str] = []
        self.poses: list[np.ndarray] = []
        self.num_imgs = 0
        # segmentation hooks (set by the runner; see fourdgs/perception)
        self.mask_fn: Optional[MaskFn] = None
        self.seg_chair = bool(config["Dataset"].get("seg_chair", False))
        self.seg_clock = bool(config["Dataset"].get("seg_clock", False))
        self.seg_teddy = bool(config["Dataset"].get("seg_teddy", False))

    def __len__(self) -> int:
        return self.num_imgs

    def _read_color(self, idx: int) -> np.ndarray:
        img = np.array(Image.open(self.color_paths[idx]))[..., :3]
        if self.map1x is not None:
            img = cv2.remap(img, self.map1x, self.map1y, cv2.INTER_LINEAR)
        return img

    def _read_depth(self, idx: int) -> np.ndarray:
        return np.array(Image.open(self.depth_paths[idx])).astype(np.float32) / self.depth_scale

    def __getitem__(self, idx: int):
        img_u8 = self._read_color(idx)
        image = np.clip(img_u8.astype(np.float32) / 255.0, 0.0, 1.0).transpose(2, 0, 1)
        depth = self._read_depth(idx) if self.has_depth else None
        pose = self.poses[idx]
        h, w = image.shape[1], image.shape[2]
        if not hasattr(self, "_mask_cache"):
            self._mask_cache = {}
        if idx in self._mask_cache:
            dynamic = self._mask_cache[idx]
        else:
            dynamic = np.zeros((h, w), bool)
            if self.mask_fn is not None:
                try:
                    # stateful geometric segmenters consume depth; their
                    # pose comes from their own pose_provider (tracked
                    # estimates) — the dataset NEVER leaks GT poses into
                    # segmentation
                    dynamic = self.mask_fn(img_u8, depth)
                except TypeError:
                    dynamic = self.mask_fn(img_u8)
            self._mask_cache[idx] = dynamic
        motion_mask = ~dynamic
        return image, depth, pose, motion_mask


def load_dataset(args, path: str, config) -> BaseDataset:
    """Factory matching reference utils/dataset.py:962-976."""
    from fourdgs.data.cofusion import CoFusionDataset
    from fourdgs.data.synthetic import SyntheticDataset
    from fourdgs.data.tum import TUMDataset

    dtype = config["Dataset"]["type"]
    if dtype == "tum":
        return TUMDataset(args, path, config)
    if dtype == "CoFusion":
        return CoFusionDataset(args, path, config)
    if dtype == "synthetic":
        return SyntheticDataset(args, path, config)
    if dtype == "realsense":
        return RealsenseDataset(args, path, config)
    raise ValueError(f"Unknown dataset type: {dtype}")


def RealsenseDataset(args, path, config):
    """Live RGB-D capture — full implementation in
    fourdgs/data/realsense.py (reference utils/dataset.py:721-811).
    Imported lazily: pyrealsense2 is absent in CI and the module's
    constructor raises a clear RuntimeError there."""
    from fourdgs.data.realsense import RealsenseDataset as _RS

    return _RS(args, path, config)
