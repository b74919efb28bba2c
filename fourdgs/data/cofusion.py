"""CoFusion sequence loader (reference utils/dataset.py:490-679): colour/
depth_noise(.exr)|depth(.png) directories, gt-cam-0.txt trajectory,
mask_colour ground-truth dynamic masks, start/end frame windows."""

from __future__ import annotations

import glob
import os

import numpy as np
from PIL import Image

from fourdgs.data.base import BaseDataset
from fourdgs.data.tum import quat_to_mat

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def read_exr_depth(path: str) -> np.ndarray:
    """Single-channel depth from an EXR (reference readEXR_onlydepth).
    Uses OpenCV's EXR reader (no OpenEXR module in this image)."""
    if cv2 is None:
        raise RuntimeError("cv2 unavailable; cannot read EXR depth")
    os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
    img = cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
    if img is None:
        raise RuntimeError(f"failed to read EXR: {path}")
    if img.ndim == 3:
        img = img[..., 0]
    return img.astype(np.float32)


class CoFusionDataset(BaseDataset):
    def __init__(self, args, path: str, config):
        super().__init__(args, path, config)
        folder = path
        self.color_paths = sorted(glob.glob(os.path.join(folder, "colour", "*.png")))
        self.depth_paths = sorted(
            glob.glob(os.path.join(folder, "depth_noise", "*.exr"))
            + glob.glob(os.path.join(folder, "depth", "*.png"))
        )
        self.mask_paths = sorted(glob.glob(os.path.join(folder, "mask_colour", "*.png")))
        self.num_imgs = len(self.color_paths)
        self._load_poses(os.path.join(folder, "trajectories"))

        calib = config["Dataset"]["Calibration"]
        start = calib.get("start", 0)
        end = calib.get("end", self.num_imgs)
        if end == -1:
            end = self.num_imgs
        self.color_paths = self.color_paths[start:end]
        self.depth_paths = self.depth_paths[start:end]
        self.poses = self.poses[start:end]
        if self.mask_paths:
            self.mask_paths = self.mask_paths[start:end]
        self.num_imgs = len(self.color_paths)

    def _load_poses(self, traj_dir: str):
        self.poses = []
        pose_file = os.path.join(traj_dir, "gt-cam-0.txt")
        if os.path.isfile(pose_file):
            vecs = np.loadtxt(pose_file, dtype=np.float64)
            for i in range(self.num_imgs):
                trans = vecs[i][1:4]
                quat = vecs[i][4:8]  # xyzw
                T = quat_to_mat(quat)
                T[:3, 3] = trans
                self.poses.append(np.linalg.inv(T))
        else:
            self.poses = [np.eye(4) for _ in range(self.num_imgs)]

    def _read_depth(self, idx: int) -> np.ndarray:
        p = self.depth_paths[idx]
        if p.endswith(".exr"):
            d = read_exr_depth(p)
        else:
            d = np.array(Image.open(p)).astype(np.float32)
        return d / self.depth_scale

    def __getitem__(self, idx: int):
        image, depth, pose, motion_mask = super().__getitem__(idx)
        if self.mask_paths:
            m = np.array(Image.open(self.mask_paths[idx]).convert("L"))
            dynamic = m > 255 * 0.01
            motion_mask = ~dynamic
        return image, depth, pose, motion_mask
