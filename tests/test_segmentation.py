import numpy as np

from fourdgs.perception.segmentation import (
    MotionSegmenter,
    NullSegmenter,
    make_segmenter,
)
from fourdgs.slam.camera import Intrinsics
from fourdgs.utils.config import ConfigDict

INTR = Intrinsics(fx=60.0, fy=60.0, cx=31.5, cy=23.5, width=64, height=48)


def test_null_segmenter():
    seg = NullSegmenter()
    assert not seg(np.zeros((48, 64, 3), np.uint8)).any()


def test_make_segmenter_falls_back():
    cfg = ConfigDict.wrap({"Dataset": {"seg_chair": True}})
    seg = make_segmenter(cfg, INTR)
    # ultralytics is not installed in this image -> residual fallback
    assert isinstance(seg, MotionSegmenter)


def test_motion_segmenter_detects_moving_patch():
    """Static textured background + a patch that moves between frames
    while the camera stays still."""
    rng = np.random.default_rng(0)
    h, w = 48, 64
    bg = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
    depth = np.full((h, w), 2.0, np.float32)
    T = np.eye(4)

    f1 = bg.copy()
    f1[10:25, 10:25] = 255
    f2 = bg.copy()
    f2[10:25, 25:40] = 255  # patch moved right

    seg = MotionSegmenter(INTR, residual_threshold=0.1, min_region=30)
    m1 = seg.update(f1, depth, T)
    assert not m1.any()  # first frame: no history
    m2 = seg.update(f2, depth, T)
    # detected region overlaps the union of old/new patch positions
    region = np.zeros((h, w), bool)
    region[8:27, 8:42] = True
    assert m2.sum() > 50
    assert (m2 & region).sum() / max(m2.sum(), 1) > 0.8


def test_motion_segmenter_static_scene_quiet():
    rng = np.random.default_rng(1)
    h, w = 48, 64
    bg = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
    depth = np.full((h, w), 2.0, np.float32)
    seg = MotionSegmenter(INTR, residual_threshold=0.1, min_region=30)
    seg.update(bg, depth, np.eye(4))
    m = seg.update(bg, depth, np.eye(4))
    assert m.sum() == 0
