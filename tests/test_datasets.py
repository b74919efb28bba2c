import numpy as np
import pytest

from fourdgs.utils.config import ConfigDict


def _syn_cfg(num_frames=6, w=64, h=48):
    return ConfigDict.wrap(
        {
            "Dataset": {
                "type": "synthetic",
                "sensor_type": "depth",
                "num_frames": num_frames,
                "points_per_wall": 800,
                "dynamic": True,
                "Calibration": {
                    "fx": 64.0, "fy": 64.0, "cx": (w - 1) / 2, "cy": (h - 1) / 2,
                    "width": w, "height": h, "depth_scale": 1.0, "distorted": False,
                },
            },
        }
    )


def test_synthetic_dataset_frames():
    from fourdgs.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(None, "", _syn_cfg())
    assert len(ds) == 6
    img, depth, pose, motion = ds[0]
    assert img.shape == (3, 48, 64) and img.dtype == np.float32
    assert depth.shape == (48, 64)
    assert pose.shape == (4, 4)
    assert motion.shape == (48, 64) and motion.dtype == bool
    assert 0.2 < img.mean() < 0.9
    assert np.count_nonzero(depth > 0) > 0.5 * depth.size
    # dynamic blob produces a non-trivial motion mask in some frame
    any_dynamic = any(np.count_nonzero(~ds[i][3]) > 0 for i in range(6))
    assert any_dynamic


def test_tum_parser_roundtrip(tmp_path):
    """Write a synthetic sequence in TUM layout and reparse it."""
    from fourdgs.data.synthetic import SyntheticDataset, write_tum_format
    from fourdgs.data.tum import TUMDataset

    cfg = _syn_cfg(num_frames=5)
    syn = SyntheticDataset(None, "", cfg)
    out = str(tmp_path / "tum_seq")
    write_tum_format(syn, out, depth_scale=5000.0)

    tum_cfg = ConfigDict.wrap(
        {
            "Dataset": {
                "type": "tum",
                "sensor_type": "depth",
                "dataset_path": out,
                "Calibration": dict(cfg["Dataset"]["Calibration"], depth_scale=5000.0),
            }
        }
    )
    ds = TUMDataset(None, out, tum_cfg)
    assert len(ds) == 5
    img, depth, pose, motion = ds[0]
    img0, depth0, pose0, _ = syn[0]
    # color round-trips through PNG (u8 quantization)
    np.testing.assert_allclose(img, img0, atol=2 / 255)
    # depth through 16-bit PNG at depth_scale resolution
    np.testing.assert_allclose(depth, depth0, atol=2e-3)
    # poses through quaternion round trip
    np.testing.assert_allclose(pose, pose0, atol=1e-4)


def test_load_dataset_factory():
    from fourdgs.data import load_dataset

    ds = load_dataset(None, "", _syn_cfg())
    assert len(ds) == 6
