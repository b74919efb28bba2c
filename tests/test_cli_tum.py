"""Real-data-path CLI e2e: a dynamic synthetic sequence materialized in
TUM RGB-D layout (rgb.txt/depth.txt association, 16-bit depth at
depth_scale=5000, groundtruth.txt), run through the full CLI
(`--eval --dynamic`) with TUMDataset -> prefetch -> SLAM and the
geometric MotionSegmenter fed TRACKED poses only (no GT leakage).

This exercises what the synthetic-dataset e2e can't: association
parsing, depth scaling, PNG round trips, and the segmentation-mask
plumbing of the real dataset layer (reference utils/dataset.py:85-180,
319-373)."""

import json
import os
import sys

import pytest

import numpy as np
import yaml


pytestmark = pytest.mark.slow


def test_slam_cli_tum_dynamic(tmp_path, monkeypatch):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import slam as slam_cli

    from fourdgs.data.synthetic import SyntheticDataset, write_tum_format
    from fourdgs.utils.config import ConfigDict

    w, h, n = 64, 48, 10
    syn_cfg = ConfigDict.wrap(
        {
            "Dataset": {
                "type": "synthetic",
                "sensor_type": "depth",
                "num_frames": n,
                "dynamic": True,
                "points_per_wall": 1500,
                "Calibration": {
                    "fx": 80.0, "fy": 80.0, "cx": (w - 1) / 2, "cy": (h - 1) / 2,
                    "width": w, "height": h, "depth_scale": 1.0,
                    "distorted": False,
                },
            }
        }
    )
    syn = SyntheticDataset(None, "", syn_cfg)
    seq_dir = str(tmp_path / "tum_seq")
    write_tum_format(syn, seq_dir, depth_scale=5000.0)

    config = {
        "Results": {
            "save_results": True, "save_dir": str(tmp_path / "results"),
            "save_trj": True, "save_trj_kf_intv": 5, "use_gui": False,
            "eval_rendering": True, "use_wandb": False,
        },
        "Dataset": {
            "type": "tum",
            "sensor_type": "depth",
            "dataset_path": seq_dir,
            "pcd_downsample": 16,
            "pcd_downsample_init": 8,
            "adaptive_pointsize": True,
            "point_size": 0.05,
            "Calibration": {
                "fx": 80.0, "fy": 80.0, "cx": (w - 1) / 2, "cy": (h - 1) / 2,
                "width": w, "height": h, "depth_scale": 5000.0,
                "distorted": False,
            },
        },
        "Training": {
            "init_itr_num": 30, "init_gaussian_update": 40,
            "init_gaussian_reset": 2000, "init_gaussian_th": 0.005,
            "init_gaussian_extent": 30, "tracking_itr_num": 20,
            "mapping_itr_num": 10, "keyframe_mapping_iters": 10,
            "gaussian_update_every": 10000, "gaussian_update_offset": 50,
            "gaussian_th": 0.7, "gaussian_extent": 1.0,
            "gaussian_reset": 20001, "size_threshold": 20,
            "kf_interval": 5, "window_size": 3, "pose_window": 2,
            "edge_threshold": 1.1, "rgb_boundary_threshold": 0.01,
            "alpha": 0.9, "kf_translation": 0.08,
            "kf_min_translation": 0.05, "kf_overlap": 0.9, "kf_cutoff": 0.3,
            "single_thread": True, "monocular": False,
            # deformation off until frame horizon (tiny CPU run: exercise
            # the dynamic data path + masks, not the deform schedule)
            "dystart": 100,
            "refinement_iters": 50,
            "lr": {"cam_rot_delta": 0.003, "cam_trans_delta": 0.001},
        },
        "opt_params": {"densify_grad_threshold": 0.0002},
        "model_params": {"sh_degree": 0, "dynamic_model": True},
    }
    cfg_path = str(tmp_path / "tum_dyn.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    monkeypatch.chdir(tmp_path)
    metrics = slam_cli.main(
        ["--config", cfg_path, "--eval", "--dynamic", "--interval", "5",
         "--capacity", "4096"]
    )
    assert metrics["n_frames"] == n
    # TUM association + depth_scale + pose conventions all correct =>
    # tracking stays sane on the round-tripped sequence
    assert "ate_rmse" in metrics and metrics["ate_rmse"] < 0.2, metrics
    assert metrics["psnr_after"] is not None

    runs = [d for d in (tmp_path / "results").iterdir() if d.is_dir()]
    assert runs, "no run directory created"
    run = runs[0]
    assert (run / "config.yml").exists()
    assert (run / "pose.txt").exists()
    final = json.load(open(run / "final_result.json"))
    assert np.isfinite(final["ate_rmse"])
    # full reference artifact set (eval_utils.py:221-428): evo-style ATE
    # stats + per-frame trajectories under plot/, per-phase rendering
    # metrics under psnr/<label>/, and the final PLY export
    stats = json.load(open(run / "plot" / "stats_final.json"))
    assert np.isfinite(stats["rmse"])
    trj = json.load(open(run / "plot" / "trj_final.json"))
    assert len(trj["trj_est"]) == len(trj["trj_gt"]) == len(trj["trj_id"])
    for label in ("before_opt", "after_opt"):
        r = json.load(open(run / "psnr" / label / "final_result.json"))
        assert np.isfinite(r["mean_psnr"])
    assert (run / "point_cloud" / "final" / "point_cloud.ply").exists()


def test_motion_segmenter_uses_tracked_poses(tmp_path):
    """The dataset must never hand GT poses to the segmenter: without a
    pose_provider the geometric fallback returns empty masks; with one it
    consumes the provider's (tracked) pose."""
    from fourdgs.perception.segmentation import MotionSegmenter
    from fourdgs.slam.camera import Intrinsics

    intr = Intrinsics(fx=80.0, fy=80.0, cx=39.5, cy=29.5, width=80, height=60)
    seg = MotionSegmenter(intr)
    img = np.random.default_rng(0).integers(0, 255, (60, 80, 3), np.uint8)
    depth = np.full((60, 80), 2.0, np.float32)
    # no pose provider -> no geometry -> empty mask (NOT a GT-pose path)
    assert not seg(img, depth).any()

    calls = []

    def provider():
        calls.append(1)
        return np.eye(4, dtype=np.float32)

    seg2 = MotionSegmenter(intr, pose_provider=provider)
    seg2(img, depth)
    seg2(img, depth)
    assert calls, "segmenter never consulted the tracked-pose provider"
