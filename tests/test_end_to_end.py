"""Integration: full SLAM on a synthetic sequence (CPU, tiny shapes).

The container has no dataset downloads, so this is the analogue of
BASELINE config #1 (TUM fr3_sitting_static, static mode, CPU): run
tracking+mapping end-to-end and check ATE and PSNR against thresholds.
"""

import numpy as np
import pytest

from fourdgs.utils.config import ConfigDict

pytestmark = pytest.mark.slow


def _synthetic_config(num_frames=15, w=80, h=60):
    return ConfigDict.wrap(
        {
            "Results": {"save_results": False, "use_gui": False, "eval_rendering": True},
            "Dataset": {
                "type": "synthetic",
                "sensor_type": "depth",
                "dataset_path": "",
                "num_frames": num_frames,
                "points_per_wall": 1500,
                "pcd_downsample": 16,
                "pcd_downsample_init": 8,
                "adaptive_pointsize": True,
                "point_size": 0.05,
                "Calibration": {
                    "fx": 80.0, "fy": 80.0, "cx": (w - 1) / 2, "cy": (h - 1) / 2,
                    "width": w, "height": h, "depth_scale": 1.0, "distorted": False,
                },
            },
            "Training": {
                "init_itr_num": 40,
                "init_gaussian_update": 30,
                "init_gaussian_reset": 2000,
                "init_gaussian_th": 0.005,
                "init_gaussian_extent": 30,
                "tracking_itr_num": 30,
                "mapping_itr_num": 15,
                "keyframe_mapping_iters": 15,
                "gaussian_update_every": 10000,
                "gaussian_update_offset": 50,
                "gaussian_th": 0.7,
                "gaussian_extent": 1.0,
                "gaussian_reset": 20001,
                "size_threshold": 20,
                "kf_interval": 5,
                "window_size": 3,
                "pose_window": 2,
                "edge_threshold": 1.1,
                "rgb_boundary_threshold": 0.01,
                "alpha": 0.9,
                "kf_translation": 0.08,
                "kf_min_translation": 0.05,
                "kf_overlap": 0.9,
                "kf_cutoff": 0.3,
                "single_thread": True,
                "monocular": False,
                "lr": {"cam_rot_delta": 0.003, "cam_trans_delta": 0.001},
            },
            "opt_params": {"densify_grad_threshold": 0.0002},
            "model_params": {"sh_degree": 0, "dynamic_model": False},
        }
    )


@pytest.fixture(scope="module")
def slam_run(tmp_path_factory):
    from fourdgs.slam.runner import SLAM

    cfg = _synthetic_config()
    save_dir = str(tmp_path_factory.mktemp("slam_out"))
    slam = SLAM(cfg, save_dir=save_dir, capacity=8192, max_keyframes=16)
    slam.run()
    return slam


def test_slam_tracks_whole_sequence(slam_run):
    assert len(slam_run.poses_est) == slam_run.n_frames
    assert len(slam_run.kf_indices) >= 2
    assert int(slam_run.gmap.num_alive) > 500


def test_slam_ate(slam_run):
    stats = slam_run.eval_ate("test")
    # tiny synthetic scene: trajectory error well under the orbit radius
    assert stats["rmse"] < 0.05, stats


def test_slam_rendering_quality(slam_run):
    res = slam_run.eval_rendering("test", interval=5)
    # drift guards, recalibrated after the round-3 parity fixes: metrics
    # are now computed over ALL frames at estimated poses (stride 5),
    # reference semantics — non-keyframe frames render worse than the
    # mapped keyframes the old numbers reflected (measured on this box:
    # psnr 16.2, l1 depth 0.93; a fresh map scores ~10-12 / >2)
    assert res["mean_psnr"] is not None and res["mean_psnr"] > 15.0, res
    assert res["mean_l1_depth"] is not None and res["mean_l1_depth"] < 1.2, res


def test_slam_ply_roundtrip(slam_run, tmp_path):
    from fourdgs.io.ply import load_gaussians_ply, save_gaussians_ply

    path = str(tmp_path / "map.ply")
    n = save_gaussians_ply(slam_run.gmap, path)
    assert n == int(slam_run.gmap.num_alive)
    back = load_gaussians_ply(path)
    assert back["xyz"].shape == (n, 3)
    alive = np.asarray(slam_run.gmap.alive)
    np.testing.assert_allclose(
        np.sort(back["xyz"][:, 0]),
        np.sort(np.asarray(slam_run.gmap.params.xyz)[alive, 0]),
        atol=1e-6,
    )


def test_slam_checkpoint_roundtrip(slam_run, tmp_path):
    from fourdgs.io.checkpoint import load_state, save_state

    path = str(tmp_path / "state.npz")
    save_state(path, slam_run.gmap, slam_run.adam, slam_run.store,
               {"iteration_count": slam_run.iteration_count})
    gmap, adam, store, host = load_state(
        path, slam_run.gmap, slam_run.adam, slam_run.store
    )
    assert host["iteration_count"] == slam_run.iteration_count
    np.testing.assert_array_equal(
        np.asarray(gmap.alive), np.asarray(slam_run.gmap.alive)
    )
    np.testing.assert_allclose(
        np.asarray(gmap.params.xyz), np.asarray(slam_run.gmap.params.xyz)
    )
