"""Reproduce the r4 bench TPU kernel fault with a short init.

Follows bench.py's exact path (synthetic 640x480 sequence, capacity
1<<15, init -> _rebucket_pairs -> track_frame) but with a short init so
the repro lands in the tracking program within ~2 minutes. Prints the
pair-budget decisions so the faulting shape is identifiable.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time


def main():
    import jax

    from fourdgs.utils.xla_cache import enable_compile_cache

    enable_compile_cache()

    from fourdgs.slam.runner import SLAM
    from fourdgs.utils.config import ConfigDict

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    init_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 150

    w, h = 640, 480
    config = ConfigDict.wrap(
        {
            "Results": {"save_results": False, "use_gui": False},
            "Dataset": {
                "type": "synthetic",
                "sensor_type": "depth",
                "dataset_path": "",
                "num_frames": n_frames,
                "points_per_wall": 6000,
                "pcd_downsample": 128,
                "pcd_downsample_init": 32,
                "adaptive_pointsize": True,
                "point_size": 0.01,
                "Calibration": {
                    "fx": 535.4, "fy": 539.2, "cx": 320.1, "cy": 247.6,
                    "width": w, "height": h, "depth_scale": 1.0,
                    "distorted": False,
                },
            },
            "Training": {
                "init_itr_num": init_iters,
                "init_gaussian_update": 100,
                "init_gaussian_reset": 500,
                "init_gaussian_th": 0.005,
                "init_gaussian_extent": 30,
                "tracking_itr_num": 100,
                "mapping_itr_num": 50,
                "keyframe_mapping_iters": 200,
                "gaussian_update_every": 150,
                "gaussian_update_offset": 50,
                "gaussian_th": 0.7,
                "gaussian_extent": 1.0,
                "gaussian_reset": 2001,
                "size_threshold": 20,
                "kf_interval": 5,
                "window_size": 8,
                "pose_window": 3,
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

    slam = SLAM(config, capacity=1 << 15, max_capacity=1 << 15,
                max_keyframes=64)
    for i in range(n_frames):
        slam.dataset[i]
    print(f"[repro] start max_pairs={slam.raster.max_pairs}", flush=True)
    t0 = time.time()
    metrics = slam.run(warmup_frames=2)
    print(f"[repro] DONE in {time.time()-t0:.1f}s "
          f"hwm={slam._pairs_hwm} max_pairs={slam.raster.max_pairs}",
          flush=True)
    print(json.dumps({k: v for k, v in metrics.items()
                      if isinstance(v, (int, float))}), flush=True)


if __name__ == "__main__":
    main()
