#!/usr/bin/env python3
"""Benchmark: tracking+mapping throughput on one TPU chip.

Runs the full SLAM pipeline (tracking + keyframe mapping + densification)
on a synthetic 640x480 RGB-D sequence (no dataset downloads are possible
in this container; the synthetic room is rendered by this repo's own
rasterizer at TUM fr3 intrinsics, so the workload matches BASELINE
config #1's shape) and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "fps", "vs_baseline": N}

vs_baseline is measured FPS / 30 (the driver's north-star: >= 30 FPS
tracking+mapping on one v5e; the CUDA reference itself runs well under
1 FPS on TUM dynamic sequences).
"""

from __future__ import annotations

import argparse
import json


def main():
    import jax

    from fourdgs.utils.xla_cache import enable_compile_cache

    enable_compile_cache()

    from fourdgs.ops.rasterize import RasterConfig
    from fourdgs.slam.runner import SLAM
    from fourdgs.utils.config import ConfigDict

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("frames", nargs="?", type=int, default=40)
    ap.add_argument(
        "--dynamic", action="store_true",
        help="benchmark the 4D dynamic path (deformation field + flow "
        "supervision + dynamic mapping), the BASELINE config #3 workload",
    )
    args = ap.parse_args()
    n_frames = args.frames
    warmup = 11  # past the first keyframe cycle: all jits compiled

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
                "init_itr_num": 1050,
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

    if args.dynamic:
        # BASELINE config #3 shape: deformation field + flow supervision.
        # dystart right after warmup so the steady-state window measures
        # the DYNAMIC mapping path (deform warp + flow renders), not the
        # pre-dystart static fallback. Exact synthetic flow/masks stand in
        # for RAFT/YOLO in this zero-egress container (same iteration
        # structure; perception nets are a fixed per-frame cost).
        config["Dataset"]["dynamic"] = True
        config["Training"]["dystart"] = 8
        config["Training"]["flow_loss"] = 3
        config["Training"]["flow_loss_fine"] = 2
        config["ModelHiddenParams"] = {"node_num": 512}

    # pin the capacity bucket: auto-growth would recompile mid-run and
    # pollute the steady-state window on a short benchmark sequence
    slam = SLAM(
        config, capacity=1 << 15, max_capacity=1 << 15, max_keyframes=64,
        dynamic=args.dynamic,
    )
    label = (
        "4D dynamic tracking+mapping FPS (synthetic 640x480 RGB-D + moving "
        "object, deformation field + flow losses, steady-state)"
        if args.dynamic
        else "tracking+mapping FPS (synthetic 640x480 RGB-D, "
        "TUM fr3 intrinsics, full SLAM loop, steady-state)"
    )
    # Failure containment: ANY exception still emits the JSON line with
    # whatever throughput signal the run produced before dying (frames
    # completed / elapsed), plus the error — a crashed run must never
    # leave the driver with `parsed: null` (round-4 lesson).
    import threading
    import time as _time

    t0 = _time.time()

    # Stall watchdog: a wedged chip/tunnel HANGS the runtime in C++ (no
    # exception to contain — observed round 5: probes block forever).
    # If the SLAM loop makes no frame progress for `stall_s`, emit the
    # partial-metrics JSON line and hard-exit so the driver still gets a
    # parseable record. Frame progress is read off slam.poses_est, which
    # the host loop extends after every tracked frame; the generous
    # window accommodates first-compile (~8 min cold for the biggest
    # program on the tunnel).
    # (init = one poses_est entry for ~compile+1050 iters; keep the
    # window above that phase's worst observed cold time)
    stall_s = 1800.0
    done_flag = {"done": False}

    def _watchdog():
        import os as _os

        last = (-1, _time.time())
        while not done_flag["done"]:
            _time.sleep(30)
            n = len(slam.poses_est)
            if n != last[0]:
                last = (n, _time.time())
            elif _time.time() - last[1] > stall_s:
                elapsed = max(_time.time() - t0, 1e-9)
                frames_done = (max(slam.poses_est) + 1) if slam.poses_est else 0
                print(json.dumps({
                    "metric": label + " [PARTIAL: run stalled]",
                    "value": round(frames_done / elapsed, 4),
                    "unit": "fps",
                    "vs_baseline": round(frames_done / elapsed / 30.0, 4),
                    "error": f"no frame progress for {stall_s:.0f}s "
                             "(wedged chip/tunnel?)",
                    "frames_done": frames_done,
                    "elapsed_s": round(elapsed, 1),
                }), flush=True)
                _os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        # pre-render the synthetic sequence into the dataset cache BEFORE
        # the clock starts: the synthetic frames are produced by this
        # repo's own rasterizer on the same chip, and rendering them
        # inside the timed loop charges the SLAM clock for device work
        # the reference's dataset (CPU-side PNG decode, overlapped by its
        # loader) never pays. Runs inside the watchdog window — a wedged
        # chip hangs HERE first (round-5 observation).
        for i in range(n_frames):
            slam.dataset[i]
        t0 = _time.time()
        metrics = slam.run(warmup_frames=warmup)
        fps = metrics.get("fps_steady", metrics["fps"])
        rec = {
            "metric": label,
            "value": round(float(fps), 4),
            "unit": "fps",
            "vs_baseline": round(float(fps) / 30.0, 4),
        }
    except BaseException as e:  # noqa: BLE001 — containment is the point
        import traceback

        traceback.print_exc()
        frames_done = (max(slam.poses_est) + 1) if slam.poses_est else 0
        elapsed = max(_time.time() - t0, 1e-9)
        fps = frames_done / elapsed
        rec = {
            "metric": label + " [PARTIAL: run crashed]",
            "value": round(float(fps), 4),
            "unit": "fps",
            "vs_baseline": round(float(fps) / 30.0, 4),
            "error": f"{type(e).__name__}: {e}"[:500],
            "frames_done": frames_done,
            "elapsed_s": round(elapsed, 1),
        }
    done_flag["done"] = True
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
