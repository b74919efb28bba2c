"""On-chip smoke gate: compiled-kernel health check before round-ending
commits (README "pre-commit ritual").

CI exercises Pallas only in interpret mode on CPU; the ONLY compiled-TPU
execution used to be the driver's once-per-round bench — which is how
round 4 shipped a kernel fault sight-unseen. This script runs every
production program as a COMPILED TPU kernel in a few minutes:

  stage fwd     composite_csr forward+backward at production shape
                (640x480, synthetic room scene, tracking pair bucket)
  stage track   one real track_frame at the production bucket
  stage slam    a 6-frame SLAM loop (short init) — map init fwd+bwd,
                keyframe mapping map_chunk, densify, eval
  stage dynamic a 6-frame dynamic loop — deformation warp + flow renders
                + map_chunk_dynamic (pass --dynamic)

Run it with an outer bound (a wedged chip blocks forever in the
runtime): `timeout 900 python scripts/smoke_tpu.py`. Exit 0 = healthy.
If it wedges: kill the process, wait ~60s, and the chip recovers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage(name):
    print(f"[smoke] === {name} ===", flush=True)
    return time.time()


def _ok(name, t0):
    print(f"[smoke] {name} OK in {time.time()-t0:.1f}s", flush=True)


def stage_fwd_bwd():
    import jax
    import jax.numpy as jnp

    from fourdgs.data.synthetic import make_room_scene, orbit_pose
    from fourdgs.geometry import projection_matrix
    from fourdgs.ops.rasterize import RasterConfig
    from fourdgs.ops.rasterize.api import rasterize

    t0 = _stage("fwd+bwd composite_csr @ 640x480")
    W, H = 640, 480
    fx, fy, cx, cy = 535.4, 539.2, 320.1, 247.6
    pts, col, lscl, quats, opac = make_room_scene(0, 6000)
    proj = projection_matrix(fx, fy, cx, cy, W, H)
    T_cw = jnp.asarray(orbit_pose(0.0), jnp.float32)
    cfg = RasterConfig(max_pairs=1 << 18)
    n = pts.shape[0]
    alive = jnp.ones(n, bool)

    def loss_fn(xyz, scales_log, quats, opac, cols):
        out = rasterize(
            xyz, jnp.exp(scales_log), quats, opac, cols, alive, T_cw, proj,
            jnp.zeros(3), fx=fx, fy=fy, width=W, height=H,
            tan_fovx=W / (2 * fx), tan_fovy=H / (2 * fy), config=cfg,
        )
        return (jnp.mean(out.color) + jnp.mean(out.depth)
                + jnp.mean(out.T_final)), out.num_pairs

    vg = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 3), has_aux=True))
    (val, npairs), grads = vg(
        jnp.asarray(pts), jnp.asarray(lscl), jnp.asarray(quats),
        jnp.asarray(opac), jnp.asarray(col),
    )
    jax.block_until_ready(grads)
    g0 = float(jnp.abs(grads[0]).sum())
    assert g0 == g0 and g0 > 0, f"degenerate grads: {g0}"
    print(f"[smoke]   loss={float(val):.4f} pairs={int(npairs)} "
          f"|dxyz|={g0:.3e}")
    _ok("fwd+bwd", t0)


def _slam_config(n_frames, init_iters, dynamic=False):
    from fourdgs.utils.config import ConfigDict

    w, h = 640, 480
    return ConfigDict.wrap({
        "Results": {"save_results": False, "use_gui": False},
        "Dataset": {
            "type": "synthetic", "sensor_type": "depth", "dataset_path": "",
            "num_frames": n_frames, "points_per_wall": 6000,
            "dynamic": dynamic,
            "pcd_downsample": 128, "pcd_downsample_init": 32,
            "adaptive_pointsize": True, "point_size": 0.01,
            "Calibration": {
                "fx": 535.4, "fy": 539.2, "cx": 320.1, "cy": 247.6,
                "width": w, "height": h, "depth_scale": 1.0,
                "distorted": False,
            },
        },
        "Training": {
            "init_itr_num": init_iters,
            "init_gaussian_update": 100, "init_gaussian_reset": 500,
            "init_gaussian_th": 0.005, "init_gaussian_extent": 30,
            "tracking_itr_num": 30, "mapping_itr_num": 20,
            "keyframe_mapping_iters": 40,
            "gaussian_update_every": 150, "gaussian_update_offset": 50,
            "gaussian_th": 0.7, "gaussian_extent": 1.0,
            "gaussian_reset": 2001, "size_threshold": 20,
            "kf_interval": 2, "window_size": 8, "pose_window": 3,
            "edge_threshold": 1.1, "rgb_boundary_threshold": 0.01,
            "alpha": 0.9, "kf_translation": 0.08,
            "kf_min_translation": 0.05, "kf_overlap": 0.9,
            "kf_cutoff": 0.3, "single_thread": True, "monocular": False,
            "lr": {"cam_rot_delta": 0.003, "cam_trans_delta": 0.001},
        },
        "opt_params": {"densify_grad_threshold": 0.0002},
        "model_params": {
            "sh_degree": 0, "dynamic_model": dynamic,
            **({"dystart": 2} if dynamic else {}),
        },
    })


def stage_track():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fourdgs.data.synthetic import SyntheticDataset
    from fourdgs.models.gaussian_map import (
        candidates_from_rgbd, empty_map, init_adam, insert,
    )
    from fourdgs.ops.rasterize import RasterConfig
    from fourdgs.slam.camera import Frame, Intrinsics
    from fourdgs.slam.tracking import TrackingConfig, track_frame

    t0 = _stage("track_frame @ production bucket")
    W, H = 640, 480
    intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6,
                      width=W, height=H)
    ds = SyntheticDataset(None, "", _slam_config(4, 50))
    img0, dep0, T0, _ = ds[0]
    img1, dep1, T1, m1 = ds[1]
    gmap = empty_map(1 << 15)
    adam = init_adam(1 << 15)
    cands = candidates_from_rgbd(
        jax.random.key(0), jnp.asarray(img0), jnp.asarray(dep0),
        jnp.asarray(T0, jnp.float32), intr.fx, intr.fy, intr.cx, intr.cy,
        downsample=32, max_new=1 << 14,
    )
    gmap, adam, _ = insert(gmap, adam, cands, kf_id=0)
    frame = Frame(
        uid=jnp.int32(1), image=jnp.asarray(img1), depth=jnp.asarray(dep1),
        grad_mask=jnp.asarray(np.ones((H, W), bool)),
        motion_mask=jnp.asarray(m1),
        T_gt=jnp.asarray(T1, jnp.float32), time=jnp.float32(0.0),
    )
    cfg = TrackingConfig(
        max_iters=8, rebin_every=8,
        raster=RasterConfig(max_pairs=1 << 18, with_n_touched=False),
    )
    res = track_frame(gmap, frame, jnp.asarray(T0, jnp.float32),
                      jnp.zeros(2), intr, cfg)
    jax.block_until_ready(res.T_cw)
    print(f"[smoke]   n_iters={int(res.n_iters)} "
          f"loss={float(res.final_loss):.5f} overflow={bool(res.overflow)}")
    _ok("track_frame", t0)


def stage_slam(dynamic: bool):
    from fourdgs.slam.runner import SLAM

    name = "dynamic slam loop" if dynamic else "slam loop"
    t0 = _stage(f"{name} (6 frames, short init)")
    slam = SLAM(_slam_config(6, 60, dynamic), capacity=1 << 15,
                max_capacity=1 << 15, max_keyframes=64)
    for i in range(6):
        slam.dataset[i]
    metrics = slam.run(warmup_frames=2)
    print(f"[smoke]   fps={metrics['fps']:.3f} "
          f"hwm={slam._pairs_hwm} bucket={slam.raster.max_pairs}")
    _ok(name, t0)


def main():
    from fourdgs.utils.xla_cache import enable_compile_cache

    enable_compile_cache()
    import jax

    t_all = time.time()
    print(f"[smoke] devices: {jax.devices()}", flush=True)
    if jax.default_backend() not in ("tpu", "axon"):
        print("[smoke] WARNING: not on TPU — this gate only means "
              "something when kernels compile for the real chip")
    stage_fwd_bwd()
    stage_track()
    stage_slam(dynamic=False)
    if "--dynamic" in sys.argv:
        stage_slam(dynamic=True)
    print(f"[smoke] ALL STAGES OK in {time.time()-t_all:.1f}s", flush=True)


if __name__ == "__main__":
    main()
