"""Integration: full SLAM loop on the PRODUCTION kernel path (CPU).

The runner defaults to the pure-jnp oracle compositor on CPU, so without
this test the Pallas CSR kernel x bins-reuse x densify x capacity-growth
interplay only ever runs on the chip inside bench.py. Here the runner is
forced onto the kernel path (interpret-mode Pallas on CPU — same code,
same binning, same custom_vjp) at tiny shapes, across multiple keyframes
with a densify pass and a forced capacity growth, and the result is
checked both for health (ATE, map size) and for agreement with the
oracle compositor at the final mid-run state.

This is the guard for mid-run interaction bugs the per-op parity tests
(tests/test_rasterizer.py) cannot see — e.g. a wrong render after bucket
growth, or a stale-bins artifact after densification (reference
numerically-risky surface: diff-gaussian-rasterization backward.cu).
"""

import numpy as np
import pytest

from fourdgs.utils.config import ConfigDict

pytestmark = pytest.mark.slow

W, H = 64, 48


def _tiny_config(num_frames=12):
    return ConfigDict.wrap(
        {
            "Results": {"save_results": False, "use_gui": False},
            "Dataset": {
                "type": "synthetic",
                "sensor_type": "depth",
                "dataset_path": "",
                "num_frames": num_frames,
                "points_per_wall": 800,
                "pcd_downsample": 16,
                "pcd_downsample_init": 6,
                "adaptive_pointsize": True,
                "point_size": 0.05,
                "Calibration": {
                    "fx": 70.0, "fy": 70.0, "cx": (W - 1) / 2, "cy": (H - 1) / 2,
                    "width": W, "height": H, "depth_scale": 1.0,
                    "distorted": False,
                },
            },
            "Training": {
                "init_itr_num": 30,
                # densify fires during init AND during keyframe mapping
                "init_gaussian_update": 20,
                "init_gaussian_reset": 2000,
                "init_gaussian_th": 0.005,
                "init_gaussian_extent": 30,
                "tracking_itr_num": 20,
                "mapping_itr_num": 10,
                "keyframe_mapping_iters": 10,
                "gaussian_update_every": 15,
                "gaussian_update_offset": 0,
                "gaussian_th": 0.7,
                "gaussian_extent": 1.0,
                "gaussian_reset": 20001,
                "size_threshold": 20,
                "kf_interval": 4,
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
def kernel_run():
    from fourdgs.ops.rasterize import RasterConfig
    from fourdgs.slam.runner import SLAM

    cfg = _tiny_config()
    # capacity starts UNDER the init spawn so _spawn_gaussians forces a
    # bucket growth (recompile path) mid-init; max_pairs floor kept tiny
    # so interpret-mode Pallas grids stay small
    slam = SLAM(
        cfg, capacity=256, max_capacity=2048, max_keyframes=16,
        raster=RasterConfig(use_oracle=False, max_pairs=2048),
    )
    assert not slam.raster.use_oracle
    slam.run()
    return slam


def test_kernel_path_growth_and_keyframes(kernel_run):
    # the init spawn (~several hundred candidates at downsample 6) must
    # have grown the bucket past the starting 256
    assert kernel_run.gmap.capacity > 256
    assert len(kernel_run.kf_indices) >= 2
    assert len(kernel_run.poses_est) == kernel_run.n_frames
    assert int(kernel_run.gmap.num_alive) > 100
    xyz = np.asarray(kernel_run.gmap.params.xyz)
    alive = np.asarray(kernel_run.gmap.alive)
    assert np.all(np.isfinite(xyz[alive]))


def test_kernel_path_ate(kernel_run):
    stats = kernel_run.eval_ate("kernel")
    assert stats["rmse"] < 0.05, stats


def test_kernel_path_matches_oracle_at_final_state(kernel_run):
    """At the post-run map state (after growths + densifies), a render
    through the production CSR kernel must match the oracle compositor."""
    import jax.numpy as jnp

    from fourdgs.ops.rasterize import rasterize

    g = kernel_run.gmap
    intr = kernel_run.intr
    T = jnp.asarray(kernel_run.poses_est[kernel_run.kf_indices[-1]], jnp.float32)

    def render(cfg):
        return rasterize(
            g.params.xyz, g.get_scaling, g.get_rotation, g.get_opacity,
            g.get_color, g.alive, T, intr.proj(), jnp.zeros(3),
            fx=intr.fx, fy=intr.fy, width=intr.width, height=intr.height,
            tan_fovx=intr.tan_fovx, tan_fovy=intr.tan_fovy, config=cfg,
        )

    out_k = render(kernel_run.raster._replace(with_n_touched=True))
    out_o = render(
        kernel_run.raster._replace(use_oracle=True, with_n_touched=True)
    )
    assert not bool(out_k.overflow)
    np.testing.assert_allclose(
        np.asarray(out_k.color), np.asarray(out_o.color), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_k.depth), np.asarray(out_o.depth), atol=2e-3
    )
    np.testing.assert_array_equal(
        np.asarray(out_k.n_touched > 0), np.asarray(out_o.n_touched > 0)
    )


def test_kernel_path_map_chunk_matches_oracle(kernel_run):
    """One mapping chunk stepped from the SAME mid-run state through the
    kernel path and the oracle path must land on (near-)identical maps —
    the full map_chunk graph (batched multi-view render + bins reuse +
    custom_vjp backward + Adam + pose updates), not just one render."""
    import jax
    import jax.numpy as jnp

    from fourdgs.slam.mapping import init_pose_adam, map_chunk

    slam = kernel_run
    slots, valid, opt_pose, pool, pool_size, _ = slam._window_arrays()
    key = jax.random.key(7)

    def run(cfg_raster):
        mc = slam.map_cfg._replace(raster=cfg_raster)
        res = map_chunk(
            slam.gmap, slam.adam, slam.store, slots, valid, opt_pose,
            pool, pool_size, init_pose_adam(mc.num_window_views), key,
            jnp.int32(3), jnp.int32(-1), jnp.int32(slam.iteration_count),
            slam.intr, mc,
        )
        return res

    base = slam.map_cfg.raster
    res_k = run(base._replace(use_oracle=False))
    res_o = run(base._replace(use_oracle=True))
    np.testing.assert_allclose(
        float(res_k.final_loss), float(res_o.final_loss), rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res_k.gmap.params.xyz), np.asarray(res_o.gmap.params.xyz),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(res_k.store.T_cw), np.asarray(res_o.store.T_cw), atol=1e-6
    )
