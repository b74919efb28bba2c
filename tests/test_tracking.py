import jax
import jax.numpy as jnp
import numpy as np

from fourdgs.geometry import se3_exp
from fourdgs.models.gaussian_map import empty_map, init_adam, insert, NewGaussians, inverse_sigmoid
from fourdgs.ops.rasterize import RasterConfig, rasterize
from fourdgs.slam.camera import Frame, Intrinsics, make_frame
from fourdgs.slam.tracking import TrackingConfig, track_frame

INTR = Intrinsics(fx=80.0, fy=80.0, cx=39.5, cy=29.5, width=80, height=60)
CFG = RasterConfig(use_oracle=True)


def build_map(seed=0, n=96, cap=128):
    rng = np.random.default_rng(seed)
    gmap = empty_map(cap)
    adam = init_adam(cap)
    new = NewGaussians(
        xyz=jnp.asarray(
            np.stack(
                [rng.uniform(-1.5, 1.5, n), rng.uniform(-1.1, 1.1, n), rng.uniform(2.0, 5.0, n)],
                -1,
            ),
            jnp.float32,
        ),
        rgb=jnp.asarray(rng.uniform(0.1, 0.9, (n, 3)), jnp.float32),
        scaling=jnp.asarray(np.log(rng.uniform(0.08, 0.25, (n, 3))), jnp.float32),
        rotation=jnp.zeros((n, 4)).at[:, 0].set(1.0),
        opacity=jnp.full((n, 1), inverse_sigmoid(0.8), jnp.float32),
        valid=jnp.ones(n, bool),
    )
    gmap, adam, _ = insert(gmap, adam, new, kf_id=0)
    return gmap, adam


def render_gt(gmap, T_cw):
    return rasterize(
        gmap.params.xyz, gmap.get_scaling, gmap.get_rotation, gmap.get_opacity,
        gmap.get_color, gmap.alive, T_cw, INTR.proj(), jnp.zeros(3),
        fx=INTR.fx, fy=INTR.fy, width=INTR.width, height=INTR.height,
        tan_fovx=INTR.tan_fovx, tan_fovy=INTR.tan_fovy, config=CFG,
    )


def test_tracking_recovers_pose():
    gmap, _ = build_map()
    T_gt = jnp.eye(4)
    target = render_gt(gmap, T_gt)
    frame = make_frame(
        1, target.color, target.depth, T_gt, time=0.0,
    )
    tau = jnp.array([0.03, -0.02, 0.02, 0.008, -0.01, 0.006])
    T0 = se3_exp(tau) @ T_gt
    tc = TrackingConfig(max_iters=120, raster=CFG)
    res = track_frame(gmap, frame, T0, jnp.zeros(2), INTR, tc)
    err0 = float(jnp.linalg.norm(T0[:3, 3] - T_gt[:3, 3]))
    err1 = float(jnp.linalg.norm(res.T_cw[:3, 3] - T_gt[:3, 3]))
    rot_err = float(jnp.linalg.norm(res.T_cw[:3, :3] - T_gt[:3, :3]))
    assert err1 < 0.25 * err0, (err0, err1)
    assert rot_err < 0.02
    assert int(res.n_iters) > 2


def test_tracking_converged_early_exit():
    gmap, _ = build_map()
    T_gt = jnp.eye(4)
    target = render_gt(gmap, T_gt)
    frame = make_frame(1, target.color, target.depth, T_gt, time=0.0)
    tc = TrackingConfig(max_iters=100, raster=CFG)
    res = track_frame(gmap, frame, T_gt, jnp.zeros(2), INTR, tc)
    assert float(res.final_loss) < 1e-3
    # with a loose threshold the |tau| early exit must fire immediately
    tc2 = TrackingConfig(max_iters=100, converged_threshold=1.0, raster=CFG)
    res2 = track_frame(gmap, frame, T_gt, jnp.zeros(2), INTR, tc2)
    assert int(res2.n_iters) == 1


def test_tracking_static_only_ignores_dynamic():
    gmap, _ = build_map()
    # mark half the gaussians dynamic; they must not be rendered
    gmap = gmap._replace(dygs=jnp.arange(gmap.capacity) % 2 == 0)
    T_gt = jnp.eye(4)
    target = render_gt(gmap._replace(alive=gmap.alive & ~gmap.dygs), T_gt)
    frame = make_frame(1, target.color, target.depth, T_gt, time=0.0)
    tc = TrackingConfig(max_iters=30, raster=CFG)
    res = track_frame(gmap, frame, T_gt, jnp.zeros(2), INTR, tc)
    assert float(res.final_loss) < 1e-3


def test_tracking_median_depth_and_visibility():
    gmap, _ = build_map()
    T_gt = jnp.eye(4)
    target = render_gt(gmap, T_gt)
    frame = make_frame(1, target.color, target.depth, T_gt, time=0.0)
    tc = TrackingConfig(max_iters=5, raster=CFG)
    res = track_frame(gmap, frame, T_gt, jnp.zeros(2), INTR, tc)
    assert 1.5 < float(res.median_depth) < 6.0
    assert int(jnp.sum(res.visibility)) > 10
