"""Stage-by-stage on-chip bisect of the tracking fwd+bwd at a given
pair bucket (the r4/r5 fault: track_frame@262144 kernel-faults while
forward-only and the multi-view mapping path run fine).

Usage: python scripts/bisect_bwd.py <stage> [max_pairs]
  stages: fwd        forward rasterize only
          bwd_app    value_and_grad wrt opacity (appearance reduction)
          bwd_geo    value_and_grad wrt xyz (geometry reduction)
          bwd_pose   value_and_grad wrt SE(3) delta (tracking chain)
          track1     the exact track_frame iter_body once

Each stage runs in THIS process; a kernel fault kills the process, so
run stages in separate invocations (the chip needs ~60s+ to recover
after a fault).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

if os.environ.get("FOURDGS_PLATFORM"):
    import jax as _j

    _j.config.update("jax_platforms", os.environ["FOURDGS_PLATFORM"])

if os.environ.get("FOURDGS_CACHE", "1") == "1":
    from fourdgs.utils.xla_cache import enable_compile_cache
    enable_compile_cache()

import jax
import jax.numpy as jnp

from fourdgs.data.synthetic import SyntheticDataset
from fourdgs.geometry.se3 import se3_exp
from fourdgs.models.gaussian_map import (
    candidates_from_rgbd, empty_map, init_adam, insert,
)
from fourdgs.ops.rasterize import RasterConfig, rasterize
from fourdgs.slam.camera import Frame, Intrinsics
from fourdgs.slam.losses import apply_exposure, tracking_loss_rgbd
from fourdgs.utils.config import ConfigDict

stage = sys.argv[1] if len(sys.argv) > 1 else "track1"
max_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 262144

W, H = 640, 480
intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6, width=W, height=H)
config = ConfigDict.wrap({
    "Dataset": {
        "type": "synthetic", "sensor_type": "depth", "dataset_path": "",
        "num_frames": 4, "points_per_wall": 6000,
        "Calibration": {
            "fx": intr.fx, "fy": intr.fy, "cx": intr.cx, "cy": intr.cy,
            "width": W, "height": H, "depth_scale": 1.0, "distorted": False,
        },
    },
})
ds = SyntheticDataset(None, "", config)
img0, dep0, T0, m0 = ds[0]
img1, dep1, T1, m1 = ds[1]
print("[bb] frames rendered", flush=True)

gmap = empty_map(1 << 15)
adam = init_adam(1 << 15)
cands = candidates_from_rgbd(
    jax.random.key(0), jnp.asarray(img0), jnp.asarray(dep0),
    jnp.asarray(T0, jnp.float32),
    intr.fx, intr.fy, intr.cx, intr.cy, downsample=32, max_new=1 << 14,
)
gmap, adam, _ = insert(gmap, adam, cands, kf_id=0)
print(f"[bb] map alive={int(gmap.num_alive)}", flush=True)

cfg = RasterConfig(max_pairs=max_pairs, with_n_touched=False)
static_alive = gmap.alive & ~gmap.dygs
colors = gmap.get_color
scales = gmap.get_scaling
quats = gmap.get_rotation
opac = gmap.get_opacity
xyz = gmap.params.xyz
proj = intr.proj()
bg = jnp.zeros(3)
T_cw = jnp.asarray(T0, jnp.float32)
image = jnp.asarray(img1)
depth_gt = jnp.asarray(dep1)
grad_mask = jnp.asarray(np.ones((H, W), bool))
motion = jnp.asarray(m1)


def render_at(T, op):
    return rasterize(
        xyz, scales, quats, op, colors, static_alive, T, proj, bg,
        fx=intr.fx, fy=intr.fy, width=intr.width, height=intr.height,
        tan_fovx=intr.tan_fovx, tan_fovy=intr.tan_fovy, config=cfg,
    )


def timed(name, f, *a):
    t0 = time.time()
    r = jax.block_until_ready(f(*a))
    print(f"[bb] {name}: OK in {time.time()-t0:.1f}s", flush=True)
    return r


print(f"[bb] stage={stage} max_pairs={max_pairs}", flush=True)

if stage == "fwd":
    out = timed("fwd", jax.jit(lambda T: render_at(T, opac).color), T_cw)
    print(f"[bb] color mean {float(out.mean()):.4f}")

elif stage == "bwd_app":
    def loss_app(op):
        out = render_at(T_cw, op)
        return jnp.mean(jnp.abs(out.color - image))

    g = timed("bwd_app", jax.jit(jax.grad(loss_app)), opac)
    print(f"[bb] |dop| {float(jnp.abs(g).sum()):.3e}")

elif stage == "bwd_geo":
    def loss_geo(x):
        out = rasterize(
            x, scales, quats, opac, colors, static_alive, T_cw, proj, bg,
            fx=intr.fx, fy=intr.fy, width=intr.width, height=intr.height,
            tan_fovx=intr.tan_fovx, tan_fovy=intr.tan_fovy, config=cfg,
        )
        return jnp.mean(jnp.abs(out.color - image))

    g = timed("bwd_geo", jax.jit(jax.grad(loss_geo)), xyz)
    print(f"[bb] |dxyz| {float(jnp.abs(g).sum()):.3e}")

elif stage == "bwd_pose":
    def loss_pose(delta):
        T = se3_exp(delta[:6]) @ T_cw
        out = render_at(T, opac)
        return jnp.mean(jnp.abs(out.color - image))

    g = timed("bwd_pose", jax.jit(jax.grad(loss_pose)), jnp.zeros(8))
    print(f"[bb] |dtau| {float(jnp.abs(g).sum()):.3e}")

elif stage == "track1":
    def loss_full(delta):
        T = se3_exp(delta[:6]) @ T_cw
        out = render_at(T, opac)
        image_ab = apply_exposure(out.color, delta[6], delta[7])
        return tracking_loss_rgbd(
            image_ab, out.depth, out.alpha, image, depth_gt, grad_mask,
            motion_mask=motion, alpha=0.9, rgb_boundary_threshold=0.01,
        )

    g = timed("track1", jax.jit(jax.grad(loss_full)), jnp.zeros(8))
    print(f"[bb] |g| {float(jnp.abs(g).sum()):.3e}")

else:
    raise SystemExit(f"unknown stage {stage}")
