"""Standalone track_frame at a given max_pairs bucket (fault bisection).

Usage: python scripts/bisect_track.py [max_pairs] [max_iters] [rebin_every]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

# the axon plugin pins JAX_PLATFORMS in the env; only the config API
# overrides it (see tests/conftest.py)
if os.environ.get("FOURDGS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["FOURDGS_PLATFORM"])

if os.environ.get("FOURDGS_CACHE", "1") == "1":
    from fourdgs.utils.xla_cache import enable_compile_cache
    enable_compile_cache()

from fourdgs.data.synthetic import SyntheticDataset
from fourdgs.models.gaussian_map import (
    candidates_from_rgbd, empty_map, init_adam, insert,
)
from fourdgs.ops.rasterize import RasterConfig
from fourdgs.slam.camera import Frame, Intrinsics
from fourdgs.slam.tracking import TrackingConfig, track_frame
from fourdgs.utils.config import ConfigDict

max_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
max_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
rebin = int(sys.argv[3]) if len(sys.argv) > 3 else 8

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
print("[track] frames rendered", flush=True)

gmap = empty_map(1 << 15)
adam = init_adam(1 << 15)
cands = candidates_from_rgbd(
    jax.random.key(0), jnp.asarray(img0), jnp.asarray(dep0),
    jnp.asarray(T0, jnp.float32),
    intr.fx, intr.fy, intr.cx, intr.cy, downsample=32, max_new=1 << 14,
)
gmap, adam, n = insert(gmap, adam, cands, kf_id=0)
print(f"[track] map alive={int(gmap.num_alive)}", flush=True)

gm = np.ones((H, W), bool)
frame = Frame(
    uid=jnp.int32(1),
    image=jnp.asarray(img1), depth=jnp.asarray(dep1),
    grad_mask=jnp.asarray(gm), motion_mask=jnp.asarray(m1),
    T_gt=jnp.asarray(T1, jnp.float32), time=jnp.float32(0.0),
)
cfg = TrackingConfig(
    max_iters=max_iters, rebin_every=rebin,
    raster=RasterConfig(max_pairs=max_pairs, with_n_touched=False),
)
print(f"[track] dispatch track_frame max_pairs={max_pairs} "
      f"iters={max_iters}", flush=True)
t0 = time.time()
res = track_frame(gmap, frame, jnp.asarray(T0, jnp.float32),
                  jnp.zeros(2), intr, cfg)
print(f"[track] n_iters={int(res.n_iters)} loss={float(res.final_loss):.5f} "
      f"pairs={int(res.num_pairs)} overflow={bool(res.overflow)} "
      f"in {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
res = track_frame(gmap, frame, jnp.asarray(T0, jnp.float32),
                  jnp.zeros(2), intr, cfg)
jax.block_until_ready(res.T_cw)
print(f"[track] steady: {time.time()-t0:.2f}s", flush=True)
