"""On-chip microbench: map_chunk per-iteration cost at production shapes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

from fourdgs.utils.xla_cache import enable_compile_cache
enable_compile_cache()

from fourdgs.models.gaussian_map import (
    candidates_from_rgbd, empty_map, init_adam, insert,
)
from fourdgs.ops.rasterize import RasterConfig
from fourdgs.slam.camera import Intrinsics, make_frame
from fourdgs.slam.keyframes import empty_store, store_keyframe
from fourdgs.slam.mapping import (
    MappingConfig, init_pose_adam, map_chunk,
)
from fourdgs.geometry import se3_exp

W, H = 640, 480
intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6, width=W, height=H)
cap = int(os.environ.get("MB_CAP", 16384))
max_pairs = int(os.environ.get(
    "MB_PAIRS", min(1 << 18, max(1 << 15, cap * 8))
))
raster = RasterConfig(max_pairs=max_pairs, with_n_touched=False)

v, u = np.mgrid[0:H, 0:W]
img = np.stack([
    0.5 + 0.4 * np.sin(u / 25.0),
    0.5 + 0.4 * np.cos(v / 31.0),
    0.5 + 0.3 * np.sin((u + v) / 40.0),
]).astype(np.float32)
depth = (2.5 + 0.5 * np.sin(u / 50.0) * np.cos(v / 60.0)).astype(np.float32)
img, depth = jnp.asarray(img), jnp.asarray(depth)

gmap = empty_map(cap)
adam = init_adam(cap)
cands = candidates_from_rgbd(
    jax.random.key(0), img, depth, jnp.eye(4),
    intr.fx, intr.fy, intr.cx, intr.cy, downsample=28, max_new=cap,
)
gmap, adam, n = insert(gmap, adam, cands, kf_id=0)
print("alive:", int(gmap.num_alive))

store = empty_store(16, H, W)
for k in range(10):
    tau = np.zeros(6, np.float32)
    tau[0] = 0.02 * k
    tau[4] = 0.005 * k
    T = np.asarray(se3_exp(jnp.asarray(tau)))
    frame = make_frame(k, img, depth, jnp.asarray(T), time=0.0)
    store = store_keyframe(store, k, frame, jnp.asarray(T), jnp.zeros(2))

cfg = MappingConfig(
    num_window_views=8, num_random_views=2, raster=raster,
    rebin_every=int(sys.argv[1]) if len(sys.argv) > 1 else 4,
)
vw = cfg.num_window_views
slots = jnp.asarray(np.arange(vw), jnp.int32)
valid = jnp.ones(vw, bool)
opt_pose = jnp.ones(vw, bool)
pool = jnp.asarray(np.arange(8), jnp.int32)

def run(n_iters, key):
    res = map_chunk(
        gmap, adam, store, slots, valid, opt_pose,
        pool, jnp.int32(8), init_pose_adam(vw), key,
        jnp.int32(n_iters), jnp.int32(-1), jnp.int32(0),
        intr, cfg,
    )
    jax.block_until_ready(res.gmap.params.xyz)
    return res

for n_iters in (8, 8, 40, 40):
    t0 = time.perf_counter()
    run(n_iters, jax.random.key(n_iters))
    dt = time.perf_counter() - t0
    print(f"iters={n_iters}: {dt:.3f}s total")
