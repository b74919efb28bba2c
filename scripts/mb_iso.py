"""Isolate the TPU fault: standalone rasterize_multi fwd / fwd+bwd."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
import numpy as np

from fourdgs.utils.xla_cache import enable_compile_cache
enable_compile_cache()

from fourdgs.models.gaussian_map import (
    candidates_from_rgbd, empty_map, init_adam, insert,
)
from fourdgs.ops.rasterize import RasterConfig
from fourdgs.ops.rasterize.api import rasterize_multi, compute_bins_multi
from fourdgs.slam.camera import Intrinsics
from fourdgs.geometry import se3_exp

W, H = 640, 480
intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6, width=W, height=H)
cap = 16384
max_pairs = 131072
raster = RasterConfig(max_pairs=max_pairs, with_n_touched=False)
ds = int(sys.argv[1]) if len(sys.argv) > 1 else 28
nview = int(sys.argv[2]) if len(sys.argv) > 2 else 10

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
    intr.fx, intr.fy, intr.cx, intr.cy, downsample=ds, max_new=cap,
)
gmap, adam, n = insert(gmap, adam, cands, kf_id=0)
print("alive:", int(gmap.num_alive), flush=True)

T_vs = []
for k in range(nview):
    tau = np.zeros(6, np.float32)
    tau[0] = 0.02 * k
    tau[4] = 0.005 * k
    T_vs.append(np.asarray(se3_exp(jnp.asarray(tau))))
T_vs = jnp.asarray(np.stack(T_vs))
proj = intr.proj()

kw = dict(fx=intr.fx, fy=intr.fy, width=W, height=H,
          tan_fovx=intr.tan_fovx, tan_fovy=intr.tan_fovy, config=raster)

@jax.jit
def fwd(g, T_vs):
    out = rasterize_multi(
        g.params.xyz, g.get_scaling, g.get_rotation, g.get_opacity,
        g.get_color, g.alive, T_vs, proj, jnp.zeros(3), **kw)
    return out.color.sum()

@jax.jit
def fwdbwd(g, T_vs):
    def loss(params):
        gg = g._replace(params=params)
        out = rasterize_multi(
            gg.params.xyz, gg.get_scaling, gg.get_rotation, gg.get_opacity,
            gg.get_color, gg.alive, T_vs, proj, jnp.zeros(3), **kw)
        return out.color.sum()
    return jax.grad(loss)(g.params).xyz.sum()

@jax.jit
def binsonly(g, T_vs):
    b = compute_bins_multi(
        g.params.xyz, g.get_scaling, g.get_rotation, g.alive,
        T_vs, proj, g.get_opacity, **kw)
    return jax.tree.leaves(b)[0].sum()

for name, f in [("bins", binsonly), ("fwd", fwd), ("fwdbwd", fwdbwd)]:
    t0 = time.perf_counter()
    r = f(gmap, T_vs)
    jax.block_until_ready(r)
    t1 = time.perf_counter()
    r = f(gmap, T_vs)
    jax.block_until_ready(r)
    t2 = time.perf_counter()
    print(f"{name}: compile+run {t1-t0:.2f}s, steady {t2-t1:.4f}s", flush=True)
