"""Dump optimized HLO of the 10-view mapping fwd+bwd and print the
instructions whose names match the trace's hot ops, with op metadata
(source file/line) so trace entries map back to repo code."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from fourdgs.utils.xla_cache import enable_compile_cache

enable_compile_cache()

from fourdgs.geometry import se3_exp
from fourdgs.models.gaussian_map import (
    candidates_from_rgbd, empty_map, init_adam, insert,
)
from fourdgs.ops.rasterize import RasterConfig
from fourdgs.ops.rasterize.api import compute_bins_multi, rasterize_multi
from fourdgs.slam.camera import Intrinsics

W, H = 640, 480
intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6, width=W, height=H)
cap = int(os.environ.get("MB_CAP", 32768))
max_pairs = int(os.environ.get("MB_PAIRS", min(1 << 18, max(1 << 15, cap * 8))))
raster = RasterConfig(max_pairs=max_pairs, with_n_touched=False)
proj = intr.proj()

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

Ts = jnp.asarray(np.stack([
    np.asarray(se3_exp(jnp.asarray(
        np.array([0.02 * k, 0, 0, 0, 0.005 * k, 0], np.float32))))
    for k in range(10)
]))

bins10 = compute_bins_multi(
    gmap.params.xyz, gmap.get_scaling, gmap.get_rotation, gmap.alive,
    Ts, proj, gmap.get_opacity,
    fx=intr.fx, fy=intr.fy, width=W, height=H,
    tan_fovx=intr.tan_fovx, tan_fovy=intr.tan_fovy, config=raster,
)
jax.block_until_ready(bins10)

target_c = jnp.zeros((10, 3, H, W))
target_d = jnp.zeros((10, H, W))


@jax.jit
def fwdbwd(params, bins):
    def loss(p):
        g = gmap._replace(params=p)
        out = rasterize_multi(
            g.params.xyz, g.get_scaling, g.get_rotation, g.get_opacity,
            g.get_color, g.alive, Ts, proj, jnp.zeros(3),
            fx=intr.fx, fy=intr.fy, width=W, height=H,
            tan_fovx=intr.tan_fovx, tan_fovy=intr.tan_fovy,
            config=raster, bins=bins,
        )
        return (jnp.mean(jnp.abs(out.color - target_c))
                + jnp.mean(jnp.abs(out.depth - target_d)))

    return jax.value_and_grad(loss)(params)


txt = jax.jit(fwdbwd).lower(gmap.params, bins10).compile().as_text()
names = sys.argv[1:] or [
    "fusion.72", "fusion.76", "slice_multiply_fusion", "fusion.2 ",
    "fusion.1 ", "multiply_reduce_fusion.39", "copy.127", "copy.128",
    "copy.129", "copy.140", "copy.141", "copy.132", "copy.133",
    "while.9", "reshape.23", "reshape.20",
]
lines = txt.splitlines()
for i, ln in enumerate(lines):
    s = ln.lstrip()
    for nm in names:
        key = nm.strip()
        if re.match(rf"(ROOT )?%?{re.escape(key)} ", s) or f" {key} = " in s:
            print(ln[:400])
            break
print("\n=== fusion computations sizes (top by line count) ===")
# crude: count lines per fused_computation block
blocks = re.findall(r"%fused_computation[^\s]* \([^)]*\)", txt)
print(f"{len(blocks)} fused computations")
