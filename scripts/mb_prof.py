"""On-chip component breakdown of one mapping iteration at production
shapes: binning (window 8-view / replay 2-view), batched 10-view forward,
and full fwd+bwd with precomputed bins."""
import os
import sys
import time

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
print("alive:", int(gmap.num_alive), "cap:", cap, "max_pairs:", max_pairs)

Ts = []
for k in range(10):
    tau = np.zeros(6, np.float32)
    tau[0] = 0.02 * k
    tau[4] = 0.005 * k
    Ts.append(np.asarray(se3_exp(jnp.asarray(tau))))
Ts = jnp.asarray(np.stack(Ts))


def bench(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:46s} {dt:8.2f} ms")
    return out


def bins_v(T_sub):
    return compute_bins_multi(
        gmap.params.xyz, gmap.get_scaling, gmap.get_rotation, gmap.alive,
        T_sub, proj, gmap.get_opacity,
        fx=intr.fx, fy=intr.fy, width=W, height=H,
        tan_fovx=intr.tan_fovx, tan_fovy=intr.tan_fovy, config=raster,
    )


bins2 = bench("compute_bins_multi 2 views (replay/iter)",
              jax.jit(bins_v), Ts[:2])
bins8 = bench("compute_bins_multi 8 views (window/round)",
              jax.jit(bins_v), Ts[:8])
bins10 = bench("compute_bins_multi 10 views", jax.jit(bins_v), Ts)
print("pairs/view:", [int(x) for x in np.asarray(bins10.num_pairs)])


@jax.jit
def fwd(params, bins):
    g = gmap._replace(params=params)
    out = rasterize_multi(
        g.params.xyz, g.get_scaling, g.get_rotation, g.get_opacity,
        g.get_color, g.alive, Ts, proj, jnp.zeros(3),
        fx=intr.fx, fy=intr.fy, width=W, height=H,
        tan_fovx=intr.tan_fovx, tan_fovy=intr.tan_fovy,
        config=raster, bins=bins,
    )
    return out.color, out.depth


bench("rasterize_multi 10 views fwd (bins given)", fwd, gmap.params, bins10)


@jax.jit
def fwd_nobins(params):
    g = gmap._replace(params=params)
    out = rasterize_multi(
        g.params.xyz, g.get_scaling, g.get_rotation, g.get_opacity,
        g.get_color, g.alive, Ts, proj, jnp.zeros(3),
        fx=intr.fx, fy=intr.fy, width=W, height=H,
        tan_fovx=intr.tan_fovx, tan_fovy=intr.tan_fovy,
        config=raster,
    )
    return out.color, out.depth


bench("rasterize_multi 10 views fwd (inline bins)", fwd_nobins, gmap.params)

target_c = jnp.zeros((10, 3, H, W))
target_d = jnp.zeros((10, H, W))


@jax.jit
def fwdbwd(params, bins):
    def loss(p):
        c, d = fwd(p, bins)
        return jnp.mean(jnp.abs(c - target_c)) + jnp.mean(jnp.abs(d - target_d))

    return jax.value_and_grad(loss)(params)


bench("10-view loss fwd+bwd (bins given)", fwdbwd, gmap.params, bins10)


@jax.jit
def fwdbwd_tap(params, taps, bins):
    def loss(p, tp):
        g = gmap._replace(params=p)
        out = rasterize_multi(
            g.params.xyz, g.get_scaling, g.get_rotation, g.get_opacity,
            g.get_color, g.alive, Ts, proj, jnp.zeros(3),
            fx=intr.fx, fy=intr.fy, width=W, height=H,
            tan_fovx=intr.tan_fovx, tan_fovy=intr.tan_fovy,
            mean2d_offsets=tp, config=raster, bins=bins,
        )
        return (jnp.mean(jnp.abs(out.color - target_c))
                + jnp.mean(jnp.abs(out.depth - target_d)))

    return jax.value_and_grad(loss, argnums=(0, 1))(params, taps)


taps = jnp.zeros((10, cap, 2))
bench("10-view loss fwd+bwd + mean2d taps", fwdbwd_tap, gmap.params, taps, bins10)
