"""Breakdown of the batched multi-view render at production mapping
shapes (V views, 32K capacity, 640x480): vmapped preprocess, vmapped
binning, forward compositor, forward+backward."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:42s} {dt:8.2f} ms")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=10)
    ap.add_argument("--cap", type=int, default=32768)
    args = ap.parse_args()

    from fourdgs.geometry import projection_matrix
    from fourdgs.geometry.quaternion import quat_normalize
    from fourdgs.ops.rasterize import RasterConfig
    from fourdgs.ops.rasterize.api import rasterize, rasterize_multi

    W, H = 640, 480
    FX, FY, CX, CY = 535.4, 539.2, 320.1, 247.6
    proj = projection_matrix(FX, FY, CX, CY, W, H)
    cfg = RasterConfig()
    n = args.cap
    v = args.views
    rng = np.random.default_rng(0)
    means = jnp.asarray(np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(1.5, 6, n)], -1
    ), jnp.float32)
    scales = jnp.asarray(
        np.exp(rng.uniform(np.log(0.01), np.log(0.04), (n, 3))), jnp.float32)
    quats = quat_normalize(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
    opac = jnp.asarray(rng.uniform(0.3, 0.95, n), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    alive = jnp.ones(n, bool)
    T_cws = jnp.stack([jnp.eye(4)] * v)
    kw = dict(fx=FX, fy=FY, width=W, height=H,
              tan_fovx=W / (2 * FX), tan_fovy=H / (2 * FY), config=cfg)

    @jax.jit
    def fwd_multi(means, T_cws):
        out = rasterize_multi(
            means, scales, quats, opac, colors, alive, T_cws, proj,
            jnp.zeros(3), **kw)
        return out.color.sum() + out.depth.sum()

    @jax.jit
    def fwdbwd_multi(means, T_cws):
        def loss(means, colors, opac):
            out = rasterize_multi(
                means, scales, quats, opac, colors, alive, T_cws, proj,
                jnp.zeros(3), **kw)
            return out.color.sum() + out.depth.sum()
        return jax.grad(loss, argnums=(0, 1, 2))(means, colors, opac)

    @jax.jit
    def fwd_single_loop(means, T_cws):
        def one(c, T):
            out = rasterize(
                means, scales, quats, opac, colors, alive, T, proj,
                jnp.zeros(3), **kw)
            return c + out.color.sum() + out.depth.sum(), 0
        s, _ = jax.lax.scan(one, 0.0, T_cws)
        return s

    @jax.jit
    def fwdbwd_single_loop(means, T_cws):
        def loss(means, colors, opac):
            def one(c, T):
                out = rasterize(
                    means, scales, quats, opac, colors, alive, T, proj,
                    jnp.zeros(3), **kw)
                return c + out.color.sum() + out.depth.sum(), 0
            s, _ = jax.lax.scan(one, 0.0, T_cws)
            return s
        return jax.grad(loss, argnums=(0, 1, 2))(means, colors, opac)

    print(f"V={v} cap={n} {W}x{H}")
    timeit("fwd multi (batched)", fwd_multi, means, T_cws, n=10)
    timeit("fwd single x V (scan)", fwd_single_loop, means, T_cws, n=10)
    timeit("fwd+bwd multi (batched)", fwdbwd_multi, means, T_cws, n=10)
    timeit("fwd+bwd single x V (scan)", fwdbwd_single_loop, means, T_cws, n=10)


if __name__ == "__main__":
    main()
