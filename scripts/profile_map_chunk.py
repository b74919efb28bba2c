"""Profile map_chunk on the real TPU: per-iteration wall time at the
production shapes (32K capacity bucket, 10 views, 640x480), plus a
breakdown of the batched forward/backward pieces.

Usage: python scripts/profile_map_chunk.py [--iters 50] [--views 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--views", type=int, default=10)
    ap.add_argument("--cap", type=int, default=32768)
    ap.add_argument("--trace", default="", help="profiler trace dir")
    ap.add_argument("--rebin", type=int, default=4)
    args = ap.parse_args()

    from fourdgs.models.gaussian_map import (
        empty_map, init_adam, inverse_sigmoid,
    )
    from fourdgs.ops.rasterize import RasterConfig
    from fourdgs.slam.camera import Intrinsics, make_frame
    from fourdgs.slam.keyframes import empty_store, store_keyframe
    from fourdgs.slam.mapping import MappingConfig, init_pose_adam, map_chunk

    intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6, width=640, height=480)
    cap = args.cap
    rng = np.random.default_rng(0)
    gmap = empty_map(cap)
    gmap = gmap._replace(
        params=gmap.params._replace(
            xyz=jnp.asarray(
                np.stack([
                    rng.uniform(-2, 2, cap), rng.uniform(-1.5, 1.5, cap),
                    rng.uniform(1.5, 6, cap),
                ], -1), jnp.float32),
            f_dc=jnp.asarray(rng.normal(0, 0.3, (cap, 3)), jnp.float32),
            scaling=jnp.asarray(
                rng.uniform(np.log(0.01), np.log(0.04), (cap, 3)), jnp.float32),
            opacity=jnp.asarray(
                np.full((cap, 1), inverse_sigmoid(0.7)), jnp.float32),
        ),
        alive=jnp.ones(cap, bool),
    )
    adam = init_adam(cap)

    vw = args.views - 2
    store = empty_store(16, intr.height, intr.width)
    img = jnp.asarray(rng.uniform(0, 1, (3, intr.height, intr.width)), jnp.float32)
    dep = jnp.full((intr.height, intr.width), 2.5, jnp.float32)
    for s in range(vw + 2):
        store = store_keyframe(
            store, s, make_frame(s, img, dep, jnp.eye(4), time=0.0),
            jnp.eye(4), jnp.zeros(2),
        )

    cfg = MappingConfig(
        num_window_views=vw, num_random_views=2,
        raster=RasterConfig(with_n_touched=False),
        rebin_every=args.rebin,
    )
    slots = jnp.arange(vw, dtype=jnp.int32)
    valid = jnp.ones(vw, bool)
    opt_pose = jnp.ones(vw, bool)
    pool = jnp.arange(8, dtype=jnp.int32) % (vw + 2)

    def run(n):
        return map_chunk(
            gmap, adam, store, slots, valid, opt_pose, pool,
            jnp.int32(2), init_pose_adam(vw), jax.random.key(0),
            jnp.int32(n), jnp.int32(-1), jnp.int32(0), intr, cfg,
        )

    t0 = time.perf_counter()
    res = run(1)
    jax.block_until_ready(res.final_loss)
    print(f"compile+1iter: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    res = run(args.iters)
    jax.block_until_ready(res.final_loss)
    dt = (time.perf_counter() - t0) * 1000
    print(
        f"map_chunk {args.iters} iters: {dt:.0f} ms -> "
        f"{dt / args.iters:.1f} ms/iter ({args.views} views), "
        f"loss={float(res.final_loss):.4f}"
    )

    if args.trace:
        with jax.profiler.trace(args.trace):
            res = run(5)
            jax.block_until_ready(res.final_loss)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
