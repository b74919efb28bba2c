#!/usr/bin/env python3
"""Profile one tracking frame and one mapping chunk on the real chip at
production shapes (32K-capacity bucket, 640x480, TUM fr3 intrinsics) —
the two hot loops of the SLAM benchmark. Prints wall timings; pass
--trace DIR to also dump a jax.profiler trace.

Usage: python scripts/profile_iters.py [--trace /tmp/trace] [--iters 30]
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--capacity", type=int, default=1 << 15)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fourdgs.utils.xla_cache import enable_compile_cache

    enable_compile_cache()

    from fourdgs.models.gaussian_map import (
        candidates_from_rgbd, empty_map, init_adam, insert,
    )
    from fourdgs.ops.rasterize import RasterConfig
    from fourdgs.slam.camera import Intrinsics, make_frame
    from fourdgs.slam.keyframes import empty_store, store_keyframe
    from fourdgs.slam.mapping import MappingConfig, init_pose_adam, map_chunk
    from fourdgs.slam.tracking import TrackingConfig, track_frame

    w, h = 640, 480
    intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6,
                      width=w, height=h)
    cap = args.capacity
    raster = RasterConfig(max_pairs=min(1 << 18, max(1 << 15, cap * 8)),
                          with_n_touched=False)

    # textured wall + slab scene at production resolution
    v, u = np.mgrid[0:h, 0:w]
    img = jnp.asarray(np.stack([
        0.5 + 0.4 * np.sin(u / 25.0),
        0.5 + 0.4 * np.cos(v / 31.0),
        0.5 + 0.3 * np.sin((u + v) / 40.0),
    ]).astype(np.float32))
    depth_np = np.full((h, w), 3.0, np.float32)
    depth_np[150:330, 200:480] = 2.0
    depth = jnp.asarray(depth_np)

    gmap = empty_map(cap)
    adam = init_adam(cap)
    cands = candidates_from_rgbd(
        jax.random.key(0), img, depth, jnp.eye(4),
        intr.fx, intr.fy, intr.cx, intr.cy,
        downsample=3, max_new=cap,
    )
    gmap, adam, n = insert(gmap, adam, cands, kf_id=0)
    print(f"map: {int(n)} gaussians / {cap} capacity")

    # --- tracking: full 100-iter while_loop -----------------------------
    tcfg = TrackingConfig(max_iters=100, converged_threshold=0.0,
                          raster=raster)
    frame = make_frame(1, img, depth, jnp.eye(4), time=0.1)
    T_init = jnp.eye(4, dtype=jnp.float32)

    def track():
        return track_frame(gmap, frame, T_init, jnp.zeros(2), intr, tcfg)

    t0 = time.time()
    r = track(); jax.block_until_ready(r.T_cw)
    print(f"track compile+run: {time.time()-t0:.1f} s")
    t = time.time(); r = track(); jax.block_until_ready(r.T_cw)
    dt = time.time() - t
    it = max(int(r.n_iters), 1)
    print(f"track_frame: {dt*1e3:.1f} ms / {it} iters = "
          f"{dt*1e3/it:.2f} ms/iter")

    # --- mapping chunk at the production window -------------------------
    mcfg = MappingConfig(num_window_views=8, num_random_views=2,
                         raster=raster)
    store = empty_store(16, h, w)
    from fourdgs.geometry import se3_exp

    for s in range(9):
        tau = jnp.asarray(np.array(
            [0.01 * s, -0.004 * s, 0.002 * s, 0.0, 0.003 * s, 0.0]
        ), jnp.float32)
        f = make_frame(s, img, depth, jnp.eye(4), time=0.1 * s)
        store = store_keyframe(store, s, f, se3_exp(tau), jnp.zeros(2))
    slots = jnp.arange(8, dtype=jnp.int32)
    valid = jnp.ones(8, bool)
    opt_pose = jnp.array([False] + [True] * 7)

    def chunk(n_it):
        return map_chunk(
            gmap, adam, store, slots, valid, opt_pose,
            jnp.arange(9, dtype=jnp.int32), jnp.int32(9),
            init_pose_adam(8), jax.random.key(0), jnp.int32(n_it),
            jnp.int32(-1), jnp.int32(0), intr, mcfg,
        )

    t0 = time.time()
    r = chunk(2); jax.block_until_ready(r.final_loss)
    print(f"map_chunk compile+2it: {time.time()-t0:.1f} s")
    t = time.time()
    r = chunk(args.iters); jax.block_until_ready(r.final_loss)
    dt = time.time() - t
    print(f"map_chunk: {dt*1e3:.0f} ms / {args.iters} iters = "
          f"{dt*1e3/args.iters:.1f} ms/iter ({mcfg.num_views} views), "
          f"loss={float(r.final_loss):.4f}")

    if args.trace:
        with jax.profiler.trace(args.trace):
            r = track(); jax.block_until_ready(r.T_cw)
            r = chunk(8); jax.block_until_ready(r.final_loss)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
