"""Op-level trace of the tracking loop on the real TPU."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fourdgs.utils.xla_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from scripts.trace_summary import profile_top_ops


def main():
    from fourdgs.models.gaussian_map import empty_map, inverse_sigmoid
    from fourdgs.ops.rasterize import RasterConfig
    from fourdgs.slam.camera import Intrinsics, make_frame
    from fourdgs.slam.tracking import TrackingConfig, track_frame

    intr = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6, width=640, height=480)
    cap = 32768
    rng = np.random.default_rng(0)
    gmap = empty_map(cap)
    gmap = gmap._replace(
        params=gmap.params._replace(
            xyz=jnp.asarray(np.stack([
                rng.uniform(-2, 2, cap), rng.uniform(-1.5, 1.5, cap),
                rng.uniform(1.5, 6, cap)], -1), jnp.float32),
            f_dc=jnp.asarray(rng.normal(0, 0.3, (cap, 3)), jnp.float32),
            scaling=jnp.asarray(
                rng.uniform(np.log(0.01), np.log(0.04), (cap, 3)), jnp.float32),
            opacity=jnp.asarray(
                np.full((cap, 1), inverse_sigmoid(0.7)), jnp.float32),
        ),
        alive=jnp.ones(cap, bool),
    )
    img = jnp.asarray(rng.uniform(0, 1, (3, intr.height, intr.width)), jnp.float32)
    dep = jnp.full((intr.height, intr.width), 2.5, jnp.float32)
    frame = make_frame(0, img, dep, jnp.eye(4), time=0.0)

    cfg = TrackingConfig(
        max_iters=100, rebin_every=8,
        converged_threshold=0.0,
        raster=RasterConfig(with_n_touched=False),
    )
    res = track_frame(gmap, frame, jnp.eye(4), jnp.zeros(2), intr, cfg)
    jax.block_until_ready(res.T_cw)
    profile_top_ops(
        lambda: track_frame(gmap, frame, jnp.eye(4), jnp.zeros(2), intr, cfg),
        n=2, top=30,
    )


if __name__ == "__main__":
    main()
