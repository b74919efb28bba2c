"""Bisect the forward-render hang: run ONE stage per process.

Usage: python scripts/bisect_fwd.py {pre|bins|gather|kernel|finalize|full}
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from fourdgs.data.synthetic import make_room_scene, orbit_pose
from fourdgs.geometry import projection_matrix
from fourdgs.ops.rasterize import RasterConfig
from fourdgs.ops.rasterize.preprocess import preprocess
from fourdgs.ops.rasterize.binning import bin_gaussians, tile_grid
from fourdgs.ops.rasterize.tile_kernel import (
    _csr_gather_pairs, _csr_fwd_impl, _chunk_ranges, _csr_finalize,
)

stage = sys.argv[1] if len(sys.argv) > 1 else "full"
W, H = 640, 480
FX, FY, CX, CY = 535.4, 539.2, 320.1, 247.6
cfg = RasterConfig(max_pairs=1 << 18)

pts, col, lscl, quats, opac = make_room_scene(0, 6000)
n = pts.shape[0]
proj = projection_matrix(FX, FY, CX, CY, W, H)
T_cw = jnp.asarray(orbit_pose(0.0), jnp.float32)
tanx, tany = (W / (2 * FX)), (H / (2 * FY))

xyz = jnp.asarray(pts)
scales = jnp.exp(jnp.asarray(lscl))
qs = jnp.asarray(quats)
op = jnp.asarray(opac)
cols = jnp.asarray(col)
alive = jnp.ones(n, bool)

print(f"[bisect] stage={stage} n={n} max_pairs={cfg.max_pairs}", flush=True)


def timed(name, f, *a):
    t0 = time.time()
    r = jax.block_until_ready(f(*a))
    print(f"[bisect] {name}: {time.time()-t0:.2f}s", flush=True)
    return r


@jax.jit
def run_pre(xyz, scales, qs, op, T_cw):
    return preprocess(
        xyz, scales, qs, op, cols, alive, T_cw, proj,
        fx=FX, fy=FY, width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
        max_radius=cfg.max_radius,
    )


sg = timed("preprocess", run_pre, xyz, scales, qs, op, T_cw)
if stage == "pre":
    sys.exit(0)

tx_n, ty_n = tile_grid(W, H, cfg.tile)


@jax.jit
def run_bins(sg):
    return bin_gaussians(
        sg.mean2d, sg.depth, sg.radius, sg.visible & alive,
        width=W, height=H, tile=cfg.tile, max_rect=cfg.max_rect,
        max_pairs=cfg.max_pairs, tile_cap=cfg.tile_cap,
        opacity=op, cull_radius=sg.sigma3,
    )


bins = timed("bins", run_bins, sg)
print(f"[bisect] num_pairs={int(bins.num_pairs)} overflow={bool(bins.overflow)}",
      flush=True)
if stage == "bins":
    sys.exit(0)


def fields_of(sg):
    # fields order: geo [mx,my,ca,cb,cc,depth], app [op,r,g,b]
    fg = jnp.stack([sg.mean2d[:, 0], sg.mean2d[:, 1], sg.conic[:, 0],
                    sg.conic[:, 1], sg.conic[:, 2], sg.depth], axis=1)
    fa = jnp.concatenate([sg.opacity[:, None], cols], axis=1)
    fg = jnp.pad(fg, ((0, 1), (0, 0)))
    fa = jnp.pad(fa, ((0, 1), (0, 0)))
    return fg, fa


@jax.jit
def run_gather(sg, bins):
    fg, fa = fields_of(sg)
    return _csr_gather_pairs(fg, fa, bins.aligned_gid)


pairs = timed("gather", run_gather, sg, bins)
if stage == "gather":
    sys.exit(0)


@jax.jit
def run_kernel(pairs, bins):
    part, nt, bounds = _csr_fwd_impl(
        pairs, bins.chunk_tile, bins.chunk_first,
        tx_n=tx_n, ty_n=ty_n, tile=cfg.tile, img_w=W, img_h=H,
        tiles_per_view=tx_n * ty_n, n_tiles_total=tx_n * ty_n,
    )
    return part.sum(), nt.sum(), bounds.sum()


r = timed("kernel", run_kernel, pairs, bins)
print("[bisect] kernel sums:", [float(x) for x in r], flush=True)
if stage == "kernel":
    sys.exit(0)


@jax.jit
def run_finalize(pairs, bins):
    part, nt, bounds = _csr_fwd_impl(
        pairs, bins.chunk_tile, bins.chunk_first,
        tx_n=tx_n, ty_n=ty_n, tile=cfg.tile, img_w=W, img_h=H,
        tiles_per_view=tx_n * ty_n, n_tiles_total=tx_n * ty_n,
    )
    cs, nc = _chunk_ranges(bins.tile_count)
    tot6 = _csr_finalize(part, cs, nc, cfg.tile * cfg.tile)
    return tot6.sum()


r = timed("finalize", run_finalize, pairs, bins)
print("[bisect] finalize sum:", float(r), flush=True)
