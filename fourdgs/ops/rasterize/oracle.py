"""Pure-jnp reference compositor (test oracle).

Implements exactly the compositing semantics of the CUDA renderCUDA loop
(cuda_rasterizer/forward.cu:263-392) in closed form:

  alpha_i   = min(0.99, op_i * exp(power_i)),  skip if power>0 or alpha<1/255
  T_i       = prod_{j<=i, valid} (1 - alpha_j)
  applied_i = valid_i & (T_i >= 1e-4)          # termination: T is monotone
                                               # non-increasing over valid
                                               # entries, so the first
                                               # valid T_i < 1e-4 and all
                                               # later ones are excluded —
                                               # identical to the CUDA
                                               # `done` flag.
  w_i       = applied_i * alpha_i * T_{i-1}
  C         = sum w_i c_i + T_final * bg ;  D = sum w_i depth_i
  out_alpha = 1 - T_final
  n_touched_i = #pixels with applied_i & (T_i > 0.5)

It also applies the tile-rectangle membership test (a Gaussian only
touches pixels whose tile lies in its rect — auxiliary.h getRect), so the
Pallas tile kernel and this oracle agree bit-for-bit up to summation
order. O(N*H*W) memory: for tests only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fourdgs.ops.rasterize.preprocess import (
    ALPHA_MAX,
    ALPHA_MIN,
    T_EPS,
    ScreenGaussians,
)


class RenderOutputs(NamedTuple):
    color: jax.Array      # (C, H, W)
    depth: jax.Array      # (H, W)
    alpha: jax.Array      # (H, W) accumulated opacity
    n_touched: jax.Array  # (N,) int32
    T_final: jax.Array    # (H, W)
    radii: jax.Array      # (N,) int32 screen-space radius (0 = culled)
    # () bool — the pair buffer overflowed (pairs were dropped; the
    # caller must re-render at a larger max_pairs for exact results).
    # Always False on the oracle path (it has no pair buffer).
    overflow: jax.Array
    # () int32 — real (tile, gaussian) pairs this render binned (max over
    # views on the multi path); drives occupancy-adaptive max_pairs
    # sizing in the runner. 0 on the oracle path.
    num_pairs: jax.Array


def composite_oracle(
    sg: ScreenGaussians,
    bg: jax.Array,
    width: int,
    height: int,
    tile: int = 16,
) -> RenderOutputs:
    n = sg.mean2d.shape[0]
    nch = sg.color.shape[1]
    order = jnp.argsort(jnp.where(sg.visible, sg.depth, jnp.inf))
    mx = sg.mean2d[order, 0][:, None]
    my = sg.mean2d[order, 1][:, None]
    ca = sg.conic[order, 0][:, None]
    cb = sg.conic[order, 1][:, None]
    cc = sg.conic[order, 2][:, None]
    op = sg.opacity[order][:, None]
    col = sg.color[order]                     # (N, C)
    dep = sg.depth[order][:, None]
    rad = sg.radius[order].astype(jnp.float32)[:, None]
    vis = sg.visible[order][:, None]

    v, u = jnp.mgrid[0:height, 0:width]
    px = u.reshape(-1).astype(jnp.float32)[None, :]
    py = v.reshape(-1).astype(jnp.float32)[None, :]

    # tile-rect membership (getRect semantics)
    tx_n = -(-width // tile)
    ty_n = -(-height // tile)
    tx0 = jnp.clip(jnp.floor((mx - rad) / tile), 0, tx_n)
    ty0 = jnp.clip(jnp.floor((my - rad) / tile), 0, ty_n)
    tx1 = jnp.clip(jnp.floor((mx + rad + tile - 1) / tile), 0, tx_n)
    ty1 = jnp.clip(jnp.floor((my + rad + tile - 1) / tile), 0, ty_n)
    ptx = jnp.floor(px / tile)
    pty = jnp.floor(py / tile)
    member = (ptx >= tx0) & (ptx < tx1) & (pty >= ty0) & (pty < ty1)

    dx = mx - px
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
    valid = member & vis & (power <= 0.0) & (alpha >= ALPHA_MIN)

    la = jnp.where(valid, jnp.log1p(-alpha), 0.0)
    cum = jnp.cumsum(la, axis=0)
    T_incl = jnp.exp(cum)
    applied = valid & (T_incl >= T_EPS)
    T_before = jnp.exp(cum - la)
    w = jnp.where(applied, alpha * T_before, 0.0)

    color_flat = col.T @ w                               # (C, HW)
    depth_flat = jnp.sum(w * dep, axis=0)
    T_final = jnp.exp(jnp.sum(jnp.where(applied, la, 0.0), axis=0))
    color_flat = color_flat + T_final[None, :] * bg[:, None]

    touched_sorted = jnp.sum((applied & (T_incl > 0.5)).astype(jnp.int32), axis=1)
    n_touched = jnp.zeros((n,), jnp.int32).at[order].set(touched_sorted)

    return RenderOutputs(
        color=color_flat.reshape(nch, height, width),
        depth=depth_flat.reshape(height, width),
        alpha=(1.0 - T_final).reshape(height, width),
        n_touched=n_touched,
        T_final=T_final.reshape(height, width),
        radii=sg.radius,
        overflow=jnp.zeros((), bool),
        num_pairs=jnp.zeros((), jnp.int32),
    )
