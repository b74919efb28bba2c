"""Tile binning: expand Gaussians to (tile, depth)-sorted pairs.

TPU-native replacement for the reference's cub prefix-sum + 64-bit-key
radix sort pipeline (cuda_rasterizer/rasterizer_impl.cu:280-320,
duplicateWithKeys/identifyTileRanges): we expand each visible Gaussian's
tile rectangle into (tile_id, gaussian_id) pairs with a static capacity,
sort lexicographically by (tile_id, depth) with `lax.sort(num_keys=2)`,
and recover per-tile ranges with `searchsorted`. All shapes are static;
overflow pairs are dropped (counted for diagnostics).

The rect math matches CUDA `getRect` (auxiliary.h): tiles
[(p-r)/T, (p+r+T-1)/T) clamped to the grid. `MAX_RECT` bounds the rect
slots per Gaussian; `preprocess(max_radius=...)` guarantees the true rect
fits, so nothing is silently truncated.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBins(NamedTuple):
    pair_gid: jax.Array     # (P,) int32 gaussian id per sorted pair (N = padding)
    pair_tile: jax.Array    # (P,) int32 tile id per sorted pair (num_tiles = padding)
    tile_start: jax.Array   # (num_tiles,) int32 offset of each tile's range
    tile_count: jax.Array   # (num_tiles,) int32 pairs in each tile
    num_pairs: jax.Array    # () int32 total real pairs (pre-drop)
    overflow: jax.Array     # () bool — pair buffer overflowed
    dense_gid: jax.Array    # (num_tiles, K) int32 per-tile gaussian ids, N = padding
    dense_valid: jax.Array  # (num_tiles, K) bool
    truncated: jax.Array    # () bool — some tile exceeded per-tile capacity K
    bygid_perm: jax.Array   # (P,) int32: sorted-pair positions ordered by gaussian id
    gid_bygid: jax.Array    # (P,) int32: gaussian ids in that order (ascending)


def tile_grid(width: int, height: int, tile: int) -> tuple[int, int]:
    return (-(-width // tile), -(-height // tile))


@partial(
    jax.jit,
    static_argnames=("width", "height", "tile", "max_rect", "max_pairs", "tile_cap"),
)
def bin_gaussians(
    mean2d: jax.Array,
    depth: jax.Array,
    radius: jax.Array,
    visible: jax.Array,
    *,
    width: int,
    height: int,
    tile: int = 16,
    max_rect: int = 64,
    max_pairs: int = 1 << 18,
    tile_cap: int = 1024,
) -> TileBins:
    n = mean2d.shape[0]
    tx_n, ty_n = tile_grid(width, height, tile)
    num_tiles = tx_n * ty_n

    mx, my = mean2d[:, 0], mean2d[:, 1]
    r = radius.astype(mx.dtype)
    tx0 = jnp.clip(jnp.floor((mx - r) / tile), 0, tx_n).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((my - r) / tile), 0, ty_n).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((mx + r + tile - 1) / tile), 0, tx_n).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((my + r + tile - 1) / tile), 0, ty_n).astype(jnp.int32)

    rect_w = tx1 - tx0
    touched = jnp.where(visible, rect_w * (ty1 - ty0), 0)
    touched = jnp.minimum(touched, max_rect)

    offsets = jnp.cumsum(touched) - touched  # exclusive prefix sum
    num_pairs = offsets[-1] + touched[-1]

    # (N, max_rect) pair expansion
    slot = jnp.arange(max_rect, dtype=jnp.int32)[None, :]
    safe_w = jnp.maximum(rect_w, 1)[:, None]
    d_ty = slot // safe_w
    d_tx = slot - d_ty * safe_w
    pair_tile = (ty0[:, None] + d_ty) * tx_n + (tx0[:, None] + d_tx)
    pair_ok = slot < touched[:, None]
    pos = jnp.where(pair_ok, offsets[:, None] + slot, max_pairs)

    gid_src = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, max_rect)
    )
    tiles_buf = jnp.full((max_pairs,), num_tiles, dtype=jnp.int32)
    gid_buf = jnp.full((max_pairs,), n, dtype=jnp.int32)
    tiles_buf = tiles_buf.at[pos.ravel()].set(pair_tile.ravel(), mode="drop")
    gid_buf = gid_buf.at[pos.ravel()].set(gid_src.ravel(), mode="drop")

    depth_pad = jnp.concatenate([depth, jnp.array([jnp.inf], depth.dtype)])
    pair_depth = depth_pad[jnp.minimum(gid_buf, n)]

    tile_sorted, _, gid_sorted = jax.lax.sort(
        (tiles_buf, pair_depth, gid_buf), num_keys=2
    )

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tile_ids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_sorted, tile_ids, side="right").astype(jnp.int32)
    tile_count = tile_end - tile_start

    # dense per-tile gather with capacity K
    k = jnp.arange(tile_cap, dtype=jnp.int32)[None, :]
    idx = tile_start[:, None] + k
    dense_valid = k < tile_count[:, None]
    gid_sorted_pad = jnp.concatenate([gid_sorted, jnp.array([n], jnp.int32)])
    dense_gid = jnp.where(
        dense_valid, gid_sorted_pad[jnp.minimum(idx, max_pairs)], n
    )

    # permutation of sorted-pair positions grouping pairs by gaussian id —
    # the backward pass reduces per-pair gradients to per-Gaussian
    # gradients with gathers + a segmented cumsum over this order instead
    # of a scatter-add (XLA scatters serialize on TPU). DCE'd when the
    # render is forward-only.
    gid_bygid, bygid_perm = jax.lax.sort(
        (gid_sorted, jnp.arange(max_pairs, dtype=jnp.int32)), num_keys=1
    )

    return TileBins(
        pair_gid=gid_sorted,
        pair_tile=tile_sorted,
        tile_start=tile_start,
        tile_count=tile_count,
        num_pairs=num_pairs,
        overflow=num_pairs > max_pairs,
        dense_gid=dense_gid,
        dense_valid=dense_valid,
        truncated=jnp.any(tile_count > tile_cap),
        bygid_perm=bygid_perm,
        gid_bygid=gid_bygid,
    )
