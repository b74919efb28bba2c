"""Tile binning: expand Gaussians to (tile, depth)-sorted pairs.

TPU-native replacement for the reference's cub prefix-sum + 64-bit-key
radix sort pipeline (cuda_rasterizer/rasterizer_impl.cu:280-320,
duplicateWithKeys/identifyTileRanges). The design is scatter-free — XLA
scatters serialize on TPU (~20ms for 4M updates on v5e) while its sorts
run at memory speed — so compaction happens inside the sort:

  1. every Gaussian expands to a static MAX_RECT candidate block
     (invalid slots keyed past the last tile),
  2. ONE lexicographic `lax.sort` over (tile, depth) moves all real
     pairs to the front, grouped per tile in depth order; the first
     `max_pairs` entries are the pair buffer,
  3. per-tile ranges come from `searchsorted`,
  4. a second small sort by gaussian id yields the permutation used by
     the backward pass to reduce per-pair gradients to per-Gaussian
     gradients with gathers + a segmented cumsum (no scatter-add — the
     CUDA version needs atomics here, backward.cu:759-784).

The rect math matches CUDA `getRect` (auxiliary.h): tiles
[(p-r)/T, (p+r+T-1)/T) clamped to the grid. `preprocess(max_radius=...)`
caps radii so the true rect always fits MAX_RECT — nothing is silently
truncated (for tile=16, MAX_RECT=16 admits radii up to 24px; the
reference's own size_threshold=20 pruning keeps Gaussians under that).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fourdgs.ops.rasterize.tile_kernel import CHUNK, SUBS

# main-table width of the per-gaussian reduction tables: 4 slots cover a
# full 2x2-tile footprint (radius <= tile px), the common case by far
TAIL_K1 = 4


def tail_table_size(n1: int, max_pairs: int) -> int:
    """Static row capacity of the compacted tail table. Exactness does
    not depend on it (reduce_aligned_by_gaussian falls back to the full
    rest table when tail_count exceeds it); it only bounds the fast
    path's gather size."""
    return int(max(128, min(n1, max_pairs // 16)))


class TileBins(NamedTuple):
    tile_start: jax.Array   # (num_tiles,) int32 offset of each tile's range
    tile_count: jax.Array   # (num_tiles,) int32 pairs in each tile
    num_pairs: jax.Array    # () int32 total real pairs
    # () int32 slots the CHUNK-aligned layout NEEDS (total_chunks*CHUNK
    # >= num_pairs: every non-empty tile rounds up to a CHUNK multiple,
    # so at 640x480 the ~1200-tile grid alone needs ~154K slots however
    # few pairs there are). THIS — not num_pairs — is the number the
    # runner's adaptive budget must cover; sizing from num_pairs alone
    # made every 640x480 tracking bucket below 1<<18 overflow instantly
    # (the round-4 bench fault path).
    aligned_slots: jax.Array
    overflow: jax.Array     # () bool — pair buffer overflowed
    truncated: jax.Array    # () bool — some tile exceeded per-tile capacity K
    # Per-gaussian candidate -> aligned-slot tables for the backward
    # reduction, ROW-COMPACTED: each gaussian's valid slots are sorted to
    # the front, split into a narrow main table (first TAIL_K1 slots —
    # covers the typical <= 2x2-tile footprint) plus a rest table read
    # only for the few gaussians with wider footprints (ids compacted
    # into tail_ids). The reduction gather is row-count-bound on TPU
    # (~1.3 ns/row), and the full (N+1, max_rect) table is ~70% invalid
    # slots at production occupancy — compaction cuts its cost ~4x.
    cand_main: jax.Array   # (N+1, min(TAIL_K1, max_rect)) int32 (-1 = none)
    cand_rest: jax.Array   # (N+1, max(max_rect - TAIL_K1, 1)) int32
    tail_ids: jax.Array    # (M,) int32 gaussian ids with >TAIL_K1 slots,
    #                        valid-first (padded with arbitrary tail-free
    #                        ids whose rest rows are all -1)
    tail_count: jax.Array  # () int32 — number of gaussians with a tail;
    #                        > M triggers the exact full-table fallback
    # --- CSR chunk layout (flat chunk-grid compositor) ---
    # Pairs re-laid-out so every tile's segment starts on a CHUNK
    # boundary; the kernel grid is one program per CHUNK of real pairs
    # (plus alignment pad), so padded-tile waste never hits the DMA
    # pipeline (the dense layout pays K=tile_cap per tile regardless of
    # count).
    aligned_gid: jax.Array    # (P,) int32 gaussian id per ALIGNED slot (N = pad)
    aligned_start: jax.Array  # (num_tiles,) int32 aligned slot offset per tile
    chunk_tile: jax.Array     # (P//CHUNK,) int32 tile of each chunk (num_tiles = pad)
    chunk_first: jax.Array    # (P//CHUNK,) int32 1 if first chunk of its tile
    chunk_last: jax.Array     # (P//CHUNK,) int32 1 if last chunk of its tile


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
    max_rect: int = 16,
    max_pairs: int = 1 << 18,
    tile_cap: int = 1024,
    opacity: jax.Array | None = None,
    cull_radius: jax.Array | None = None,
) -> TileBins:
    # the CSR compositor walks the pair buffer CHUNK*SUBS slots per grid
    # program (tile_kernel.py: c_max // SUBS); a non-multiple max_pairs
    # would silently floor-drop tail chunks
    if max_pairs % (CHUNK * SUBS):
        raise ValueError(
            f"max_pairs ({max_pairs}) must be a multiple of {CHUNK * SUBS} "
            "(CSR chunk size x kernel sub-chunks)"
        )
    n = mean2d.shape[0]
    tx_n, ty_n = tile_grid(width, height, tile)
    num_tiles = tx_n * ty_n
    n_cand = n * max_rect

    mx, my = mean2d[:, 0], mean2d[:, 1]
    r = radius.astype(mx.dtype)
    tx0 = jnp.clip(jnp.floor((mx - r) / tile), 0, tx_n).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((my - r) / tile), 0, ty_n).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((mx + r + tile - 1) / tile), 0, tx_n).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((my + r + tile - 1) / tile), 0, ty_n).astype(jnp.int32)

    rect_w = tx1 - tx0
    touched_rect = jnp.where(visible, rect_w * (ty1 - ty0), 0)
    touched_rect = jnp.minimum(touched_rect, max_rect)

    # (N, max_rect) candidate expansion; invalid slots key past every tile
    slot = jnp.arange(max_rect, dtype=jnp.int32)[None, :]
    safe_w = jnp.maximum(rect_w, 1)[:, None]
    d_ty = slot // safe_w
    d_tx = slot - d_ty * safe_w
    cand_tile = (ty0[:, None] + d_ty) * tx_n + (tx0[:, None] + d_tx)
    cand_ok = slot < touched_rect[:, None]

    if opacity is not None:
        # opacity-aware per-tile culling (EQUIVALENCE-preserving): the
        # compositor zeroes contributions with alpha < ALPHA_MIN
        # (forward.cu:355 semantics), and alpha <= op * exp(-4.5 d^2/s^2)
        # everywhere for s = the TRUE (uncapped) 3-sigma radius
        # (lambda_min(conic) = 1/lambda_max(cov) = 9/s^2), so a candidate
        # tile whose NEAREST pixel to the mean lies beyond
        # d_max = s * sqrt(ln(255 op)/4.5) contributes exactly zero —
        # drop the pair before it ever hits the sort/kernel/backward. The
        # CUDA reference streams these dead rect-corner pairs through its
        # whole pipeline. `cull_radius` MUST be the uncapped sigma3: the
        # max_radius-capped footprint radius can be smaller than 3 sigma,
        # and using it here would over-cull tiles of radius-capped
        # Gaussians that still contribute alpha >= 1/255.
        rc = r if cull_radius is None else cull_radius.astype(mx.dtype)
        rc = jnp.maximum(rc, r)
        tlo_x = ((tx0[:, None] + d_tx) * tile).astype(mx.dtype)
        tlo_y = ((ty0[:, None] + d_ty) * tile).astype(mx.dtype)
        nx = jnp.clip(mx[:, None], tlo_x, tlo_x + (tile - 1))
        ny = jnp.clip(my[:, None], tlo_y, tlo_y + (tile - 1))
        d2 = (mx[:, None] - nx) ** 2 + (my[:, None] - ny) ** 2
        op = jnp.clip(opacity, 1.0 / 255.0, None)
        dmax2 = (rc * rc * (jnp.log(255.0 * op) / 4.5))[:, None]
        cand_ok = cand_ok & (d2 <= dmax2)

    touched = jnp.sum(cand_ok, axis=1).astype(jnp.int32)
    num_pairs = jnp.sum(touched)
    cand_tile = jnp.where(cand_ok, cand_tile, num_tiles).reshape(-1)
    cand_depth = jnp.where(
        cand_ok, jnp.broadcast_to(depth[:, None], (n, max_rect)), jnp.inf
    ).reshape(-1)

    # sort-compaction: real pairs land in the first num_pairs slots,
    # grouped by tile in depth order (lax.sort is stable). The candidate
    # ORIGIN index rides along so the per-gaussian aligned-slot table can
    # be built by sorting back (a second sort) instead of by 262K/524K-row
    # index gathers, which run ~15 ns/row on TPU — 3x a sort's cost.
    # The gaussian id is NOT carried: gid == origin // max_rect (the
    # expansion is a dense (N, max_rect) grid), and the only consumer
    # (aligned_gid) reads it under the a_real mask, where every slot is a
    # valid pair — so deriving it saves 25% of the sort payload.
    origin = jnp.arange(n_cand, dtype=jnp.int32)
    tile_s, _, org_s = jax.lax.sort(
        (cand_tile, cand_depth, origin), num_keys=2
    )
    if n_cand >= max_pairs:
        pair_tile = tile_s[:max_pairs]
        pair_gid = org_s[:max_pairs] // max_rect
    else:
        pair_tile = jnp.pad(tile_s, (0, max_pairs - n_cand), constant_values=num_tiles)
        pair_gid = jnp.pad(
            org_s // max_rect, (0, max_pairs - n_cand), constant_values=n
        )

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(pair_tile, tile_ids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(pair_tile, tile_ids, side="right").astype(jnp.int32)
    tile_count = tile_end - tile_start

    # --- CSR chunk layout: CHUNK-aligned per-tile segments -------------
    n_chunks = -(-tile_count // CHUNK)                       # (T,)
    chunk_start = (jnp.cumsum(n_chunks) - n_chunks).astype(jnp.int32)
    total_chunks = chunk_start[-1] + n_chunks[-1]
    c_max = max_pairs // CHUNK

    cidx = jnp.arange(c_max, dtype=jnp.int32)
    # tile owning chunk c: last t with chunk_start[t] <= c (zero-chunk
    # tiles tie on start; side='right' lands past all ties, so only a
    # tile with n_chunks>0 can own a chunk)
    t_of = (
        jnp.searchsorted(chunk_start, cidx, side="right").astype(jnp.int32) - 1
    )
    t_of = jnp.clip(t_of, 0, num_tiles - 1)
    c_valid = cidx < total_chunks
    chunk_pos = cidx - chunk_start[t_of]
    chunk_tile = jnp.where(c_valid, t_of, num_tiles)
    chunk_first = (c_valid & (chunk_pos == 0)).astype(jnp.int32)
    # the buffer-final chunk counts as its tile's last even when the tile
    # is truncated (total_chunks > c_max): the REVERSED backward grid
    # initializes its accumulator only at last-chunks — without this a
    # truncated run (pre-re-run at a larger bucket) would read
    # uninitialized VMEM scratch
    chunk_last = (
        c_valid & ((chunk_pos == n_chunks[t_of] - 1) | (cidx == c_max - 1))
    ).astype(jnp.int32)

    aligned_start = chunk_start * CHUNK
    # per-slot quantities via per-CHUNK gathers + broadcast (1-D per-slot
    # gathers over max_pairs run ~15 ns/element on TPU — five of them cost
    # more than the whole compositor kernel)
    rep = lambda a: jnp.broadcast_to(
        a[:, None], (c_max, CHUNK)
    ).reshape(-1)
    lane = jnp.tile(jnp.arange(CHUNK, dtype=jnp.int32), c_max)
    src_base = tile_start[t_of] + chunk_pos * CHUNK          # (c_max,)
    count_of = tile_count[t_of]                              # (c_max,)
    k_sp = rep(chunk_pos * CHUNK) + lane
    a_real = rep(c_valid.astype(jnp.int32)).astype(bool) & (
        k_sp < rep(count_of)
    )
    # invalid slots must not share one clipped dummy index: the TPU
    # vector-gather emitter serializes on duplicate rows (VMEM bank
    # conflicts). Valid slots are duplicate-free, so spreading the
    # dummies across distinct rows keeps the gather conflict-free.
    sp_all = jnp.arange(max_pairs, dtype=jnp.int32)
    src = jnp.where(
        a_real, jnp.clip(rep(src_base) + lane, 0, max_pairs - 1), sp_all
    )
    aligned_gid = jnp.where(a_real, pair_gid[src], n)

    # per-gaussian candidate -> aligned-slot table: the ONLY index table
    # the backward per-gaussian reduction needs — built once per
    # (re)binning instead of gathered in every backward pass (that gather
    # profiled at ~3.5 ms/iteration inside the tracking loop). The
    # aligned slot of by-tile pair p is p + shift[tile(p)]; sorting
    # (origin, aligned_pos) back over the full expansion domain lays the
    # slots out per-gaussian row-major — within-row order is irrelevant
    # to the reduction's masked sum, and one 524K sort costs ~half of the
    # two big index gathers it replaces.
    shift = aligned_start - tile_start                       # (T,)
    sp = jnp.arange(max_pairs, dtype=jnp.int32)
    p_valid = pair_tile < num_tiles
    apos_raw = sp + shift[jnp.minimum(pair_tile, num_tiles - 1)]
    # TRUNCATION SAFETY: when the aligned layout overflows (overflow flag
    # below; the caller re-runs at a larger bucket), slots past the
    # buffer must become -1 (no slot), NOT clip to max_pairs-1 — clipping
    # maps thousands of pairs onto ONE duplicate row and the backward
    # reduction gathers serialize on duplicate rows (and sum garbage)
    aligned_pos = jnp.where(
        p_valid & (apos_raw < max_pairs), jnp.maximum(apos_raw, 0), -1
    )
    if n_cand >= max_pairs:
        # sorted slots past the pair buffer are overflow: no aligned slot
        apos_full = jnp.concatenate(
            [aligned_pos, jnp.full((n_cand - max_pairs,), -1, jnp.int32)]
        )
    else:
        apos_full = aligned_pos[:n_cand]
    _, ca_flat = jax.lax.sort((org_s, apos_full), num_keys=1)
    cand_aligned = jnp.concatenate(
        [
            ca_flat.reshape(n, max_rect),
            jnp.full((1, max_rect), -1, jnp.int32),
        ]
    )                                                        # (N+1, R)

    # row compaction: valid slots first (within-row order is irrelevant
    # to the reduction's masked sum), then split main/rest and compact
    # the ids of rows whose footprint spills past the main width
    k1 = min(TAIL_K1, max_rect)
    cand_sorted = -jnp.sort(-cand_aligned, axis=1)
    cand_main = cand_sorted[:, :k1]
    if max_rect > k1:
        cand_rest = cand_sorted[:, k1:]
    else:
        cand_rest = jnp.full((n + 1, 1), -1, jnp.int32)
    tail_any = cand_rest[:, 0] >= 0
    m_tail = tail_table_size(n + 1, max_pairs)
    tail_ids = jnp.argsort(jnp.where(tail_any, 0, 1))[:m_tail].astype(
        jnp.int32
    )
    tail_count = jnp.sum(tail_any.astype(jnp.int32))

    return TileBins(
        tile_start=tile_start,
        tile_count=tile_count,
        num_pairs=num_pairs,
        aligned_slots=total_chunks * CHUNK,
        # aligned layout spills before the raw buffer does (alignment pad
        # inflates by < num_tiles*CHUNK); fold it into the same flag
        overflow=(num_pairs > max_pairs) | (total_chunks > c_max),
        truncated=jnp.any(tile_count > tile_cap),
        cand_main=cand_main,
        cand_rest=cand_rest,
        tail_ids=tail_ids,
        tail_count=tail_count,
        aligned_gid=aligned_gid,
        aligned_start=aligned_start,
        chunk_tile=chunk_tile,
        chunk_first=chunk_first,
        chunk_last=chunk_last,
    )
