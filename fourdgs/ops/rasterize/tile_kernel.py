"""Pallas TPU tile compositor (forward + analytic backward).

Design (TPU-native replacement for cuda_rasterizer forward.cu renderCUDA /
backward.cu renderCUDA):

  * grid = one program per 16x16 image tile; the tile's depth-sorted
    Gaussian list arrives as a dense (FIELDS, K) VMEM block produced by
    the binner (padding entries have opacity 0 and contribute nothing).
  * inside a program, pixels live in SUBLANES (256 = 16x16 flattened) and
    Gaussians in LANES (chunks of 128), so every op is a well-tiled
    (256, 128) VPU op; the per-pixel transmittance recurrence is made
    parallel with a closed form: cumulative sums of log(1-alpha) along the
    lane axis, computed as a matmul with a constant triangular matrix on
    the MXU.
  * termination (`T < 1e-4 -> done`) is exact without a sequential scan:
    T is monotone non-increasing over valid entries, so
    `applied = valid & (T_inclusive >= 1e-4)` reproduces the CUDA done
    flag (see oracle.py for the argument).
  * per-tile pair counts are scalar-prefetched; chunks past the count are
    skipped with predicated execution, and a whole-tile early exit fires
    once every pixel is saturated — the vectorized analogue of the CUDA
    block-vote `__syncthreads_count(done)` (forward.cu:318-321).
  * the backward pass needs no atomics: each sorted (tile, Gaussian) pair
    is owned by exactly one tile program, so per-pair gradients are
    written disjointly and reduced to per-Gaussian gradients outside the
    kernel by gathers + a segmented cumsum over a by-gaussian permutation
    (XLA scatter-adds serialize on TPU; this path has none) — replacing
    the CUDA block-reduce + atomicAdd pattern (backward.cu:759-784).

The public entry `composite_from_fields` is a `jax.custom_vjp`; everything
upstream (EWA preprocess, SE(3) pose chain, SH) and downstream (losses)
is plain jnp and differentiates through it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fourdgs.ops.rasterize.preprocess import ALPHA_MAX, ALPHA_MIN, T_EPS

# pair-field row indices in the dense (FIELDS, K) block. Geometry fields
# (the camera-pose gradient chain) come first, appearance last, so the
# fields enter the custom_vjp as two arrays and pose-only consumers
# (tracking) let XLA DCE the appearance gradient reduction entirely.
F_MX, F_MY, F_CA, F_CB, F_CC, F_DEPTH, F_OP, F_R, F_G, F_B = range(10)
NUM_GEO = 6
NUM_FIELDS = 10
NCH = 3
CHUNK = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pixel_coords(tile_idx, tx_n: int, tile: int):
    """(npix, 1) f32 pixel x/y coordinates for this tile program."""
    ty = tile_idx // tx_n
    tx = tile_idx - ty * tx_n
    lin = jax.lax.broadcasted_iota(jnp.int32, (tile * tile, 1), 0)
    px = (tx * tile + lin % tile).astype(jnp.float32)
    py = (ty * tile + lin // tile).astype(jnp.float32)
    return px, py


def _tri_incl(dtype=jnp.float32):
    """(CHUNK, CHUNK) upper-triangular (incl. diagonal) ones: X @ TRI is an
    inclusive cumsum along lanes."""
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (r <= c).astype(dtype)


def _chunk_quantities(pairs, c0, px, py):
    """Shared forward recomputation for one lane-chunk of Gaussians.
    All arrays are (npix, CHUNK)."""
    sl = pl.ds(c0, CHUNK)
    mx = pairs[0, F_MX, sl][None, :]
    my = pairs[0, F_MY, sl][None, :]
    ca = pairs[0, F_CA, sl][None, :]
    cb = pairs[0, F_CB, sl][None, :]
    cc = pairs[0, F_CC, sl][None, :]
    op = pairs[0, F_OP, sl][None, :]
    dx = mx - px
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g = jnp.exp(power)
    raw = op * g
    alpha = jnp.minimum(ALPHA_MAX, raw)
    valid = (power <= 0.0) & (alpha >= ALPHA_MIN)
    la = jnp.where(valid, jnp.log1p(-alpha), 0.0)
    return dict(
        dx=dx, dy=dy, ca=ca, cb=cb, cc=cc, op=op,
        g=g, raw=raw, alpha=alpha, valid=valid, la=la, sl=sl,
    )


# scratch accumulator columns: [r, g, b, depth, cum_valid, la_applied, _, _]
A_R, A_G, A_B, A_D, A_CUM, A_LA = 0, 1, 2, 3, 4, 5


def _fwd_kernel(count_ref, pairs_ref, out_ref, nt_ref, bounds_ref, acc_ref,
                done_ref,
                *, k: int, tx_n: int, tile: int, img_w: int, img_h: int,
                tiles_per_view: int | None = None):
    t = pl.program_id(0)
    if tiles_per_view is not None:
        t = t % tiles_per_view  # multi-view: programs tile V stacked views
    npix = tile * tile
    px, py = _pixel_coords(t, tx_n, tile)
    inside = (px < img_w) & (py < img_h)
    tri = _tri_incl()
    count = count_ref[pl.program_id(0)]

    acc_ref[:, :] = jnp.zeros((npix, 8), jnp.float32)
    nt_ref[0, 0, :] = jnp.zeros((k,), jnp.float32)
    # chunk-entry log-transmittance boundaries, saved for the single-pass
    # backward; -1e30 marks never-executed chunks (exp -> 0 -> no grads)
    bounds_ref[0, :, :] = jnp.full((k // CHUNK, npix), -1e30, jnp.float32)
    done_ref[0] = 0

    for c in range(k // CHUNK):
        @pl.when((c * CHUNK < count) & (done_ref[0] == 0))
        def _chunk():
            bounds_ref[0, c, :] = acc_ref[:, A_CUM]
            q = _chunk_quantities(pairs_ref, c * CHUNK, px, py)
            cum = acc_ref[:, A_CUM:A_CUM + 1] + jnp.dot(
                q["la"], tri, preferred_element_type=jnp.float32
            )
            t_incl = jnp.exp(cum)
            applied = q["valid"] & (t_incl >= T_EPS)
            t_before = jnp.exp(cum - q["la"])
            w = jnp.where(applied, q["alpha"] * t_before, 0.0)

            for ch, f in enumerate((F_R, F_G, F_B)):
                cch = pairs_ref[0, f, q["sl"]][None, :]
                acc_ref[:, ch:ch + 1] += jnp.sum(w * cch, axis=1, keepdims=True)
            dep = pairs_ref[0, F_DEPTH, q["sl"]][None, :]
            acc_ref[:, A_D:A_D + 1] += jnp.sum(w * dep, axis=1, keepdims=True)

            nt = jnp.sum(
                (applied & (t_incl > 0.5) & inside).astype(jnp.float32),
                axis=0, keepdims=True,
            )
            nt_ref[0, 0, pl.ds(c * CHUNK, CHUNK)] = nt[0, :]

            acc_ref[:, A_LA:A_LA + 1] += jnp.sum(
                jnp.where(applied, q["la"], 0.0), axis=1, keepdims=True
            )
            acc_ref[:, A_CUM:A_CUM + 1] = cum[:, CHUNK - 1:CHUNK]
            # whole-tile early exit once every pixel is saturated
            done_ref[0] = jnp.where(
                jnp.all(t_incl[:, CHUNK - 1] < T_EPS), 1, 0
            ).astype(jnp.int32)

    acc = acc_ref[:, :]
    t_final = jnp.exp(acc[:, A_LA:A_LA + 1])
    out = jnp.concatenate(
        [acc[:, 0:4], t_final, jnp.zeros((npix, 3), jnp.float32)], axis=1
    )
    out_ref[0, :, :] = out


def _bwd_kernel(count_ref, pairs_ref, g_ref, bounds_ref, dpairs_ref, acc_ref,
                *, k: int, tx_n: int, tile: int, img_w: int, img_h: int,
                tiles_per_view: int | None = None):
    """Single REVERSE pass over the chunks: the forward saved the
    chunk-entry log-transmittance (bounds), so each chunk's in-chunk
    prefix reconstructs locally and the cross-pair suffix term
    sum_{j>i} w_j u_j accumulates back-to-front — no totals pre-pass
    (the CUDA backward re-walks back-to-front the same way,
    backward.cu:562-660, but needed atomics; here chunk suffixes are a
    triangular matmul and the accumulator lives in VMEM)."""
    t = pl.program_id(0)
    count = count_ref[pl.program_id(0)]
    if tiles_per_view is not None:
        t = t % tiles_per_view
    npix = tile * tile
    px, py = _pixel_coords(t, tx_n, tile)
    tri = _tri_incl()

    g_c = g_ref[0, :, 0:NCH]            # (npix, 3)
    g_d = g_ref[0, :, NCH:NCH + 1]      # (npix, 1)
    g_tf = g_ref[0, :, NCH + 1:NCH + 2]
    t_final = g_ref[0, :, NCH + 2:NCH + 3]  # saved forward output

    dpairs_ref[0, :, :] = jnp.zeros((NUM_FIELDS, k), jnp.float32)
    acc_ref[:, :] = jnp.zeros((npix, 8), jnp.float32)  # col 0: suffix_acc

    def payload(q):
        """u_i = sum_ch g_ch * c_ch,i + g_d * depth_i. All four output
        channels share one suffix chain: sum_ch g_ch*S_ch + g_d*S_d =
        suffix(w*u), so the backward needs ONE cumsum matmul per chunk
        instead of four."""
        u = g_d * pairs_ref[0, F_DEPTH, q["sl"]][None, :]
        for ch, f in enumerate((F_R, F_G, F_B)):
            u = u + g_c[:, ch:ch + 1] * pairs_ref[0, f, q["sl"]][None, :]
        return u

    for c in reversed(range(k // CHUNK)):
        @pl.when(c * CHUNK < count)
        def _chunk():
            q = _chunk_quantities(pairs_ref, c * CHUNK, px, py)
            la = q["la"]
            cum = bounds_ref[0, c, :][:, None] + jnp.dot(
                la, tri, preferred_element_type=jnp.float32
            )
            t_incl = jnp.exp(cum)
            applied = q["valid"] & (t_incl >= T_EPS)
            t_before = jnp.exp(cum - la)
            w = jnp.where(applied, q["alpha"] * t_before, 0.0)

            inv_1ma = 1.0 / jnp.maximum(1.0 - q["alpha"], 1e-6)

            u = payload(q)
            wu = w * u
            incl = jnp.dot(wu, tri, preferred_element_type=jnp.float32)
            chunk_tot = incl[:, CHUNK - 1:CHUNK]
            # sum_{j>i} wu_j = (in-chunk strict suffix) + later-chunk acc
            suffix_u = (chunk_tot - incl) + acc_ref[:, 0:1]
            dalpha = (
                u * t_before
                - suffix_u * inv_1ma
                - g_tf * t_final * inv_1ma
            )
            acc_ref[:, 0:1] += chunk_tot

            unclamped = (q["raw"] < ALPHA_MAX).astype(jnp.float32)
            dalpha = jnp.where(applied, dalpha, 0.0) * unclamped
            dpower = q["raw"] * dalpha          # d alpha / d power = op * G
            dop_pp = q["g"] * dalpha            # d alpha / d op = G

            dx, dy, ca, cb, cc = q["dx"], q["dy"], q["ca"], q["cb"], q["cc"]
            sl = q["sl"]
            dpairs_ref[0, F_OP, sl] = jnp.sum(dop_pp, axis=0, keepdims=True)[0, :]
            dpairs_ref[0, F_CA, sl] = jnp.sum(-0.5 * dx * dx * dpower, axis=0, keepdims=True)[0, :]
            dpairs_ref[0, F_CB, sl] = jnp.sum(-dx * dy * dpower, axis=0, keepdims=True)[0, :]
            dpairs_ref[0, F_CC, sl] = jnp.sum(-0.5 * dy * dy * dpower, axis=0, keepdims=True)[0, :]
            dpairs_ref[0, F_MX, sl] = jnp.sum(-(ca * dx + cb * dy) * dpower, axis=0, keepdims=True)[0, :]
            dpairs_ref[0, F_MY, sl] = jnp.sum(-(cc * dy + cb * dx) * dpower, axis=0, keepdims=True)[0, :]
            dpairs_ref[0, F_R, sl] = jnp.sum(g_c[:, 0:1] * w, axis=0, keepdims=True)[0, :]
            dpairs_ref[0, F_G, sl] = jnp.sum(g_c[:, 1:2] * w, axis=0, keepdims=True)[0, :]
            dpairs_ref[0, F_B, sl] = jnp.sum(g_c[:, 2:3] * w, axis=0, keepdims=True)[0, :]
            dpairs_ref[0, F_DEPTH, sl] = jnp.sum(g_d * w, axis=0, keepdims=True)[0, :]


def _composite_fwd_impl(pairs, tile_count, *, tx_n, ty_n, tile, img_w, img_h,
                        tiles_per_view=None):
    num_tiles, _, k = pairs.shape
    npix = tile * tile
    kern = functools.partial(
        _fwd_kernel, k=k, tx_n=tx_n, tile=tile, img_w=img_w, img_h=img_h,
        tiles_per_view=tiles_per_view,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, NUM_FIELDS, k), lambda i, c: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, npix, 8), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, k), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, k // CHUNK, npix), lambda i, c: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((npix, 8), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out, nt, bounds = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, npix, 8), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 1, k), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, k // CHUNK, npix), jnp.float32),
        ],
        interpret=_interpret(),
    )(tile_count, pairs)
    color = out[:, :, 0:NCH]
    depth = out[:, :, NCH]
    t_final = out[:, :, NCH + 1]
    return color, depth, t_final, nt[:, 0, :], bounds


def _pairs_from_fields(fields_geo, fields_app, pair_gid, tile_start, tile_count, k):
    """Two-hop gather tuned for TPU gather throughput:
      1. fields (N+1, F) rows -> sorted-pair order (P, F): one row gather
         from a small (VMEM-resident) source,
      2. dense (num_tiles, K, F) blocks via vmapped dynamic_slice over the
         contiguous per-tile ranges — 1200 block copies at bandwidth
         speed instead of a 1.2M-element gather."""
    num_tiles = tile_start.shape[0]
    fields_rows = jnp.concatenate([fields_geo, fields_app], axis=1)
    fields_sorted = fields_rows[pair_gid]                    # (P, F)
    fields_sorted = jnp.pad(fields_sorted, ((0, k), (0, 0)))  # slice overrun pad

    def per_tile(start):
        return jax.lax.dynamic_slice(
            fields_sorted, (start, 0), (k, NUM_FIELDS)
        )

    dense = jax.vmap(per_tile)(tile_start)                   # (T, K, F)
    kr = jnp.arange(k, dtype=jnp.int32)
    mask = (kr[None, :] < tile_count[:, None]).astype(dense.dtype)
    dense = dense * mask[:, :, None]
    return dense.transpose(0, 2, 1)                          # (T, F, K)


def reduce_pairs_by_gaussian(
    values_rows: jax.Array,   # (num_tiles * K, F) dense per-pair values (rows)
    pair_tile: jax.Array,     # (P,) tile id per sorted pair
    tile_start: jax.Array,    # (num_tiles,)
    bygid_perm: jax.Array,    # (P,) sorted-pair positions grouped by gid
    gid_start: jax.Array,     # (N+1,) first by-gid position per gaussian
    gid_count: jax.Array,     # (N+1,) pairs per gaussian
    num_tiles: int,
    k: int,
) -> jax.Array:
    """Sum dense per-pair values per gaussian with gathers + a segmented
    cumsum (no scatter). Returns (N+1, F)."""
    max_pairs = pair_tile.shape[0]
    sp = jnp.arange(max_pairs, dtype=jnp.int32)
    t_sp = pair_tile
    k_sp = sp - tile_start[jnp.minimum(t_sp, num_tiles - 1)]
    valid_sp = (t_sp < num_tiles) & (k_sp >= 0) & (k_sp < k)
    flat = jnp.where(valid_sp, t_sp * k + k_sp, 0)
    combined = jnp.where(valid_sp, flat, -1)[bygid_perm]  # by-gid order
    safe = jnp.maximum(combined, 0)
    vals = values_rows[safe] * (combined >= 0).astype(values_rows.dtype)[:, None]
    csum = jnp.cumsum(vals, axis=0)
    z = jnp.concatenate(
        [jnp.zeros((1, values_rows.shape[1]), values_rows.dtype), csum], axis=0
    )
    starts = jnp.minimum(gid_start, max_pairs)
    ends = jnp.minimum(gid_start + gid_count, max_pairs)
    return z[ends] - z[starts]


def _cff_impl(fields_geo, fields_app, pair_gid, tile_count, pair_tile, tile_start,
              bygid_perm, gid_start, gid_count,
              tx_n, ty_n, tile, img_w, img_h, k):
    pairs = _pairs_from_fields(fields_geo, fields_app, pair_gid, tile_start, tile_count, k)
    return _composite_fwd_impl(
        pairs, tile_count, tx_n=tx_n, ty_n=ty_n, tile=tile, img_w=img_w, img_h=img_h
    )[:4]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def composite_from_fields(
    fields_geo, fields_app, pair_gid, tile_count, pair_tile, tile_start,
    bygid_perm, gid_start, gid_count,
    tx_n, ty_n, tile, img_w, img_h, k,
):
    """fields_geo (N+1, 6) [mx,my,ca,cb,cc,depth] + fields_app (N+1, 4)
    [op,r,g,b] + binning index arrays ->
    (color (T,npix,3), depth (T,npix), T_final (T,npix), n_touched (T,K))."""
    return _cff_impl(
        fields_geo, fields_app, pair_gid, tile_count, pair_tile, tile_start,
        bygid_perm, gid_start, gid_count,
        tx_n, ty_n, tile, img_w, img_h, k,
    )


def _cff_fwd(fields_geo, fields_app, pair_gid, tile_count, pair_tile, tile_start,
             bygid_perm, gid_start, gid_count,
             tx_n, ty_n, tile, img_w, img_h, k):
    # save the dense pair blocks as the residual (T*K*10 f32, ~25 MB at
    # production shapes) so the backward pass skips rebuilding them; the
    # chunk-entry transmittance boundaries + t_final let the backward run
    # a SINGLE reverse pass (no totals pre-pass)
    pairs = _pairs_from_fields(fields_geo, fields_app, pair_gid, tile_start,
                               tile_count, k)
    color, depth, t_final, nt, bounds = _composite_fwd_impl(
        pairs, tile_count, tx_n=tx_n, ty_n=ty_n, tile=tile, img_w=img_w,
        img_h=img_h,
    )
    res = (pairs, bounds, t_final, tile_count, pair_tile, tile_start,
           bygid_perm, gid_start, gid_count)
    return (color, depth, t_final, nt), res


def _cff_bwd(tx_n, ty_n, tile, img_w, img_h, k, res, g):
    (pairs, bounds, t_final, tile_count, pair_tile, tile_start,
     bygid_perm, gid_start, gid_count) = res
    g_color, g_depth, g_tf, _g_nt = g
    num_tiles = tile_start.shape[0]
    npix = tile * tile
    gbuf = jnp.concatenate(
        [
            g_color,
            g_depth[:, :, None],
            g_tf[:, :, None],
            t_final[:, :, None],
            jnp.zeros((num_tiles, npix, 2), jnp.float32),
        ],
        axis=2,
    )
    kern = functools.partial(
        _bwd_kernel, k=k, tx_n=tx_n, tile=tile, img_w=img_w, img_h=img_h
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, NUM_FIELDS, k), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, npix, 8), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, k // CHUNK, npix), lambda i, c: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NUM_FIELDS, k), lambda i, c: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((npix, 8), jnp.float32),
        ],
    )
    dpairs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, NUM_FIELDS, k), jnp.float32),
        interpret=_interpret(),
    )(tile_count, pairs, gbuf, bounds)

    drows = dpairs.transpose(0, 2, 1).reshape(num_tiles * k, NUM_FIELDS)
    # independent reductions per field group: pose-only consumers
    # (tracking) never read g_app, so XLA DCEs its gather — ~40% of the
    # backward reduction traffic
    g_geo = reduce_pairs_by_gaussian(
        drows[:, :NUM_GEO], pair_tile, tile_start, bygid_perm,
        gid_start, gid_count, num_tiles, k,
    )
    g_app = reduce_pairs_by_gaussian(
        drows[:, NUM_GEO:], pair_tile, tile_start, bygid_perm,
        gid_start, gid_count, num_tiles, k,
    )
    return (g_geo, g_app, None, None, None, None, None, None, None)


composite_from_fields.defvjp(_cff_fwd, _cff_bwd)


# ---------------------------------------------------------------------------
# Multi-view batched compositor: V views stacked into one kernel grid
# ---------------------------------------------------------------------------


def _multi_bwd_impl(pairs, bounds, t_final, tile_count, pair_tile, tile_start,
                    bygid_perm, gid_start, gid_count, g_color, g_depth, g_tf,
                    tx_n, ty_n, tile, img_w, img_h, k):
    """Shared backward body for the batched compositor. Leading dims:
    pairs (VT, F, K); per-view index arrays (V, ...)."""
    vt = pairs.shape[0]
    v = tile_start.shape[0]
    tiles_per_view = vt // v
    npix = tile * tile
    gbuf = jnp.concatenate(
        [
            g_color,
            g_depth[:, :, None],
            g_tf[:, :, None],
            t_final[:, :, None],
            jnp.zeros((vt, npix, 2), jnp.float32),
        ],
        axis=2,
    )
    kern = functools.partial(
        _bwd_kernel, k=k, tx_n=tx_n, tile=tile, img_w=img_w, img_h=img_h,
        tiles_per_view=tiles_per_view,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(vt,),
        in_specs=[
            pl.BlockSpec((1, NUM_FIELDS, k), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, npix, 8), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, k // CHUNK, npix), lambda i, c: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NUM_FIELDS, k), lambda i, c: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((npix, 8), jnp.float32),
        ],
    )
    dpairs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((vt, NUM_FIELDS, k), jnp.float32),
        interpret=_interpret(),
    )(tile_count.reshape(-1), pairs, gbuf, bounds)

    drows = dpairs.transpose(0, 2, 1).reshape(v, tiles_per_view * k, NUM_FIELDS)

    def reduce_view(rows, p_tile, t_start, perm, g_start, g_count):
        g_geo = reduce_pairs_by_gaussian(
            rows[:, :NUM_GEO], p_tile, t_start, perm, g_start, g_count,
            tiles_per_view, k,
        )
        g_app = reduce_pairs_by_gaussian(
            rows[:, NUM_GEO:], p_tile, t_start, perm, g_start, g_count,
            tiles_per_view, k,
        )
        return g_geo, g_app

    g_geo, g_app = jax.vmap(reduce_view)(
        drows, pair_tile, tile_start, bygid_perm, gid_start, gid_count
    )
    return g_geo, g_app


def _cffm_impl(fields_geo, fields_app, pair_gid, tile_count, pair_tile,
               tile_start, bygid_perm, gid_start, gid_count,
               tx_n, ty_n, tile, img_w, img_h, k):
    tiles_per_view = tx_n * ty_n
    dense = jax.vmap(
        lambda fg, fa, pg, ts, tc: _pairs_from_fields(fg, fa, pg, ts, tc, k)
    )(fields_geo, fields_app, pair_gid, tile_start, tile_count)  # (V, T, F, K)
    v = dense.shape[0]
    pairs = dense.reshape(v * tiles_per_view, NUM_FIELDS, k)
    color, depth, t_final, nt, bounds = _composite_fwd_impl(
        pairs, tile_count.reshape(-1), tx_n=tx_n, ty_n=ty_n, tile=tile,
        img_w=img_w, img_h=img_h, tiles_per_view=tiles_per_view,
    )
    npix = tile * tile
    shape_v = lambda a: a.reshape((v, tiles_per_view) + a.shape[1:])
    return (shape_v(color), shape_v(depth), shape_v(t_final), shape_v(nt)), (
        pairs, bounds, t_final,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def composite_from_fields_multi(
    fields_geo, fields_app, pair_gid, tile_count, pair_tile, tile_start,
    bygid_perm, gid_start, gid_count,
    tx_n, ty_n, tile, img_w, img_h, k,
):
    """Batched compositor: V views in ONE kernel launch (grid = V * tiles).
    fields_geo (V, N+1, 6), fields_app (V, N+1, 4), index arrays (V, ...)
    -> per-view (V, T, npix[, C]) outputs. Used by the mapping backend to
    render the whole keyframe window per iteration without per-view
    dispatch."""
    return _cffm_impl(
        fields_geo, fields_app, pair_gid, tile_count, pair_tile, tile_start,
        bygid_perm, gid_start, gid_count,
        tx_n, ty_n, tile, img_w, img_h, k,
    )[0]


def _cffm_fwd(fields_geo, fields_app, pair_gid, tile_count, pair_tile,
              tile_start, bygid_perm, gid_start, gid_count,
              tx_n, ty_n, tile, img_w, img_h, k):
    outs, (pairs, bounds, t_final_flat) = _cffm_impl(
        fields_geo, fields_app, pair_gid, tile_count, pair_tile, tile_start,
        bygid_perm, gid_start, gid_count,
        tx_n, ty_n, tile, img_w, img_h, k,
    )
    res = (pairs, bounds, t_final_flat, tile_count, pair_tile, tile_start,
           bygid_perm, gid_start, gid_count)
    return outs, res


def _cffm_bwd(tx_n, ty_n, tile, img_w, img_h, k, res, g):
    (pairs, bounds, t_final_flat, tile_count, pair_tile, tile_start,
     bygid_perm, gid_start, gid_count) = res
    g_color, g_depth, g_tf, _g_nt = g
    vt = pairs.shape[0]
    flat = lambda a: a.reshape((vt,) + a.shape[2:])
    g_geo, g_app = _multi_bwd_impl(
        pairs, bounds, t_final_flat, tile_count, pair_tile, tile_start,
        bygid_perm, gid_start, gid_count,
        flat(g_color), flat(g_depth), flat(g_tf),
        tx_n, ty_n, tile, img_w, img_h, k,
    )
    return (g_geo, g_app, None, None, None, None, None, None, None)


composite_from_fields_multi.defvjp(_cffm_fwd, _cffm_bwd)
