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
  * the backward pass needs no atomics: each sorted (tile, Gaussian) pair
    is owned by exactly one tile program, so per-pair gradients are
    written disjointly and reduced to per-Gaussian gradients outside the
    kernel by the autodiff transpose of the binning gather (a segment
    sum) — replacing the CUDA block-reduce + atomicAdd pattern
    (backward.cu:759-784).

The public entry `tile_composite(pairs)` is a `jax.custom_vjp`; everything
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

# pair-field row indices in the dense (FIELDS, K) block
F_MX, F_MY, F_CA, F_CB, F_CC, F_OP, F_R, F_G, F_B, F_DEPTH = range(10)
NUM_FIELDS = 10
NCH = 3
CHUNK = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pixel_coords(tile_idx, tx_n: int, tile: int):
    """(256, 1) f32 pixel x/y coordinates for this tile program."""
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

    Returns per-(pixel, pair) alpha/validity and the log(1-alpha) rows.
    All arrays are (256, CHUNK)."""
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


def _fwd_kernel(pairs_ref, out_ref, nt_ref, *, k: int, tx_n: int, tile: int, img_w: int, img_h: int):
    t = pl.program_id(0)
    px, py = _pixel_coords(t, tx_n, tile)
    inside = (px < img_w) & (py < img_h)
    tri = _tri_incl()

    npix = tile * tile
    cum_carry = jnp.zeros((npix, 1), jnp.float32)
    la_applied = jnp.zeros((npix, 1), jnp.float32)
    c_acc = [jnp.zeros((npix, 1), jnp.float32) for _ in range(NCH)]
    d_acc = jnp.zeros((npix, 1), jnp.float32)

    for c in range(k // CHUNK):
        q = _chunk_quantities(pairs_ref, c * CHUNK, px, py)
        cum = cum_carry + jnp.dot(q["la"], tri, preferred_element_type=jnp.float32)
        t_incl = jnp.exp(cum)
        applied = q["valid"] & (t_incl >= T_EPS)
        t_before = jnp.exp(cum - q["la"])
        w = jnp.where(applied, q["alpha"] * t_before, 0.0)

        for ch, f in enumerate((F_R, F_G, F_B)):
            cch = pairs_ref[0, f, q["sl"]][None, :]
            c_acc[ch] = c_acc[ch] + jnp.sum(w * cch, axis=1, keepdims=True)
        dep = pairs_ref[0, F_DEPTH, q["sl"]][None, :]
        d_acc = d_acc + jnp.sum(w * dep, axis=1, keepdims=True)

        nt = jnp.sum(
            (applied & (t_incl > 0.5) & inside).astype(jnp.float32),
            axis=0,
            keepdims=True,
        )
        nt_ref[0, 0, pl.ds(c * CHUNK, CHUNK)] = nt[0, :]

        la_applied = la_applied + jnp.sum(
            jnp.where(applied, q["la"], 0.0), axis=1, keepdims=True
        )
        cum_carry = cum[:, CHUNK - 1 : CHUNK]

    t_final = jnp.exp(la_applied)
    out = jnp.concatenate(
        c_acc + [d_acc, t_final, jnp.zeros((npix, 3), jnp.float32)], axis=1
    )
    out_ref[0, :, :] = out


def _bwd_kernel(pairs_ref, g_ref, dpairs_ref, *, k: int, tx_n: int, tile: int, img_w: int, img_h: int):
    t = pl.program_id(0)
    px, py = _pixel_coords(t, tx_n, tile)
    tri = _tri_incl()
    npix = tile * tile

    g_c = g_ref[0, :, 0:NCH]            # (256, 3)
    g_d = g_ref[0, :, NCH : NCH + 1]    # (256, 1)
    g_tf = g_ref[0, :, NCH + 1 : NCH + 2]

    # ---- pass 1: totals (weighted color/depth sums and final T) ----
    cum_carry = jnp.zeros((npix, 1), jnp.float32)
    la_applied = jnp.zeros((npix, 1), jnp.float32)
    c_tot = [jnp.zeros((npix, 1), jnp.float32) for _ in range(NCH)]
    d_tot = jnp.zeros((npix, 1), jnp.float32)
    for c in range(k // CHUNK):
        q = _chunk_quantities(pairs_ref, c * CHUNK, px, py)
        cum = cum_carry + jnp.dot(q["la"], tri, preferred_element_type=jnp.float32)
        t_incl = jnp.exp(cum)
        applied = q["valid"] & (t_incl >= T_EPS)
        w = jnp.where(applied, q["alpha"] * jnp.exp(cum - q["la"]), 0.0)
        for ch, f in enumerate((F_R, F_G, F_B)):
            cch = pairs_ref[0, f, q["sl"]][None, :]
            c_tot[ch] = c_tot[ch] + jnp.sum(w * cch, axis=1, keepdims=True)
        dep = pairs_ref[0, F_DEPTH, q["sl"]][None, :]
        d_tot = d_tot + jnp.sum(w * dep, axis=1, keepdims=True)
        la_applied = la_applied + jnp.sum(jnp.where(applied, q["la"], 0.0), axis=1, keepdims=True)
        cum_carry = cum[:, CHUNK - 1 : CHUNK]
    t_final = jnp.exp(la_applied)

    # ---- pass 2: per-pair gradients ----
    cum_carry = jnp.zeros((npix, 1), jnp.float32)
    pref_wc = [jnp.zeros((npix, 1), jnp.float32) for _ in range(NCH)]
    pref_wd = jnp.zeros((npix, 1), jnp.float32)
    for c in range(k // CHUNK):
        q = _chunk_quantities(pairs_ref, c * CHUNK, px, py)
        la = q["la"]
        cum = cum_carry + jnp.dot(la, tri, preferred_element_type=jnp.float32)
        t_incl = jnp.exp(cum)
        applied = q["valid"] & (t_incl >= T_EPS)
        t_before = jnp.exp(cum - la)
        w = jnp.where(applied, q["alpha"] * t_before, 0.0)

        one_m_a = 1.0 - q["alpha"]
        inv_1ma = 1.0 / jnp.maximum(one_m_a, 1e-6)

        dep = pairs_ref[0, F_DEPTH, q["sl"]][None, :]
        wd = w * dep
        pref_wd_in = pref_wd + jnp.dot(wd, tri, preferred_element_type=jnp.float32)
        suffix_d = d_tot - pref_wd_in  # (256, CHUNK)

        dalpha = g_d * (dep * t_before - suffix_d * inv_1ma)
        dalpha = dalpha - g_tf * t_final * inv_1ma

        d_c_rows = []
        for ch, f in enumerate((F_R, F_G, F_B)):
            cch = pairs_ref[0, f, q["sl"]][None, :]
            wc = w * cch
            pref_in = pref_wc[ch] + jnp.dot(
                wc, tri, preferred_element_type=jnp.float32
            )
            suffix_c = c_tot[ch] - pref_in
            g_ch = g_c[:, ch : ch + 1]
            dalpha = dalpha + g_ch * (cch * t_before - suffix_c * inv_1ma)
            d_c_rows.append(jnp.sum(g_ch * w, axis=0, keepdims=True))
            pref_wc[ch] = pref_in[:, CHUNK - 1 : CHUNK]
        pref_wd = pref_wd_in[:, CHUNK - 1 : CHUNK]

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
        dpairs_ref[0, F_R, sl] = d_c_rows[0][0, :]
        dpairs_ref[0, F_G, sl] = d_c_rows[1][0, :]
        dpairs_ref[0, F_B, sl] = d_c_rows[2][0, :]
        dpairs_ref[0, F_DEPTH, sl] = jnp.sum(g_d * w, axis=0, keepdims=True)[0, :]

        cum_carry = cum[:, CHUNK - 1 : CHUNK]


def _composite_fwd_impl(pairs: jax.Array, *, tx_n: int, ty_n: int, tile: int, img_w: int, img_h: int):
    num_tiles, _, k = pairs.shape
    npix = tile * tile
    kern = functools.partial(
        _fwd_kernel, k=k, tx_n=tx_n, tile=tile, img_w=img_w, img_h=img_h
    )
    out, nt = pl.pallas_call(
        kern,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, NUM_FIELDS, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((1, npix, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, npix, 8), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 1, k), jnp.float32),
        ],
        interpret=_interpret(),
    )(pairs)
    color = out[:, :, 0:NCH]
    depth = out[:, :, NCH]
    t_final = out[:, :, NCH + 1]
    return color, depth, t_final, nt[:, 0, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def tile_composite(pairs, tx_n, ty_n, tile, img_w, img_h):
    """pairs (num_tiles, NUM_FIELDS, K) -> (color (T,256,3), depth (T,256),
    T_final (T,256), n_touched (T,K) [zero-grad])."""
    return _composite_fwd_impl(
        pairs, tx_n=tx_n, ty_n=ty_n, tile=tile, img_w=img_w, img_h=img_h
    )


def _tc_fwd(pairs, tx_n, ty_n, tile, img_w, img_h):
    outs = _composite_fwd_impl(
        pairs, tx_n=tx_n, ty_n=ty_n, tile=tile, img_w=img_w, img_h=img_h
    )
    return outs, pairs


def _tc_bwd(tx_n, ty_n, tile, img_w, img_h, pairs, g):
    g_color, g_depth, g_tf, _g_nt = g
    num_tiles, _, k = pairs.shape
    npix = tile * tile
    gbuf = jnp.concatenate(
        [
            g_color,
            g_depth[:, :, None],
            g_tf[:, :, None],
            jnp.zeros((num_tiles, npix, 3), jnp.float32),
        ],
        axis=2,
    )
    kern = functools.partial(
        _bwd_kernel, k=k, tx_n=tx_n, tile=tile, img_w=img_w, img_h=img_h
    )
    dpairs = pl.pallas_call(
        kern,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, NUM_FIELDS, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npix, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, NUM_FIELDS, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, NUM_FIELDS, k), jnp.float32),
        interpret=_interpret(),
    )(pairs, gbuf)
    return (dpairs,)


tile_composite.defvjp(_tc_fwd, _tc_bwd)


# ---------------------------------------------------------------------------
# Fields-level entry point with a scatter-free backward.
#
# Differentiating the jnp gather fields -> dense pair blocks would make XLA
# emit a 12M-element scatter-add in the transpose (~40ms on v5e — the CUDA
# analogue is the atomicAdd storm the reference's backward.cu carefully
# block-reduces). Instead we define the custom VJP one level up: the
# backward maps dense per-pair gradients to the sorted pair order (gather),
# regroups them by gaussian id via a precomputed permutation (gather), and
# segment-reduces with a cumsum + boundary differences (gathers only).
# ---------------------------------------------------------------------------


def _pairs_from_fields(fields_pad, dense_gid, k):
    pairs = jnp.take(fields_pad, dense_gid.reshape(-1), axis=1)
    pairs = pairs.reshape(NUM_FIELDS, dense_gid.shape[0], k)
    return pairs.transpose(1, 0, 2)


def _cff_impl(fields_pad, dense_gid, pair_tile, tile_start, gid_bygid, bygid_perm,
              tx_n, ty_n, tile, img_w, img_h, k):
    pairs = _pairs_from_fields(fields_pad, dense_gid, k)
    return _composite_fwd_impl(
        pairs, tx_n=tx_n, ty_n=ty_n, tile=tile, img_w=img_w, img_h=img_h
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def composite_from_fields(
    fields_pad, dense_gid, pair_tile, tile_start, gid_bygid, bygid_perm,
    tx_n, ty_n, tile, img_w, img_h, k,
):
    """fields_pad (NUM_FIELDS, N+1) + binning index arrays ->
    (color (T,256,3), depth (T,256), T_final (T,256), n_touched (T,K))."""
    return _cff_impl(
        fields_pad, dense_gid, pair_tile, tile_start, gid_bygid, bygid_perm,
        tx_n, ty_n, tile, img_w, img_h, k,
    )


def _cff_fwd(fields_pad, dense_gid, pair_tile, tile_start, gid_bygid, bygid_perm,
             tx_n, ty_n, tile, img_w, img_h, k):
    outs = _cff_impl(
        fields_pad, dense_gid, pair_tile, tile_start, gid_bygid, bygid_perm,
        tx_n, ty_n, tile, img_w, img_h, k,
    )
    res = (fields_pad, dense_gid, pair_tile, tile_start, gid_bygid, bygid_perm)
    return outs, res


def _cff_bwd(tx_n, ty_n, tile, img_w, img_h, k, res, g):
    fields_pad, dense_gid, pair_tile, tile_start, gid_bygid, bygid_perm = res
    g_color, g_depth, g_tf, _g_nt = g
    num_tiles = dense_gid.shape[0]
    npix = tile * tile
    pairs = _pairs_from_fields(fields_pad, dense_gid, k)
    gbuf = jnp.concatenate(
        [
            g_color,
            g_depth[:, :, None],
            g_tf[:, :, None],
            jnp.zeros((num_tiles, npix, 3), jnp.float32),
        ],
        axis=2,
    )
    kern = functools.partial(
        _bwd_kernel, k=k, tx_n=tx_n, tile=tile, img_w=img_w, img_h=img_h
    )
    dpairs = pl.pallas_call(
        kern,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, NUM_FIELDS, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npix, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, NUM_FIELDS, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, NUM_FIELDS, k), jnp.float32),
        interpret=_interpret(),
    )(pairs, gbuf)

    # dense (tile, k) grads -> sorted-pair order (gathers only)
    max_pairs = pair_tile.shape[0]
    sp = jnp.arange(max_pairs, dtype=jnp.int32)
    t_sp = pair_tile
    k_sp = sp - tile_start[jnp.minimum(t_sp, num_tiles - 1)]
    valid_sp = (t_sp < num_tiles) & (k_sp >= 0) & (k_sp < k)
    flat = jnp.where(valid_sp, t_sp * k + k_sp, 0)
    dflat = dpairs.transpose(1, 0, 2).reshape(NUM_FIELDS, num_tiles * k)
    g_sorted = dflat[:, flat] * valid_sp[None].astype(jnp.float32)

    # regroup by gaussian id and segment-reduce with cumsum differences
    g_bygid = g_sorted[:, bygid_perm]
    csum = jnp.cumsum(g_bygid, axis=1)
    z = jnp.concatenate([jnp.zeros((NUM_FIELDS, 1), jnp.float32), csum], axis=1)
    n_pad = fields_pad.shape[1]
    ids = jnp.arange(n_pad, dtype=jnp.int32)
    starts = jnp.searchsorted(gid_bygid, ids, side="left")
    ends = jnp.searchsorted(gid_bygid, ids, side="right")
    g_fields = z[:, ends] - z[:, starts]
    return (g_fields, None, None, None, None, None)


composite_from_fields.defvjp(_cff_fwd, _cff_bwd)
