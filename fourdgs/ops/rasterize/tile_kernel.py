"""Pallas TPU tile compositor (forward + analytic backward).

Design (TPU-native replacement for cuda_rasterizer forward.cu renderCUDA /
backward.cu renderCUDA):

  * the binner emits a flat CHUNK-aligned CSR pair list (per-tile
    contiguous segments); the kernel grid walks it SUBS chunks per
    program — DMA streams exactly the real pairs (+ <CHUNK/tile
    alignment pad), never a dense per-tile capacity.
  * inside a program, pixels live in SUBLANES (256 = 16x16 flattened) and
    Gaussians in LANES (chunks of 128), so every op is a well-tiled
    (256, 128) VPU op; the per-pixel transmittance recurrence is made
    parallel with a closed form: cumulative sums of log(1-alpha) along the
    lane axis, computed as a matmul with a constant triangular matrix on
    the MXU.
  * termination (`T < 1e-4 -> done`) is exact without a sequential scan:
    T is monotone non-increasing over valid entries, so
    `applied = valid & (T_inclusive >= 1e-4)` reproduces the CUDA done
    flag (see oracle.py for the argument); a whole-tile early exit fires
    once every pixel saturates — the vectorized analogue of the CUDA
    block-vote `__syncthreads_count(done)` (forward.cu:318-321).
  * the backward pass needs no atomics and no totals pre-pass: the
    forward saves per-chunk entry log-transmittance (bounds), and the
    grid runs in reverse accumulating the cross-chunk suffix term —
    per-pair gradients are written disjointly and reduced to
    per-Gaussian gradients outside the kernel by one row gather + a
    segmented cumsum (XLA scatter-adds serialize on TPU; this path has
    none), replacing the CUDA block-reduce + atomicAdd pattern
    (backward.cu:759-784).

The public entries `composite_csr` / `composite_csr_multi` are
`jax.custom_vjp`s; everything upstream (EWA preprocess, SE(3) pose chain,
SH) and downstream (losses) is plain jnp and differentiates through them.
A one-chunk-per-program variant with scalar-prefetch-driven output block
indices was 3x slower end-to-end (per-step pipeline overhead on tiny
programs); keeping every BlockSpec index a static function of the
program id is what lets Mosaic double-buffer all streams.
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


# scratch accumulator columns: [r, g, b, depth, cum_log_T, la_applied, _, _]
A_R, A_G, A_B, A_D, A_CUM, A_LA = 0, 1, 2, 3, 4, 5


# ---------------------------------------------------------------------------
# CSR chunk-grid compositor
# ---------------------------------------------------------------------------
#
# A dense per-tile layout (one (FIELDS, K=tile_cap) block per tile) costs
# ~3.5x more DMA and compute than the real pair count at production
# shapes. Here the binner lays pairs out CHUNK-aligned per tile (TileBins
# aligned_*/chunk_*) and the kernel processes the flat chunk list, SUBS
# chunks per grid program:
#   * every block index is a static function of the program id — no
#     scalar-driven BlockSpec anywhere, so Mosaic double-buffers all
#     streams perfectly (a one-chunk-per-program variant with the output
#     image block chosen by a prefetched tile id ran 3x slower: per-step
#     pipeline overhead dominates tiny programs),
#   * programs write per-chunk PARTIAL sums (color/depth/applied-log-T);
#     per-tile images are segment sums over each tile's contiguous chunk
#     range (cumsum + two row gathers — no scatter). Only the
#     transmittance state (cum log-T, done flag) crosses program
#     boundaries, in VMEM scratch; chunk_first resets it per tile,
#   * the backward pass runs the grid in reverse (static index G-1-j),
#     accumulating the cross-chunk suffix term back-to-front in scratch;
#     per-chunk output gradients arrive pre-gathered by chunk tile id so
#     the kernel streams them like any other input.
# The CUDA reference's per-tile ranges are the same CSR idea
# (rasterizer_impl.cu identifyTileRanges), but its workload is
# thread-per-pixel with atomics; here it is chunk-per-program with the
# transmittance recurrence closed into triangular matmuls on the MXU.

SUBS = 4  # chunks per grid program (amortizes per-step pipeline cost)


def _csr_quantities(pairs_ref, s, px, py):
    """Forward quantities for sub-chunk `s` of a (FIELDS, SUBS*CHUNK)
    block. All arrays are (npix, CHUNK)."""
    sl = pl.ds(s * CHUNK, CHUNK)
    mx = pairs_ref[F_MX, sl][None, :]
    my = pairs_ref[F_MY, sl][None, :]
    ca = pairs_ref[F_CA, sl][None, :]
    cb = pairs_ref[F_CB, sl][None, :]
    cc = pairs_ref[F_CC, sl][None, :]
    op = pairs_ref[F_OP, sl][None, :]
    dx = mx - px
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g = jnp.exp(power)
    raw = op * g
    alpha = jnp.minimum(ALPHA_MAX, raw)
    valid = (power <= 0.0) & (alpha >= ALPHA_MIN)
    la = jnp.where(valid, jnp.log1p(-alpha), 0.0)
    # exp(-la) = 1/(1-alpha) where valid (1 where invalid, but every use
    # is masked by applied <= valid): one VPU reciprocal replaces the
    # second transcendental exp(cum - la) both kernels used to pay
    inv_1ma = 1.0 / jnp.maximum(1.0 - alpha, 1e-6)
    return dict(
        dx=dx, dy=dy, ca=ca, cb=cb, cc=cc, op=op, g=g, raw=raw,
        alpha=alpha, valid=valid, la=la, inv_1ma=inv_1ma, sl=sl,
    )


def _fwd_kernel_csr(ct_ref, cf_ref, pairs_ref, part_ref, nt_ref, bounds_ref,
                    acc_ref, done_ref,
                    *, tx_n: int, tile: int, img_w: int, img_h: int,
                    tiles_per_view: int, n_tiles_total: int):
    j = pl.program_id(0)
    npix = tile * tile
    tri = _tri_incl()

    for s in range(SUBS):
        cid = j * SUBS + s
        t = ct_ref[cid] % tiles_per_view
        px, py = _pixel_coords(t, tx_n, tile)
        inside = (px < img_w) & (py < img_h)

        @pl.when(cf_ref[cid] == 1)
        def _init():
            acc_ref[:, :] = jnp.zeros((npix, 8), jnp.float32)
            done_ref[0] = 0

        # pad chunks (binner sentinel tile id >= total tile count — only
        # ~60% of max_pairs chunks are real at production occupancy) take
        # the same cheap branch as saturated tiles instead of streaming
        # dummy pairs through the full alpha/transmittance chain
        was_done = (done_ref[0] == 1) | (ct_ref[cid] >= n_tiles_total)

        @pl.when(~was_done)
        def _compute():
            bounds_ref[s, 0, :] = acc_ref[:, A_CUM]
            q = _csr_quantities(pairs_ref, s, px, py)
            cum = acc_ref[:, A_CUM:A_CUM + 1] + jnp.dot(
                q["la"], tri, preferred_element_type=jnp.float32
            )
            t_incl = jnp.exp(cum)
            applied = q["valid"] & (t_incl >= T_EPS)
            t_before = t_incl * q["inv_1ma"]
            w = jnp.where(applied, q["alpha"] * t_before, 0.0)

            # weighted color/depth accumulation as ONE MXU matmul
            # (npix, CHUNK) @ (CHUNK, 4) instead of 4 VPU multiply+reduce
            c4 = jnp.stack(
                [pairs_ref[f, q["sl"]] for f in (F_R, F_G, F_B, F_DEPTH)],
                axis=1,
            )  # (CHUNK, 4)
            acc_ref[:, 0:4] += jnp.dot(
                w, c4, preferred_element_type=jnp.float32
            )

            nt = jnp.sum(
                (applied & (t_incl > 0.5) & inside).astype(jnp.float32),
                axis=0, keepdims=True,
            )
            nt_ref[0, q["sl"]] = nt[0, :]

            acc_ref[:, A_LA:A_LA + 1] += jnp.sum(
                jnp.where(applied, q["la"], 0.0), axis=1, keepdims=True
            )
            acc_ref[:, A_CUM:A_CUM + 1] = cum[:, CHUNK - 1:CHUNK]
            done_ref[0] = jnp.where(
                jnp.all(t_incl[:, CHUNK - 1] < T_EPS), 1, 0
            ).astype(jnp.int32)

        @pl.when(was_done)
        def _skip():
            # saturated tile: later chunks contribute nothing; mark their
            # bounds never-executed so the backward zeroes them
            bounds_ref[s, 0, :] = jnp.full((npix,), -1e30, jnp.float32)
            nt_ref[0, pl.ds(s * CHUNK, CHUNK)] = jnp.zeros((CHUNK,), jnp.float32)

        # RUNNING per-tile totals: the per-tile image is the row at the
        # tile's last chunk (boundary gather outside) — no chunk-axis
        # cumsum needed downstream. Stored CHANNEL-FIRST (8, npix): with
        # the channel axis minor, the (c_max, npix, 8) layout pads the
        # 128-lane dim 16x and the finalize/slice chain moved ~1.5 GB per
        # 10-view render (chip-profiled ~22 ms of a 59 ms fwd+bwd);
        # npix = tile^2 = 256 minor tiles exactly, and the in-kernel
        # (npix, 8) -> (8, npix) transpose rides the VPU transpose unit
        part_ref[s, :, :] = acc_ref[:, :].T


def _bwd_kernel_csr(ct_ref, cl_ref, pairs_ref, gchunk_ref, bounds_ref,
                    dpairs_ref, acc_ref,
                    *, tx_n: int, tile: int, img_w: int, img_h: int,
                    tiles_per_view: int, n_tiles_total: int):
    j = pl.program_id(0)   # block (G-1-j) via the static index maps
    g = pl.num_programs(0)
    npix = tile * tile
    tri = _tri_incl()

    for s in reversed(range(SUBS)):
        cid = (g - 1 - j) * SUBS + s
        t = ct_ref[cid] % tiles_per_view
        px, py = _pixel_coords(t, tx_n, tile)

        @pl.when(cl_ref[cid] == 1)   # last chunk of its tile = first visited
        def _init():
            # seed the suffix accumulator with the per-tile g_tf*T_final
            # term (gchunk row 4): dalpha subtracts suffix*inv_1ma, and
            # the gtt term rides the suffix through every chunk of the
            # tile — mathematically identical to the old explicit
            # `- g_tf * t_final * inv_1ma`, but it needs gtt as a column
            # only ONCE per tile (one (1, npix) -> (npix, 1) transpose)
            # instead of a per-chunk C-minor gchunk row read
            acc_ref[:, :] = jnp.zeros((npix, 8), jnp.float32)
            acc_ref[:, 0:1] = gchunk_ref[s, 4:5, :].T

        # pad chunks: skip the whole gradient chain, but the output block
        # MUST be zeroed — downstream the reduction's conflict-spread
        # dummy rows gather arbitrary dpairs rows (masked to zero, but
        # 0 * garbage-NaN from uninitialized VMEM would poison the sum)
        pad = ct_ref[cid] >= n_tiles_total

        @pl.when(pad)
        def _zero_pad():
            dpairs_ref[:, pl.ds(s * CHUNK, CHUNK)] = jnp.zeros(
                (NUM_FIELDS, CHUNK), jnp.float32
            )

        @pl.when(~pad)
        def _compute_bwd():
            _bwd_chunk(
                ct_ref, pairs_ref, gchunk_ref, bounds_ref, dpairs_ref,
                acc_ref, s, t, px, py, tri, npix, tx_n, tile,
            )


def _bwd_chunk(ct_ref, pairs_ref, gchunk_ref, bounds_ref, dpairs_ref,
               acc_ref, s, t, px, py, tri, npix, tx_n, tile):
        g4 = gchunk_ref[s, 0:4, :]          # (4, npix): [gr, gg, gb, gd]

        q = _csr_quantities(pairs_ref, s, px, py)
        la = q["la"]
        sl = q["sl"]
        cum = bounds_ref[s, 0, :][:, None] + jnp.dot(
            la, tri, preferred_element_type=jnp.float32
        )
        t_incl = jnp.exp(cum)
        applied = q["valid"] & (t_incl >= T_EPS)
        inv_1ma = q["inv_1ma"]
        t_before = t_incl * inv_1ma
        w = jnp.where(applied, q["alpha"] * t_before, 0.0)

        # u_i = sum_ch g_ch c_ch,i + g_d depth_i as ONE MXU matmul,
        # contracting the leading (channel) dims of (4, npix) x (4, CHUNK)
        c4 = jnp.stack(
            [pairs_ref[f, sl] for f in (F_R, F_G, F_B, F_DEPTH)], axis=0
        )  # (4, CHUNK)
        u = jax.lax.dot_general(
            g4, c4, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (npix, CHUNK)

        wu = w * u
        incl = jnp.dot(wu, tri, preferred_element_type=jnp.float32)
        chunk_tot = incl[:, CHUNK - 1:CHUNK]
        # acc was seeded with the g_tf*T_final term at the tile's last
        # chunk (_init above), so suffix_u carries it for every chunk
        suffix_u = (chunk_tot - incl) + acc_ref[:, 0:1]
        dalpha = u * t_before - suffix_u * inv_1ma
        acc_ref[:, 0:1] += chunk_tot

        unclamped = (q["raw"] < ALPHA_MAX).astype(jnp.float32)
        dalpha = jnp.where(applied, dalpha, 0.0) * unclamped
        dpower = q["raw"] * dalpha

        # All six geometry gradients are pixel contractions of
        # dpower against polynomials in (px, py): dx = mx - px is
        # separable, so Sum_p poly(dx,dy) dpower collapses to the pixel
        # MOMENTS [1, px, py, px^2, px*py, py^2] @ dpower — one
        # (6, npix)@(npix, CHUNK) MXU matmul replacing ~18 VPU
        # multiply+reduce passes (backward.cu:698-758 computes the same
        # chain per thread). TILE-LOCAL coordinates (both pixels and
        # means shifted by the tile origin — dx is shift-invariant, so
        # this is mathematically identical) keep the contracted term
        # magnitudes ~40x smaller than absolute image coordinates,
        # avoiding fp32 cancellation between ~4e5-scale moments and the
        # ~1e2-scale result at 640+ px widths.
        lin2 = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
        ty = t // tx_n
        tx = t - ty * tx_n
        ox = (tx * tile).astype(jnp.float32)
        oy = (ty * tile).astype(jnp.float32)
        pxr = (lin2 % tile).astype(jnp.float32)
        pyr = (lin2 // tile).astype(jnp.float32)
        m6 = jnp.concatenate(
            [jnp.ones((1, npix), jnp.float32), pxr, pyr,
             pxr * pxr, pxr * pyr, pyr * pyr], axis=0
        )  # (6, npix)
        sm = jnp.dot(m6, dpower, preferred_element_type=jnp.float32)
        s0, s1x, s1y = sm[0:1, :], sm[1:2, :], sm[2:3, :]
        s2xx, s2xy, s2yy = sm[3:4, :], sm[4:5, :], sm[5:6, :]
        mx = pairs_ref[F_MX, sl][None, :] - ox
        my = pairs_ref[F_MY, sl][None, :] - oy
        ca = pairs_ref[F_CA, sl][None, :]
        cb = pairs_ref[F_CB, sl][None, :]
        cc = pairs_ref[F_CC, sl][None, :]
        op = pairs_ref[F_OP, sl][None, :]
        sum_dx = mx * s0 - s1x
        sum_dy = my * s0 - s1y
        sum_dx2 = mx * mx * s0 - 2.0 * mx * s1x + s2xx
        sum_dxy = mx * my * s0 - mx * s1y - my * s1x + s2xy
        sum_dy2 = my * my * s0 - 2.0 * my * s1y + s2yy

        # d_op = Sum g*dalpha = Sum dpower / op (op constant per pair)
        dop = jnp.where(op > 1e-12, s0 / op, 0.0)

        # color/depth gradients: (4, npix)@(npix, CHUNK) MXU matmul
        gw = jnp.dot(g4, w, preferred_element_type=jnp.float32)

        dpairs_ref[F_OP, sl] = dop[0, :]
        dpairs_ref[F_CA, sl] = (-0.5 * sum_dx2)[0, :]
        dpairs_ref[F_CB, sl] = (-sum_dxy)[0, :]
        dpairs_ref[F_CC, sl] = (-0.5 * sum_dy2)[0, :]
        dpairs_ref[F_MX, sl] = (-(ca * sum_dx + cb * sum_dy))[0, :]
        dpairs_ref[F_MY, sl] = (-(cc * sum_dy + cb * sum_dx))[0, :]
        dpairs_ref[F_R, sl] = gw[0, :]
        dpairs_ref[F_G, sl] = gw[1, :]
        dpairs_ref[F_B, sl] = gw[2, :]
        dpairs_ref[F_DEPTH, sl] = gw[3, :]


def _csr_fwd_impl(pairs, chunk_tile, chunk_first,
                  *, tx_n, ty_n, tile, img_w, img_h, tiles_per_view,
                  n_tiles_total):
    """pairs (FIELDS, P) CHUNK-aligned -> per-chunk partials (c_max, npix,
    8), per-slot nt (P,), per-chunk entry bounds (c_max, npix)."""
    p = pairs.shape[1]
    if p % (CHUNK * SUBS):
        raise ValueError(
            f"pair buffer length {p} must be a multiple of CHUNK*SUBS "
            f"({CHUNK * SUBS}); the grid would floor-drop tail chunks"
        )
    c_max = p // CHUNK
    npix = tile * tile
    kern = functools.partial(
        _fwd_kernel_csr, tx_n=tx_n, tile=tile, img_w=img_w, img_h=img_h,
        tiles_per_view=tiles_per_view, n_tiles_total=n_tiles_total,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(c_max // SUBS,),
        in_specs=[
            pl.BlockSpec((NUM_FIELDS, SUBS * CHUNK), lambda j, ct, cf: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((SUBS, 8, npix), lambda j, ct, cf: (j, 0, 0)),
            pl.BlockSpec((1, SUBS * CHUNK), lambda j, ct, cf: (0, j)),
            pl.BlockSpec((SUBS, 1, npix), lambda j, ct, cf: (j, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((npix, 8), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    part, nt, bounds = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((c_max, 8, npix), jnp.float32),
            jax.ShapeDtypeStruct((1, p), jnp.float32),
            jax.ShapeDtypeStruct((c_max, 1, npix), jnp.float32),
        ],
        interpret=_interpret(),
    )(chunk_tile, chunk_first, pairs)
    return part, nt.reshape(-1), bounds


def _csr_finalize(part, chunk_start, n_chunks, npix):
    """Per-tile totals from the kernel's RUNNING sums: the tile's values
    are the row at its last chunk (one boundary row gather, no chunk-axis
    cumsum). Returns CHANNEL-FIRST (VT, 6, npix) [r, g, b, depth, cum,
    la] with empty tiles zeroed — la = 0 makes T_final = exp(la) = 1 for
    them, so the caller needs NO per-channel select (the old where-chain
    cost ~2 ms of (VT, npix, 1) layout copies per render)."""
    c_max = part.shape[0]
    last = jnp.clip(chunk_start + n_chunks - 1, 0, c_max - 1)
    tot = part[last]                                # (VT, 8, npix)
    hasf = (n_chunks > 0).astype(part.dtype)[:, None, None]
    return tot[:, :6, :] * hasf


def _csr_bwd_impl(pairs, bounds, t_final_rows, chunk_tile, chunk_last,
                  g_color, g_depth, g_tf,
                  *, tx_n, ty_n, tile, img_w, img_h, tiles_per_view,
                  n_tiles_total):
    """dpairs (FIELDS, P) from CHANNEL-FIRST per-tile output gradients
    (VT, C, npix) / (VT, npix)."""
    p = pairs.shape[1]
    c_max = p // CHUNK
    npix = tile * tile
    vt = g_color.shape[0]
    # rows [gr, gg, gb, gd, g_tf*T_final, 0, 0, 0]: the gtt product is
    # per-tile constant, folded here (npix-minor elementwise) so the
    # kernel seeds its suffix accumulator with ONE row instead of
    # reading two per-chunk columns from a C-minor block
    gtt = g_tf * t_final_rows                          # (VT, npix)
    grows = jnp.concatenate(
        [
            g_color,
            g_depth[:, None, :],
            gtt[:, None, :],
            jnp.zeros((vt, 3, npix), jnp.float32),
        ],
        axis=1,
    )
    grows = jnp.pad(grows, ((0, 1), (0, 0), (0, 0)))  # dummy row: sentinels
    # per-chunk gradient rows (row gather; lets the kernel stream them
    # through a statically-indexed BlockSpec instead of a scalar-driven
    # per-tile block)
    gchunk = grows[jnp.minimum(chunk_tile, vt)]       # (c_max, 8, npix)
    kern = functools.partial(
        _bwd_kernel_csr, tx_n=tx_n, tile=tile, img_w=img_w, img_h=img_h,
        tiles_per_view=tiles_per_view, n_tiles_total=n_tiles_total,
    )
    g = c_max // SUBS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (NUM_FIELDS, SUBS * CHUNK), lambda j, ct, cl: (0, g - 1 - j)
            ),
            pl.BlockSpec((SUBS, 8, npix), lambda j, ct, cl: (g - 1 - j, 0, 0)),
            pl.BlockSpec((SUBS, 1, npix), lambda j, ct, cl: (g - 1 - j, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (NUM_FIELDS, SUBS * CHUNK), lambda j, ct, cl: (0, g - 1 - j)
        ),
        scratch_shapes=[
            pltpu.VMEM((npix, 8), jnp.float32),
        ],
    )
    dpairs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NUM_FIELDS, p), jnp.float32),
        interpret=_interpret(),
    )(chunk_tile, chunk_last, pairs, gchunk, bounds)
    return dpairs


def _gather_reduce_rows(values_rows: jax.Array, table: jax.Array) -> jax.Array:
    """Masked per-row sums: (P, F) values gathered through a (B, R)
    slot table (-1 = none) -> (B, F). The row gather is
    optimization_barrier-isolated on both sides: fused into
    producers/consumers XLA lowers it to a scalar-indexed emitter.
    Invalid slots must NOT share one dummy index: the TPU vector-gather
    emitter serializes on duplicate rows (VMEM bank conflicts), and
    clipping them all to 0 made the reductions cost ~5 ms each — 55% of
    a full backward. Valid entries are duplicate-free (the table is a
    partial permutation of aligned slots), so spreading the dummies
    across distinct rows keeps the whole gather conflict-free."""
    max_pairs = values_rows.shape[0]
    b, r = table.shape
    valid = table >= 0
    spread = jnp.arange(b * r, dtype=jnp.int32).reshape(b, r) % max_pairs
    slots = jnp.where(valid, table, spread)
    vr_b, slot_b = jax.lax.optimization_barrier((values_rows, slots))
    rows = jax.lax.optimization_barrier(vr_b[slot_b])       # (B, R, F)
    rows = rows * valid.astype(values_rows.dtype)[:, :, None]
    return jnp.sum(rows, axis=1)


def reduce_aligned_by_gaussian(
    values_rows: jax.Array,  # (P, F) per-ALIGNED-slot values
    cand_main: jax.Array,    # (N+1, K1) valid-first aligned slots (-1 none)
    cand_rest: jax.Array,    # (N+1, R-K1) slots past the main width
    tail_ids: jax.Array,     # (M,) compacted ids of rows with a tail
    tail_count: jax.Array,   # () int32 — true tail-row count
) -> jax.Array:
    """Per-gaussian sums of per-aligned-slot values through the binner's
    ROW-COMPACTED candidate->aligned-slot tables (TileBins.cand_main /
    cand_rest / tail_ids) — no global cumsum (an axis-0 cumsum over
    (P, F) keeps only F of 128 lanes busy, ~3 ms at production shapes),
    no per-iteration index gather (tables precomputed at binning), and
    no serialized scatter over the pair buffer (the CUDA reference needs
    block-reduce + atomicAdd here, backward.cu:759-784; the only scatter
    here is the M-row unique-index tail add-back). The gather is
    row-count-bound (~1.3 ns/row), so the narrow main table + compacted
    tail run ~4x faster than one (N+1, max_rect) table at typical
    footprints; when tail_count overflows the static tail capacity the
    exact full-rest-table fallback runs instead (lax.cond — only the
    taken branch executes). Returns (N+1, F)."""
    main = _gather_reduce_rows(values_rows, cand_main)
    m = tail_ids.shape[0]

    def fast(acc):
        rest_rows = cand_rest[tail_ids]                     # (M, R-K1)
        t = _gather_reduce_rows(values_rows, rest_rows)     # (M, F)
        return acc.at[tail_ids].add(t, unique_indices=True)

    def full(acc):
        return acc + _gather_reduce_rows(values_rows, cand_rest)

    return jax.lax.cond(tail_count <= m, fast, full, main)


def _csr_gather_pairs(fields_geo, fields_app, aligned_gid):
    """fields rows (N+1, 6)+(N+1, 4) -> CHUNK-aligned (FIELDS, P) pair
    buffer (single row gather from the VMEM-resident field table). The
    optimization_barrier stops XLA fusing the field-table construction
    into the gather — the fused kCustom gather lowers to the scalar
    emitter (~100x slower than the standalone vector gather at this
    shape)."""
    rows = jnp.concatenate([fields_geo, fields_app], axis=1)  # (N+1, F)
    rows, aligned_gid = jax.lax.optimization_barrier((rows, aligned_gid))
    return rows[aligned_gid].T                                # (F, P)


def _chunk_ranges(tile_count):
    n_chunks = -(-tile_count // CHUNK)
    chunk_start = (jnp.cumsum(n_chunks) - n_chunks).astype(jnp.int32)
    return chunk_start, n_chunks.astype(jnp.int32)


def _ccsr_impl(fields_geo, fields_app, bins_csr, tx_n, ty_n, tile,
               img_w, img_h):
    (aligned_gid, chunk_tile, chunk_first, tile_count) = bins_csr
    pairs = _csr_gather_pairs(fields_geo, fields_app, aligned_gid)
    part, nt, bounds = _csr_fwd_impl(
        pairs, chunk_tile, chunk_first,
        tx_n=tx_n, ty_n=ty_n, tile=tile, img_w=img_w, img_h=img_h,
        tiles_per_view=tx_n * ty_n, n_tiles_total=tx_n * ty_n,
    )
    npix = tile * tile
    chunk_start, n_chunks = _chunk_ranges(tile_count)
    tot6 = _csr_finalize(part, chunk_start, n_chunks, npix)
    t_final = jnp.exp(tot6[:, A_LA, :])
    return (
        (tot6[:, 0:NCH, :], tot6[:, NCH, :], t_final, nt),
        (pairs, bounds, t_final),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17))
def composite_csr(
    fields_geo, fields_app, aligned_gid, chunk_tile, chunk_first, chunk_last,
    tile_count, tile_start, aligned_start,
    cand_main, cand_rest, tail_ids, tail_count,
    tx_n, ty_n, tile, img_w, img_h,
):
    """CSR chunk-grid compositor. fields (N+1, 6)/(N+1, 4) + TileBins CSR
    arrays -> (color (T, 3, npix) channel-first, depth (T, npix),
    T_final (T, npix), n_touched (P,) per aligned slot).
    cand_main/cand_rest/tail_ids/tail_count are the binner's compacted
    per-gaussian candidate->aligned-slot tables for the backward
    reduction."""
    return _ccsr_impl(
        fields_geo, fields_app,
        (aligned_gid, chunk_tile, chunk_first, tile_count),
        tx_n, ty_n, tile, img_w, img_h,
    )[0]


def _ccsr_fwd(fields_geo, fields_app, aligned_gid, chunk_tile, chunk_first,
              chunk_last, tile_count, tile_start, aligned_start,
              cand_main, cand_rest, tail_ids, tail_count,
              tx_n, ty_n, tile, img_w, img_h):
    outs, (pairs, bounds, t_final) = _ccsr_impl(
        fields_geo, fields_app,
        (aligned_gid, chunk_tile, chunk_first, tile_count),
        tx_n, ty_n, tile, img_w, img_h,
    )
    res = (pairs, bounds, t_final, chunk_tile, chunk_last,
           cand_main, cand_rest, tail_ids, tail_count)
    return outs, res


def _ccsr_bwd(tx_n, ty_n, tile, img_w, img_h, res, g):
    (pairs, bounds, t_final, chunk_tile, chunk_last,
     cand_main, cand_rest, tail_ids, tail_count) = res
    g_color, g_depth, g_tf, _g_nt = g
    dpairs = _csr_bwd_impl(
        pairs, bounds, t_final, chunk_tile, chunk_last,
        g_color, g_depth, g_tf,
        tx_n=tx_n, ty_n=ty_n, tile=tile, img_w=img_w, img_h=img_h,
        tiles_per_view=tx_n * ty_n, n_tiles_total=tx_n * ty_n,
    )
    # ONE 10-field gather: the two reductions share indices, and the
    # in-situ gather cost is dominated by per-index overhead, not row
    # width (6F and 4F gathers both profiled ~2 ms) — combining halves it
    g_all = reduce_aligned_by_gaussian(
        dpairs.T, cand_main, cand_rest, tail_ids, tail_count
    )
    return (g_all[:, :NUM_GEO], g_all[:, NUM_GEO:],
            None, None, None, None, None, None, None,
            None, None, None, None)


composite_csr.defvjp(_ccsr_fwd, _ccsr_bwd)


def _ccsrm_impl(fields_geo, fields_app, bins_csr, tx_n, ty_n, tile,
                img_w, img_h):
    """Multi-view CSR: per-view chunk lists concatenated into ONE kernel
    grid (global tile ids = v*T + t; per-view sentinels -> global dummy
    row V*T)."""
    (aligned_gid, chunk_tile, chunk_first, tile_count) = bins_csr
    v, np1 = fields_geo.shape[0], fields_geo.shape[1]
    t_per_view = tile_count.shape[1]
    rows = jnp.concatenate([fields_geo, fields_app], axis=-1).reshape(
        v * np1, NUM_FIELDS
    )
    voff = jnp.arange(v, dtype=jnp.int32)[:, None]
    gid_g = (aligned_gid + voff * np1).reshape(-1)
    # barrier-isolated gather (fused with the concat/transpose it lowers
    # to the scalar-indexed emitter — see reduce_aligned_by_gaussian)
    rows_b, gid_b = jax.lax.optimization_barrier(
        (rows, gid_g.reshape(-1, 128))
    )
    gath = jax.lax.optimization_barrier(rows_b[gid_b])
    pairs = gath.reshape(gid_g.shape[0], NUM_FIELDS).T       # (F, V*P)
    ct_g = jnp.where(
        chunk_tile < t_per_view, chunk_tile + voff * t_per_view,
        v * t_per_view,
    ).reshape(-1)
    part, nt, bounds = _csr_fwd_impl(
        pairs, ct_g, chunk_first.reshape(-1),
        tx_n=tx_n, ty_n=ty_n, tile=tile, img_w=img_w, img_h=img_h,
        tiles_per_view=t_per_view, n_tiles_total=v * t_per_view,
    )
    npix = tile * tile
    c_max_v = chunk_tile.shape[1]
    chunk_start, n_chunks = jax.vmap(_chunk_ranges)(tile_count)
    chunk_start = (chunk_start + voff * c_max_v).reshape(-1)
    tot6 = _csr_finalize(part, chunk_start, n_chunks.reshape(-1), npix)
    t_final = jnp.exp(tot6[:, A_LA, :])
    shape_v = lambda a: a.reshape((v, t_per_view) + a.shape[1:])
    return (
        (shape_v(tot6[:, 0:NCH, :]), shape_v(tot6[:, NCH, :]),
         shape_v(t_final), nt.reshape(v, -1)),
        (pairs, bounds, t_final, ct_g),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17))
def composite_csr_multi(
    fields_geo, fields_app, aligned_gid, chunk_tile, chunk_first, chunk_last,
    tile_count, tile_start, aligned_start,
    cand_main, cand_rest, tail_ids, tail_count,
    tx_n, ty_n, tile, img_w, img_h,
):
    """Batched CSR compositor: leading V axis on every array; one kernel
    launch whose grid is the concatenation of all views' chunk lists.
    Returns per-view channel-first (V, T, [C,] npix) outputs + (V, P)
    aligned-slot n_touched."""
    return _ccsrm_impl(
        fields_geo, fields_app,
        (aligned_gid, chunk_tile, chunk_first, tile_count),
        tx_n, ty_n, tile, img_w, img_h,
    )[0]


def _ccsrm_fwd(fields_geo, fields_app, aligned_gid, chunk_tile, chunk_first,
               chunk_last, tile_count, tile_start, aligned_start,
               cand_main, cand_rest, tail_ids, tail_count,
               tx_n, ty_n, tile, img_w, img_h):
    outs, (pairs, bounds, t_final, ct_g) = _ccsrm_impl(
        fields_geo, fields_app,
        (aligned_gid, chunk_tile, chunk_first, tile_count),
        tx_n, ty_n, tile, img_w, img_h,
    )
    res = (pairs, bounds, t_final, ct_g, chunk_last,
           cand_main, cand_rest, tail_ids, tail_count)
    return outs, res


def _ccsrm_bwd(tx_n, ty_n, tile, img_w, img_h, res, g):
    (pairs, bounds, t_final, ct_g, chunk_last,
     cand_main, cand_rest, tail_ids, tail_count) = res
    g_color, g_depth, g_tf, _g_nt = g
    v, t_per_view = g_color.shape[0], g_color.shape[1]
    flat = lambda a: a.reshape((v * t_per_view,) + a.shape[2:])
    dpairs = _csr_bwd_impl(
        pairs, bounds, t_final, ct_g, chunk_last.reshape(-1),
        flat(g_color), flat(g_depth), flat(g_tf),
        tx_n=tx_n, ty_n=ty_n, tile=tile, img_w=img_w, img_h=img_h,
        tiles_per_view=t_per_view, n_tiles_total=v * t_per_view,
    )
    p = dpairs.shape[1] // v
    drows = dpairs.T.reshape(v, p, NUM_FIELDS)
    # PER-VIEW gathers, not vmap: batching the reduction gather into one
    # 3D gather makes XLA emit a single serialized row-walk over all
    # V*(N+1)*R rows (~21 ns/row — 114 ms at 10 views x 32K bucket, 54%
    # of the whole mapping fwd+bwd, the round-3 mapping regression);
    # sequential 2D per-view gathers run ~4.5x faster at identical
    # results (chip-measured, scripts/mb_gather.py)
    g_all = jax.lax.map(
        lambda a: reduce_aligned_by_gaussian(a[0], a[1], a[2], a[3], a[4]),
        (drows, cand_main, cand_rest, tail_ids, tail_count),
    )
    return (g_all[..., :NUM_GEO], g_all[..., NUM_GEO:],
            None, None, None, None, None, None, None,
            None, None, None, None)


composite_csr_multi.defvjp(_ccsrm_fwd, _ccsrm_bwd)
