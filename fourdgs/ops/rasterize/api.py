"""Differentiable Gaussian-splat rendering: preprocess -> bin -> composite.

This is the TPU-native counterpart of the reference render wrapper +
CUDA rasterizer (gaussian_splatting/gaussian_renderer/__init__.py:41-226
and submodules/diff-gaussian-rasterization). Camera-pose gradients flow
through `T_cw` by autodiff (callers parameterize
`T_cw = se3_exp(tau) @ T_cw0` and differentiate w.r.t. tau), replacing the
reference's theta/rho kernel arguments.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fourdgs.ops.rasterize.binning import bin_gaussians, tile_grid
from fourdgs.ops.rasterize.oracle import RenderOutputs, composite_oracle
from fourdgs.ops.rasterize.preprocess import preprocess
from fourdgs.ops.rasterize.tile_kernel import (
    composite_csr,
    composite_csr_multi,
    reduce_aligned_by_gaussian,
)


class RasterConfig(NamedTuple):
    """Static rasterizer capacity knobs (XLA shapes)."""

    tile: int = 16
    tile_cap: int = 512       # K: max pairs composited per tile
    max_rect: int = 16        # max tiles a Gaussian may touch (4x4)
    max_pairs: int = 1 << 18  # global (tile, gaussian) pair capacity
    use_oracle: bool = False  # pure-jnp compositor (tests / tiny scenes)
    with_n_touched: bool = True  # per-Gaussian visibility counts (skip in
    #                              inner tracking iterations for speed)

    @property
    def max_radius(self) -> int:
        # biggest radius whose getRect fits max_rect: a rect side of s
        # tiles covers radius r when 2r + tile - 1 < s*tile, i.e.
        # r <= ((s-1)*tile)/2 (s=4, tile=16 -> r<=24; the reference's own
        # size_threshold=20 pruning keeps radii below this anyway)
        side = int(self.max_rect ** 0.5)
        return ((side - 1) * self.tile) // 2


def ndc_project(x: jax.Array, full: jax.Array) -> jax.Array:
    """(N, 3) points through a 4x4 full projection (proj @ T_cw) to NDC.
    Shared by `render_flow` and the batched dynamic-mapping flow payloads
    (reference flow projection, gaussian_renderer/__init__.py:268-300) —
    keep the w-epsilon in ONE place."""
    hom = x @ full[:3, :3].T + full[:3, 3]
    w = x @ full[3, :3].T + full[3, 3]
    return hom / (w[:, None] + 1e-7)


def _assemble_image(tiles: jax.Array, tx_n: int, ty_n: int, tile: int, w: int, h: int):
    """CHANNEL-FIRST (num_tiles, C, tile*tile) or (num_tiles, tile*tile)
    -> ([C,] H, W). Keeping the pixel axis minor end-to-end (the tile
    compositor emits channel-first) leaves only this one genuine
    tile->raster data movement; a C-minor layout here pads the 128-lane
    dim 16-43x and cost ~4 ms/render in relayout copies."""
    if tiles.ndim == 3:
        c = tiles.shape[1]
        img = tiles.reshape(ty_n, tx_n, c, tile, tile)
        img = img.transpose(2, 0, 3, 1, 4).reshape(c, ty_n * tile, tx_n * tile)
        return img[:, :h, :w]
    img = tiles.reshape(ty_n, tx_n, tile, tile)
    img = img.transpose(0, 2, 1, 3).reshape(ty_n * tile, tx_n * tile)
    return img[:h, :w]


@partial(
    jax.jit,
    static_argnames=("fx", "fy", "width", "height", "tan_fovx", "tan_fovy", "config"),
)
def rasterize(
    means3d: jax.Array,
    scales: jax.Array,
    quats: jax.Array,
    opacities: jax.Array,
    colors: jax.Array,
    alive: jax.Array,
    T_cw: jax.Array,
    proj: jax.Array,
    bg: jax.Array,
    *,
    fx: float,
    fy: float,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    scale_mod: float = 1.0,
    mean2d_offset: jax.Array | None = None,
    config: RasterConfig = RasterConfig(),
    bins=None,
) -> RenderOutputs:
    """Render activated Gaussians. `colors` are per-Gaussian RGB (SH deg 0
    already evaluated) or any 3-channel payload (e.g. flow). `alive`
    masks capacity slots / non-rendered subsets (the reference's boolean
    `mask` argument). `mean2d_offset` is a zeros tap: its gradient is the
    screen-space mean gradient used for densification statistics
    (replaces reading .grad off viewspace_points). `bins` reuses a
    previous `compute_bins` result (tracking re-bins every few
    iterations — pose deltas of <1e-3 rarely change tile assignment;
    the CUDA reference re-sorts every call)."""
    sg = preprocess(
        means3d, scales, quats, opacities, colors, alive,
        T_cw, proj,
        fx=fx, fy=fy, width=width, height=height,
        tan_fovx=tan_fovx, tan_fovy=tan_fovy,
        scale_mod=scale_mod, max_radius=config.max_radius,
    )
    if mean2d_offset is not None:
        sg = sg._replace(mean2d=sg.mean2d + mean2d_offset)

    if config.use_oracle:
        return composite_oracle(sg, bg, width, height, tile=config.tile)

    tx_n, ty_n = tile_grid(width, height, config.tile)
    if bins is None:
        bins = bin_gaussians(
            jax.lax.stop_gradient(sg.mean2d),
            jax.lax.stop_gradient(sg.depth),
            sg.radius,
            sg.visible,
            width=width,
            height=height,
            tile=config.tile,
            max_rect=config.max_rect,
            max_pairs=config.max_pairs,
            tile_cap=config.tile_cap,
            opacity=jax.lax.stop_gradient(sg.opacity),
            cull_radius=jax.lax.stop_gradient(sg.sigma3),
        )

    n = means3d.shape[0]
    fields_geo = jnp.stack(
        [
            sg.mean2d[:, 0], sg.mean2d[:, 1],
            sg.conic[:, 0], sg.conic[:, 1], sg.conic[:, 2],
            sg.depth,
        ],
        axis=-1,
    )
    fields_app = jnp.stack(
        [sg.opacity, sg.color[:, 0], sg.color[:, 1], sg.color[:, 2]],
        axis=-1,
    )
    fields_geo = jnp.pad(fields_geo, ((0, 1), (0, 0)))  # zero row: gid == n
    fields_app = jnp.pad(fields_app, ((0, 1), (0, 0)))
    color_t, depth_t, tf_t, nt_t = composite_csr(
        fields_geo,
        fields_app,
        bins.aligned_gid,
        bins.chunk_tile,
        bins.chunk_first,
        bins.chunk_last,
        bins.tile_count,
        bins.tile_start,
        bins.aligned_start,
        bins.cand_main,
        bins.cand_rest,
        bins.tail_ids,
        bins.tail_count,
        tx_n,
        ty_n,
        config.tile,
        width,
        height,
    )

    # single 5-channel tile->image assembly (3 separate assembles cost
    # ~3 transpose copies each); channel-first throughout
    cdt = jnp.concatenate(
        [color_t, depth_t[:, None, :], tf_t[:, None, :]], axis=1
    )
    img5 = _assemble_image(cdt, tx_n, ty_n, config.tile, width, height)
    color, depth, t_final = img5[:3], img5[3], img5[4]
    color = color + t_final[None] * bg[:, None, None]

    if config.with_n_touched:
        nt = reduce_aligned_by_gaussian(
            jax.lax.stop_gradient(nt_t)[:, None],
            bins.cand_main, bins.cand_rest, bins.tail_ids, bins.tail_count,
        )[:n, 0].astype(jnp.int32)
    else:
        nt = jnp.zeros((n,), jnp.int32)

    return RenderOutputs(
        color=color,
        depth=depth,
        alpha=1.0 - t_final,
        n_touched=nt,
        T_final=t_final,
        radii=jax.lax.stop_gradient(sg.radius),
        overflow=bins.overflow,
        # budget-sizing signal: the CHUNK-aligned layout's need, not just
        # the raw pair count (alignment dominates at full tile coverage)
        num_pairs=jnp.maximum(bins.num_pairs, bins.aligned_slots),
    )


@partial(
    jax.jit,
    static_argnames=("fx", "fy", "width", "height", "tan_fovx", "tan_fovy", "config"),
)
def render_flow(
    means3d: jax.Array,
    scales: jax.Array,       # activated (exp) scales
    quats: jax.Array,        # normalized rotations
    opacities: jax.Array,    # activated opacities
    dygs: jax.Array,         # (N,) bool dynamic flags
    alive: jax.Array,
    d_xyz1: jax.Array,       # (N, 3) deformation at t1 (zeros on static)
    d_xyz2: jax.Array,       # (N, 3) deformation at t2
    d_rot1: jax.Array,       # (N, 4) rotation residual at t1
    d_scale1: jax.Array,     # (N, 3) scale residual at t1
    T_cw1: jax.Array,
    T_cw2: jax.Array,
    proj: jax.Array,
    *,
    fx: float,
    fy: float,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    config: RasterConfig = RasterConfig(),
) -> RenderOutputs:
    """Rasterize the scene flow between times/cameras (t1, cam1) ->
    (t2, cam2) as a 3-channel image: NDC-units (du, dv) in xy and the
    dygs flag in z, zero background — reference render_flow
    (gaussian_renderer/__init__.py:229-361). Gaussian base parameters are
    detached (only the deformation deltas receive gradients); colors are
    the per-Gaussian flow payload."""
    sg_stop = jax.lax.stop_gradient
    base_xyz = sg_stop(means3d)
    x1 = base_xyz + d_xyz1
    x2 = base_xyz + d_xyz2

    full1 = proj @ T_cw1
    full2 = proj @ T_cw2

    flow = ndc_project(x2, full2) - ndc_project(x1, full1)
    payload = jnp.concatenate(
        [flow[:, :2], dygs.astype(jnp.float32)[:, None]], axis=1
    )

    return rasterize(
        x1,
        sg_stop(scales) + d_scale1,
        sg_stop(quats) + d_rot1,
        sg_stop(opacities),
        payload,
        alive,
        T_cw1,
        proj,
        jnp.zeros(3),
        fx=fx, fy=fy, width=width, height=height,
        tan_fovx=tan_fovx, tan_fovy=tan_fovy,
        config=config,
    )


@partial(
    jax.jit,
    static_argnames=("fx", "fy", "width", "height", "tan_fovx", "tan_fovy", "config"),
)
def compute_bins(
    means3d: jax.Array,
    scales: jax.Array,
    quats: jax.Array,
    alive: jax.Array,
    T_cw: jax.Array,
    proj: jax.Array,
    opacities: jax.Array | None = None,
    *,
    fx: float,
    fy: float,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    scale_mod: float = 1.0,
    config: RasterConfig = RasterConfig(),
):
    """Standalone tile binning at a given pose — for reuse across nearby
    render calls (tracking iterations between re-bins). Forward-only:
    everything is under stop_gradient."""
    op = (
        jnp.ones(means3d.shape[0]) if opacities is None
        else jax.lax.stop_gradient(opacities)
    )
    sg = preprocess(
        jax.lax.stop_gradient(means3d), jax.lax.stop_gradient(scales),
        jax.lax.stop_gradient(quats),
        op,
        jnp.zeros((means3d.shape[0], 3)),
        alive, jax.lax.stop_gradient(T_cw), proj,
        fx=fx, fy=fy, width=width, height=height,
        tan_fovx=tan_fovx, tan_fovy=tan_fovy,
        scale_mod=scale_mod, max_radius=config.max_radius,
    )
    return bin_gaussians(
        sg.mean2d, sg.depth, sg.radius, sg.visible,
        width=width, height=height, tile=config.tile,
        max_rect=config.max_rect, max_pairs=config.max_pairs,
        tile_cap=config.tile_cap, opacity=sg.opacity,
        cull_radius=sg.sigma3,
    )


@partial(
    jax.jit,
    static_argnames=("fx", "fy", "width", "height", "tan_fovx", "tan_fovy", "config"),
)
def compute_bins_multi(
    means3d: jax.Array,     # (N, 3) shared or (V, N, 3)
    scales: jax.Array,
    quats: jax.Array,
    alive: jax.Array,
    T_cws: jax.Array,       # (V, 4, 4)
    proj: jax.Array,
    opacities: jax.Array | None = None,  # (N,) or (V, N)
    *,
    fx: float,
    fy: float,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    scale_mod: float = 1.0,
    config: RasterConfig = RasterConfig(),
):
    """Per-view tile binning for a view set (forward-only) — the
    reusable part of `rasterize_multi` for mapping-iteration bins
    reuse."""
    ax = lambda a, nd: 0 if a.ndim == nd else None
    op = (
        jnp.ones(means3d.shape[-2]) if opacities is None
        else jax.lax.stop_gradient(opacities)
    )
    sgs = jax.vmap(
        lambda m, s, q, o, T: preprocess(
            jax.lax.stop_gradient(m), jax.lax.stop_gradient(s),
            jax.lax.stop_gradient(q),
            o,
            jnp.zeros((means3d.shape[-2], 3)),
            alive, jax.lax.stop_gradient(T), proj,
            fx=fx, fy=fy, width=width, height=height,
            tan_fovx=tan_fovx, tan_fovy=tan_fovy,
            scale_mod=scale_mod, max_radius=config.max_radius,
        ),
        in_axes=(ax(means3d, 3), ax(scales, 3), ax(quats, 3),
                 ax(op, 2), 0),
    )(means3d, scales, quats, op, T_cws)
    return jax.lax.map(
        lambda args: bin_gaussians(
            args[0], args[1], args[2], args[3],
            width=width, height=height, tile=config.tile,
            max_rect=config.max_rect, max_pairs=config.max_pairs,
            tile_cap=config.tile_cap, opacity=args[4],
            cull_radius=args[5],
        ),
        (sgs.mean2d, sgs.depth, sgs.radius, sgs.visible, sgs.opacity,
         sgs.sigma3),
    )


@partial(
    jax.jit,
    static_argnames=("fx", "fy", "width", "height", "tan_fovx", "tan_fovy", "config"),
)
def rasterize_multi(
    means3d: jax.Array,     # (N, 3) shared or (V, N, 3) per-view (deformed)
    scales: jax.Array,      # (N, 3) or (V, N, 3)
    quats: jax.Array,       # (N, 4) or (V, N, 4)
    opacities: jax.Array,   # (N,) shared or (V, N) per-view
    colors: jax.Array,      # (N, 3) shared or (V, N, 3) per-view payloads
    alive: jax.Array,       # (N,) shared
    T_cws: jax.Array,       # (V, 4, 4)
    proj: jax.Array,
    bg: jax.Array,
    *,
    fx: float,
    fy: float,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    scale_mod: float = 1.0,
    mean2d_offsets: jax.Array | None = None,   # (V, N, 2) gradient taps
    config: RasterConfig = RasterConfig(),
    bins=None,                                 # reuse a compute_bins_multi result
) -> RenderOutputs:
    """Batched multi-view render: V views in one preprocess/binning vmap
    and ONE Pallas launch (grid = V x tiles). This is the mapping
    backend's per-iteration workhorse — the reference renders its window
    sequentially (slam_backend.py:306-774, per-viewpoint render calls);
    batching the views keeps the TPU pipelines full and shares the
    Gaussian activations. Outputs carry a leading V axis. `bins` reuses a
    previous `compute_bins_multi` result across nearby mapping
    iterations (per-iteration parameter/pose deltas move screen means by
    far less than a tile)."""
    v = T_cws.shape[0]
    ax = lambda a, nd: 0 if a.ndim == nd else None
    if config.use_oracle:
        # pure-jnp compositor (tests / tiny scenes): vmap the whole render
        return jax.vmap(
            lambda m, s, q, o, c, T, off: rasterize(
                m, s, q, o, c, alive, T, proj, bg,
                fx=fx, fy=fy, width=width, height=height,
                tan_fovx=tan_fovx, tan_fovy=tan_fovy,
                scale_mod=scale_mod, mean2d_offset=off, config=config,
            ),
            in_axes=(ax(means3d, 3), ax(scales, 3), ax(quats, 3),
                     ax(opacities, 2), ax(colors, 3), 0,
                     None if mean2d_offsets is None else 0),
        )(means3d, scales, quats, opacities, colors, T_cws, mean2d_offsets)
    pp = jax.vmap(
        lambda m, s, q, o, c, T: preprocess(
            m, s, q, o, c, alive, T, proj,
            fx=fx, fy=fy, width=width, height=height,
            tan_fovx=tan_fovx, tan_fovy=tan_fovy,
            scale_mod=scale_mod, max_radius=config.max_radius,
        ),
        in_axes=(ax(means3d, 3), ax(scales, 3), ax(quats, 3),
                 ax(opacities, 2), ax(colors, 3), 0),
    )
    sg = pp(means3d, scales, quats, opacities, colors, T_cws)
    if mean2d_offsets is not None:
        sg = sg._replace(mean2d=sg.mean2d + mean2d_offsets)

    tx_n, ty_n = tile_grid(width, height, config.tile)
    if bins is None:
        # sequential per-view binning (lax.map): XLA's batched (vmapped)
        # sort runs ~2.5x slower than V back-to-back sorts at these shapes
        bins = jax.lax.map(
            lambda args: bin_gaussians(
                args[0], args[1], args[2], args[3],
                width=width, height=height, tile=config.tile,
                max_rect=config.max_rect, max_pairs=config.max_pairs,
                tile_cap=config.tile_cap, opacity=args[4],
                cull_radius=args[5],
            ),
            (
                jax.lax.stop_gradient(sg.mean2d),
                jax.lax.stop_gradient(sg.depth),
                sg.radius, sg.visible,
                jax.lax.stop_gradient(sg.opacity),
                jax.lax.stop_gradient(sg.sigma3),
            ),
        )

    n = sg.mean2d.shape[1]
    fields_geo = jnp.concatenate(
        [sg.mean2d, sg.conic, sg.depth[..., None]], axis=-1
    )  # (V, N, 6) [mx,my,ca,cb,cc,depth]
    fields_app = jnp.concatenate(
        [sg.opacity[..., None], sg.color], axis=-1
    )  # (V, N, 4)
    fields_geo = jnp.pad(fields_geo, ((0, 0), (0, 1), (0, 0)))
    fields_app = jnp.pad(fields_app, ((0, 0), (0, 1), (0, 0)))
    color_t, depth_t, tf_t, nt_t = composite_csr_multi(
        fields_geo, fields_app,
        bins.aligned_gid, bins.chunk_tile, bins.chunk_first, bins.chunk_last,
        bins.tile_count, bins.tile_start, bins.aligned_start,
        bins.cand_main, bins.cand_rest, bins.tail_ids, bins.tail_count,
        tx_n, ty_n, config.tile, width, height,
    )

    asm = jax.vmap(
        lambda t: _assemble_image(t, tx_n, ty_n, config.tile, width, height)
    )
    cdt = jnp.concatenate(
        [color_t, depth_t[:, :, None, :], tf_t[:, :, None, :]], axis=2
    )
    img5 = asm(cdt)
    color, depth, t_final = img5[:, :3], img5[:, 3], img5[:, 4]
    color = color + t_final[:, None] * bg[None, :, None, None]

    if config.with_n_touched:
        # lax.map, not vmap: a batched reduction gather serializes on
        # TPU (see _ccsrm_bwd) — per-view 2D gathers stay on the fast
        # vector-gather emitter
        nt = jax.lax.map(
            lambda a: reduce_aligned_by_gaussian(
                jax.lax.stop_gradient(a[0])[:, None],
                a[1], a[2], a[3], a[4],
            )[:n, 0].astype(jnp.int32),
            (nt_t, bins.cand_main, bins.cand_rest, bins.tail_ids,
             bins.tail_count),
        )
    else:
        nt = jnp.zeros((v, n), jnp.int32)

    return RenderOutputs(
        color=color,
        depth=depth,
        alpha=1.0 - t_final,
        n_touched=nt,
        T_final=t_final,
        radii=jax.lax.stop_gradient(sg.radius),
        overflow=jnp.any(bins.overflow),
        num_pairs=jnp.max(jnp.maximum(bins.num_pairs, bins.aligned_slots)),
    )
