"""Mapping backend: multi-view map optimization over the keyframe window.

Re-design of the reference backend mapping loop
(utils/slam_backend.py:306-774 `map`, :238-297 `initialize_map`,
:1009-1225 `map_static`) as jitted chunks:

  - one `map_chunk` call runs `num_iters` optimization iterations inside
    `lax.fori_loop`: per iteration it renders the window views plus 2
    random replay keyframes (reference :526), takes the mapping loss +
    10x isotropic scale regularizer (:653-655), and applies Adam to the
    map parameters and to the per-keyframe pose/exposure (first
    `pose_window` views, rot/trans LR halved — reference :957-971),
  - the reference's `i > 100` gating of map-parameter steps during the
    200-iteration keyframe phase (:768-772) is the `step_after` argument,
  - densify / opacity-reset / prune cadence runs on the host BETWEEN
    chunks (the host owns `iteration_count` and calls the jitted
    `densify_and_prune` / `reset_opacity_nonvisible` at the reference's
    boundaries: every `gaussian_update_every` at `gaussian_update_offset`,
    reset every `gaussian_reset` — :723-745),
  - per-view visibility (n_touched > 0) for window bookkeeping is
    computed by `window_visibility` after the chunk, matching
    occ_aware_visibility (:665-668).

All keyframe pixels/poses live in the device-resident KeyframeStore, so
random replay needs no host round trip.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from fourdgs.geometry.se3 import se3_exp
from fourdgs.models.gaussian_map import (
    AdamState,
    GaussianMap,
    MapLRs,
    adam_step,
)
from fourdgs.ops.rasterize import RasterConfig, rasterize
from fourdgs.ops.rasterize.api import compute_bins_multi, rasterize_multi
from fourdgs.slam.camera import Intrinsics
from fourdgs.slam.keyframes import KeyframeStore
from fourdgs.slam.losses import apply_exposure, isotropic_loss, mapping_loss_rgbd


class MappingConfig(NamedTuple):
    num_window_views: int = 8     # key_opt slots (window[:3] + covisible picks)
    num_random_views: int = 2     # random replay keyframes per iteration
    pose_window: int = 3
    alpha: float = 0.9
    rgb_boundary_threshold: float = 0.01
    lr_rot: float = 0.0015        # 0.5 x tracking LRs (slam_backend.py:962-970)
    lr_trans: float = 0.0005
    lr_exposure: float = 0.01
    isotropic_weight: float = 10.0
    monocular: bool = False
    refine: bool = False          # color-refinement objective (SSIM mix)
    lambda_dssim: float = 0.2
    rm_dynamic: bool = True       # mask dynamic pixels out of the loss
    raster: RasterConfig = RasterConfig(with_n_touched=False)
    lrs: MapLRs = MapLRs()
    # xyz exponential LR schedule (reference update_learning_rate,
    # gaussian_model.py:511-525, called per mapping iteration at
    # slam_backend.py:771,854,1211): multiplier decays 1 -> xyz_lr_ratio
    # over xyz_lr_max_steps global iterations.
    xyz_lr_ratio: float = 0.01    # position_lr_final / position_lr_init
    xyz_lr_max_steps: int = 30000
    # tile binning of the WINDOW views is recomputed every `rebin_every`
    # iterations inside a chunk (replay views re-bin every iteration —
    # their slots change). Per-iteration parameter/pose deltas move
    # screen means far less than a 16px tile, and chunks break at
    # densify boundaries so structure changes always rebin. 1 = the
    # reference behavior of re-sorting every render.
    rebin_every: int = 4

    @property
    def num_views(self) -> int:
        return self.num_window_views + self.num_random_views


def refine_picks(key, rand_pool: jax.Array, rand_pool_size: jax.Array,
                 nv: int):
    """Per-iteration color-refinement view sampling: `nv` DISTINCT random
    keyframes drawn uniformly from the full history (reference
    color_refinement pops 10 random entries from the whole viewpoint
    stack each iteration, slam_backend.py:783-789 — NOT a fixed window).
    Masked argsort of uniform keys = a uniform random subset of the valid
    pool entries. Returns (slots (nv,), valids (nv,))."""
    m = rand_pool.shape[0]
    u = jax.random.uniform(key, (m,))
    u = jnp.where(jnp.arange(m) < rand_pool_size, u, jnp.inf)
    order = jnp.argsort(u)
    take = min(nv, m)            # pool buffer may be shorter than nv
    slots = jnp.zeros(nv, rand_pool.dtype).at[:take].set(
        rand_pool[order[:take]]
    )
    valids = jnp.arange(nv) < jnp.minimum(rand_pool_size, take)
    return slots, valids


class PoseAdam(NamedTuple):
    mu: jax.Array     # (V, 8) [trans(3), rot(3), exposure(2)]
    nu: jax.Array     # (V, 8)
    count: jax.Array  # () int32


def init_pose_adam(num_views: int) -> PoseAdam:
    return PoseAdam(
        mu=jnp.zeros((num_views, 8)),
        nu=jnp.zeros((num_views, 8)),
        count=jnp.zeros((), jnp.int32),
    )


class MapChunkResult(NamedTuple):
    gmap: GaussianMap
    adam: AdamState
    store: KeyframeStore
    pose_adam: PoseAdam
    final_loss: jax.Array
    overflow: jax.Array    # () bool — any render overflowed its pair buffer
    num_pairs: jax.Array   # () int32 — max pairs per view seen in the chunk


def _render_view(gmap: GaussianMap, T_cw, proj, intr: Intrinsics, cfg: MappingConfig,
                 mean2d_offset=None):
    return rasterize(
        gmap.params.xyz,
        gmap.get_scaling,
        gmap.get_rotation,
        gmap.get_opacity,
        gmap.get_color,
        gmap.alive,
        T_cw,
        proj,
        jnp.zeros(3),
        fx=intr.fx, fy=intr.fy, width=intr.width, height=intr.height,
        tan_fovx=intr.tan_fovx, tan_fovy=intr.tan_fovy,
        mean2d_offset=mean2d_offset,
        config=cfg.raster,
    )


def _render_views(gmap: GaussianMap, T_cws, proj, intr: Intrinsics,
                  cfg: MappingConfig, mean2d_offsets=None, bins=None):
    """Batched render of V views of the shared map (one kernel launch)."""
    return rasterize_multi(
        gmap.params.xyz,
        gmap.get_scaling,
        gmap.get_rotation,
        gmap.get_opacity,
        gmap.get_color,
        gmap.alive,
        T_cws,
        proj,
        jnp.zeros(3),
        fx=intr.fx, fy=intr.fy, width=intr.width, height=intr.height,
        tan_fovx=intr.tan_fovx, tan_fovy=intr.tan_fovy,
        mean2d_offsets=mean2d_offsets,
        config=cfg.raster,
        bins=bins,
    )


def _window_bins(gmap: GaussianMap, store: KeyframeStore, slots, proj,
                 intr: Intrinsics, cfg: MappingConfig):
    """Forward-only binning of a view subset at current poses."""
    return compute_bins_multi(
        gmap.params.xyz, gmap.get_scaling, gmap.get_rotation, gmap.alive,
        store.T_cw[slots], proj, gmap.get_opacity,
        fx=intr.fx, fy=intr.fy, width=intr.width, height=intr.height,
        tan_fovx=intr.tan_fovx, tan_fovy=intr.tan_fovy,
        config=cfg.raster,
    )


def _view_set_loss(
    g: GaussianMap,
    store: KeyframeStore,
    slots: jax.Array,     # (V,) int32
    valids: jax.Array,    # (V,) bool
    dtaus: jax.Array,     # (V, 6)
    dexps: jax.Array,     # (V, 2)
    taps: jax.Array,      # (V, cap, 2) mean2d gradient taps
    ems,                  # (V, H, W) bool extra masks or None
    proj: jax.Array,
    intr: Intrinsics,
    cfg: MappingConfig,
    bins=None,
):
    """Sum of per-view mapping losses over a view set (ONE batched render;
    no isotropic term — the caller adds it once). Shared by the
    single-device and the mesh-sharded `map_chunk` gradient paths."""
    # ONE batched render of the whole view set (vs the reference's
    # sequential per-viewpoint renders, slam_backend.py:306-774)
    T_vs = jax.vmap(lambda tau, slot: se3_exp(tau) @ store.T_cw[slot])(
        dtaus, slots
    )
    exp_abs = store.exposure[slots] + dexps            # (V, 2)
    images_gt = store.images_u8[slots].astype(jnp.float32) / 255.0
    depths_gt = store.depths[slots]
    motions = store.motion[slots]
    out = _render_views(g, T_vs, proj, intr, cfg, mean2d_offsets=taps,
                        bins=bins)
    images_ab = jax.vmap(apply_exposure)(
        out.color, exp_abs[:, 0], exp_abs[:, 1]
    )

    if cfg.refine:
        # color refinement: (1-lambda)*L1 + lambda*(1-SSIM) + 0.1*L1depth,
        # motion-masked (reference color_refinement,
        # slam_backend.py:820-840)
        from fourdgs.ops.image import ssim

        def refine_loss(image_ab, image_gt, depth, depth_gt, motion):
            mf = motion.astype(jnp.float32)[None]
            l1 = jnp.mean(jnp.abs((image_ab - image_gt) * mf))
            dmask = ((depth_gt > 0.01) & motion).astype(jnp.float32)
            l1d = jnp.mean(jnp.abs((depth - depth_gt) * dmask))
            return (
                (1 - cfg.lambda_dssim) * l1
                + cfg.lambda_dssim * (1.0 - ssim(image_ab * mf, image_gt * mf))
                + 0.1 * l1d
            )

        per_view = jax.vmap(refine_loss)(
            images_ab, images_gt, out.depth, depths_gt, motions
        )
    elif cfg.monocular:
        # rgb-only mapping (get_loss_mapping_rgb, utils/slam_utils.py:263-272)
        rgb_masks = (
            jnp.sum(images_gt, axis=1) > cfg.rgb_boundary_threshold
        ).astype(jnp.float32)[:, None]
        per_view = jnp.mean(
            jnp.abs((images_ab - images_gt) * rgb_masks), axis=(1, 2, 3)
        )
    else:
        per_view = jax.vmap(
            lambda ia, ig, d, dg, m, em: mapping_loss_rgbd(
                ia, d, ig, dg,
                motion_mask=m,
                extra_mask=em,
                alpha=cfg.alpha,
                rgb_boundary_threshold=cfg.rgb_boundary_threshold,
                rm_dynamic=cfg.rm_dynamic,
            ),
            in_axes=(0, 0, 0, 0, 0, None if ems is None else 0),
        )(images_ab, images_gt, out.depth, depths_gt, motions, ems)

    total = jnp.sum(jnp.where(valids, per_view, 0.0))
    radii_oks = (out.radii > 0) & valids[:, None]
    # scalars on both compositor paths (the oracle path vmaps the whole
    # render, so its flags arrive per-view)
    return total, (radii_oks, jnp.any(out.overflow), jnp.max(out.num_pairs))


@partial(jax.jit, static_argnames=("intr", "cfg", "mesh"))
def map_chunk(
    gmap: GaussianMap,
    adam: AdamState,
    store: KeyframeStore,
    window_slots: jax.Array,   # (Vw,) int32 store slots (key_opt order)
    window_valid: jax.Array,   # (Vw,) bool
    opt_pose: jax.Array,       # (Vw,) bool — optimize pose of this view
    rand_pool: jax.Array,      # (R,) int32 candidate slots for replay
    rand_pool_size: jax.Array,  # () int32
    pose_adam: PoseAdam,
    key: jax.Array,
    num_iters: jax.Array,      # () int32 — dynamic trip count
    step_after: jax.Array,     # () int32 — map params step when i > step_after
    iter_base: jax.Array,      # () int32 — global iteration_count at chunk start
    intr: Intrinsics,
    cfg: MappingConfig = MappingConfig(),
    extra_masks: jax.Array | None = None,  # (Vw, H, W) bool reproject masks
    mesh: jax.sharding.Mesh | None = None,
) -> MapChunkResult:
    """With `mesh`, the per-iteration render+gradient fans out over the
    mesh's first axis (views sharded, map replicated, param-grads psum'd)
    via shard_map — the reference has no multi-device mapping at all; this
    is the production `map_chunk`, not a demo objective. The view set is
    padded to a multiple of the device count with invalid views."""
    proj = intr.proj()
    vw = cfg.num_window_views
    vr = cfg.num_random_views
    cap = gmap.capacity
    nv = vw + vr
    if mesh is not None:
        ndev = int(np.prod(mesh.devices.shape))
        nvp = -(-nv // ndev) * ndev   # padded view count
    else:
        ndev, nvp = 1, nv
    # reproject masks: window views use theirs, replay/padded views pass
    # all-ones (AND-identity in mapping_loss_rgbd)
    if extra_masks is not None:
        ems = jnp.concatenate(
            [extra_masks,
             jnp.ones((nvp - vw,) + extra_masks.shape[1:], bool)]
        )
    elif mesh is not None:
        ems = jnp.ones((nvp, store.images_u8.shape[2], store.images_u8.shape[3]), bool)
    else:
        ems = None
    pose_lr = jnp.concatenate(
        [
            jnp.full((3,), cfg.lr_trans),
            jnp.full((3,), cfg.lr_rot),
            jnp.full((2,), cfg.lr_exposure),
        ]
    )

    def body(i, state, bins_w):
        gmap, adam, store, pose_adam, _, ov_seen, pm_seen = state
        ki = jax.random.fold_in(key, i)

        if cfg.refine:
            # color refinement: the ENTIRE view set is nv distinct random
            # keyframes from the full history each iteration (reference
            # slam_backend.py:783-789) — no fixed window
            r_slots, r_valid = refine_picks(ki, rand_pool, rand_pool_size, nv)
            slots = jnp.concatenate([r_slots, jnp.zeros(nvp - nv, jnp.int32)])
            valids = jnp.concatenate([r_valid, jnp.zeros(nvp - nv, bool)])
        else:
            # --- random replay picks (distinct, from the host pool) ---
            size = jnp.maximum(rand_pool_size, 1)
            r1 = jax.random.randint(ki, (), 0, size)
            r2 = jax.random.randint(jax.random.fold_in(ki, 1), (), 0, jnp.maximum(size - 1, 1))
            r2 = jnp.where(r2 >= r1, r2 + 1, r2) % size
            rand_slots = jnp.stack([rand_pool[r1], rand_pool[r2]])[:vr]
            rand_valid = jnp.arange(vr) < jnp.minimum(rand_pool_size, vr)

            slots = jnp.concatenate(
                [window_slots, rand_slots, jnp.zeros(nvp - nv, jnp.int32)]
            )
            valids = jnp.concatenate(
                [window_valid, rand_valid, jnp.zeros(nvp - nv, bool)]
            )

        taps = jnp.zeros((nvp, cap, 2))
        dtaus = jnp.zeros((nvp, 6))
        dexps = jnp.zeros((nvp, 2))

        def iso_fn(params):
            return cfg.isotropic_weight * isotropic_loss(
                jnp.exp(params.scaling), gmap.alive
            )

        if mesh is None:
            # window-view binning reused within a round (computed at the
            # round top, closed over — NOT loop-carried, so no per-
            # iteration copies); replay (+pad) views re-bin every
            # iteration (fresh slots). Refine mode re-bins everything
            # (all slots are fresh picks).
            if bins_w is not None:
                bins_r = _window_bins(
                    gmap, store, slots[vw:], proj, intr, cfg
                )
                bins = jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b]), bins_w, bins_r
                )
            else:
                bins = None

            def loss_fn(params, dtaus, dexps, taps):
                g = gmap._replace(params=params)
                total, aux = _view_set_loss(
                    g, store, slots, valids, dtaus, dexps, taps, ems,
                    proj, intr, cfg, bins=bins,
                )
                return total + iso_fn(params), aux

            (loss_val, (radii_oks, ov_i, pm_i)), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2, 3), has_aux=True
            )(gmap.params, dtaus, dexps, taps)
            g_params, g_taus, g_exps, g_taps = grads
            ov_seen = ov_seen | ov_i
            pm_seen = jnp.maximum(pm_seen, pm_i)
        else:
            # views sharded over the mesh axis, map replicated: each device
            # renders nvp/ndev views and backprops them; param-grads and the
            # scalar loss are psum'd, per-view grads stay sharded.
            # (binning stays exact per-iteration on the mesh path)
            ax = mesh.axis_names[0]

            def shard_fn(slots_l, valids_l, dtaus_l, dexps_l, taps_l, ems_l):
                def local_loss(params, dt, de, tp):
                    g = gmap._replace(params=params)
                    return _view_set_loss(
                        g, store, slots_l, valids_l, dt, de, tp, ems_l,
                        proj, intr, cfg,
                    )

                (l, (radii_l, ov_l, pm_l)), gr = jax.value_and_grad(
                    local_loss, argnums=(0, 1, 2, 3), has_aux=True
                )(gmap.params, dtaus_l, dexps_l, taps_l)
                return (
                    jax.lax.psum(l, ax), radii_l,
                    jax.lax.pmax(ov_l.astype(jnp.int32), ax),
                    jax.lax.pmax(pm_l, ax),
                    jax.lax.psum(gr[0], ax), gr[1], gr[2], gr[3],
                )

            (loss_views, radii_oks, ov_i, pm_i,
             g_params, g_taus, g_exps, g_taps) = shard_map(
                shard_fn, mesh=mesh,
                in_specs=(P(ax), P(ax), P(ax), P(ax), P(ax), P(ax)),
                out_specs=(P(), P(ax), P(), P(), P(), P(ax), P(ax), P(ax)),
                check_vma=False,
            )(slots, valids, dtaus, dexps, taps, ems)
            iso_val, iso_grad = jax.value_and_grad(iso_fn)(gmap.params)
            loss_val = loss_views + iso_val
            g_params = jax.tree.map(jnp.add, g_params, iso_grad)
            ov_seen = ov_seen | (ov_i > 0)
            pm_seen = jnp.maximum(pm_seen, pm_i)

        # --- densification stats (reference :749-760 uses radii>0) ---
        norms = jnp.linalg.norm(g_taps, axis=-1)              # (V, cap)
        upd = radii_oks.astype(jnp.float32)                    # (V, cap)
        gmap = gmap._replace(
            grad_accum=gmap.grad_accum + jnp.sum(norms * upd, axis=0),
            denom=gmap.denom + jnp.sum(upd, axis=0),
        )

        # --- map parameter step, gated by the i>step_after rule ---
        # xyz LR schedule at the global iteration count (reference
        # update_learning_rate(self.iteration_count) after every step,
        # slam_backend.py:771): only iterations past step_after advance
        # the count (matching the runner's host arithmetic).
        from fourdgs.models.gaussian_map import expon_lr

        adv = jnp.maximum(0, i - jnp.maximum(step_after + 1, 0))
        xyz_lr_mult = expon_lr(
            (iter_base + adv).astype(jnp.float32), 1.0, cfg.xyz_lr_ratio,
            max_steps=cfg.xyz_lr_max_steps,
        )

        def do_step(operand):
            gmap, adam = operand
            p2, a2 = adam_step(
                gmap.params, g_params, adam, cfg.lrs, gmap.alive,
                xyz_lr_mult=xyz_lr_mult,
            )
            return gmap._replace(params=p2), a2

        gmap, adam = jax.lax.cond(
            i > step_after, do_step, lambda o: o, (gmap, adam)
        )

        if cfg.refine:
            # color refinement steps ONLY the map parameters (reference
            # slam_backend.py:845-855: gaussian optimizer alone; poses and
            # exposures are fixed)
            return (gmap, adam, store, pose_adam, loss_val, ov_seen, pm_seen)

        # --- pose + exposure step for window views ---
        gp = jnp.concatenate([g_taus[:vw], g_exps[:vw]], axis=1)  # (Vw, 8)
        # pose rows masked for non-optimized views; exposure always on
        # for valid window views with uid != 0 (reference :955-992)
        uid_ok = (store.uids[window_slots] != 0) & window_valid
        pose_mask = (opt_pose & uid_ok)[:, None] * jnp.ones((1, 6))
        exp_mask = uid_ok[:, None] * jnp.ones((1, 2))
        mask8 = jnp.concatenate([pose_mask, exp_mask], axis=1)
        gp = gp * mask8

        count = pose_adam.count + 1
        b1, b2, eps = 0.9, 0.999, 1e-8
        mu = b1 * pose_adam.mu + (1 - b1) * gp
        nu = b2 * pose_adam.nu + (1 - b2) * gp * gp
        t = count.astype(jnp.float32)
        step = pose_lr[None, :] * (mu / (1 - b1**t)) / (
            jnp.sqrt(nu / (1 - b2**t)) + eps
        )
        upd8 = -step * mask8
        taus = jnp.concatenate([upd8[:, :3], upd8[:, 3:6]], axis=1)  # (Vw, 6)
        new_T = jax.vmap(lambda tau, T: se3_exp(tau) @ T)(
            taus, store.T_cw[window_slots]
        )
        new_exp = store.exposure[window_slots] + upd8[:, 6:8]
        store = store._replace(
            T_cw=store.T_cw.at[window_slots].set(new_T),
            exposure=store.exposure.at[window_slots].set(new_exp),
        )
        pose_adam = PoseAdam(mu=mu, nu=nu, count=count)

        return (gmap, adam, store, pose_adam, loss_val, ov_seen, pm_seen)

    # Two-level loop: the OUTER fori runs rounds of rebin_every
    # iterations; window-view binning is computed unconditionally at the
    # round top and closed over by the inner fori — never loop-carried,
    # so no per-iteration copies of the multi-MB bins arrays. Iterations
    # past num_iters in the final round take a cheap identity branch.
    reuse_bins = (
        mesh is None and not cfg.raster.use_oracle and cfg.rebin_every > 1
        and not cfg.refine
    )
    rb = max(cfg.rebin_every, 1) if reuse_bins else 1
    n_rounds = -(-num_iters // rb) if reuse_bins else num_iters

    def round_body(r, state):
        if reuse_bins:
            bins_w = _window_bins(state[0], state[2], window_slots, proj,
                                  intr, cfg)
        else:
            bins_w = None

        def inner(j, st):
            i = r * rb + j
            return jax.lax.cond(
                i < num_iters,
                lambda s: body(i, s, bins_w),
                lambda s: s,
                st,
            )

        if rb == 1:
            return body(r, state, bins_w)
        return jax.lax.fori_loop(0, rb, inner, state)

    init = (gmap, adam, store, pose_adam, jnp.asarray(jnp.inf, jnp.float32),
            jnp.zeros((), bool), jnp.zeros((), jnp.int32))
    gmap, adam, store, pose_adam, loss_val, ov_seen, pm_seen = jax.lax.fori_loop(
        0, n_rounds, round_body, init
    )
    return MapChunkResult(
        gmap=gmap, adam=adam, store=store, pose_adam=pose_adam,
        final_loss=loss_val, overflow=ov_seen, num_pairs=pm_seen,
    )


@partial(jax.jit, static_argnames=("intr", "cfg"))
def window_visibility(
    gmap: GaussianMap,
    store: KeyframeStore,
    window_slots: jax.Array,
    window_valid: jax.Array,
    intr: Intrinsics,
    cfg: MappingConfig = MappingConfig(),
) -> jax.Array:
    """(Vw, capacity) bool — n_touched > 0 per window view at current
    poses (occ_aware_visibility, reference slam_backend.py:665-668)."""
    proj = intr.proj()
    raster = cfg.raster._replace(with_n_touched=True)
    cfg_nt = cfg._replace(raster=raster)
    out = _render_views(gmap, store.T_cw[window_slots], proj, intr, cfg_nt)
    return (out.n_touched > 0) & window_valid[:, None]


@partial(jax.jit, static_argnames=("intr", "cfg"))
def render_keyframe(
    gmap: GaussianMap,
    store: KeyframeStore,
    slot: jax.Array,
    intr: Intrinsics,
    cfg: MappingConfig = MappingConfig(),
):
    """Convenience render of one stored keyframe at its current pose."""
    raster = cfg.raster._replace(with_n_touched=True)
    return _render_view(
        gmap, store.T_cw[slot], intr.proj(), intr, cfg._replace(raster=raster)
    )
