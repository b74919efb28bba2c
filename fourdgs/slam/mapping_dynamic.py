"""Dynamic (4D) mapping: deformation-aware map optimization with flow
supervision.

Extends the static `map_chunk` with the reference's dynamic_network path
(utils/slam_backend.py:306-774, dynamic branches):

  - each view render deforms the dynamic Gaussians (dygs) through the
    control-node warp at the view's timestamp,
  - bidirectional scene-flow losses against precomputed optical flow
    (RAFT/GMA or exact synthetic flow) between each window view and its
    closest earlier keyframe (render_flow x2, :471-503), masked to
    dynamic pixels and weighted by `flow_loss` / `flow_loss_fine` per
    the half-phase switch (:349-356),
  - ARAP (1e-3) and elastic (1e-3) regularizers per window view and
    (1e-4) per random view (:517-519, :645-648, :763),
  - a dedicated Adam for the deformation parameters (MLP + nodes, LR
    0.0008 = position_lr_init x spatial_lr_scale(5), eps 1e-15 —
    deform_model.py:36-49); the reference's split
    loss_mapping.backward(retain_graph) + loss_network.backward() is a
    single grad of the summed loss here (the partitions coincide because
    flow renders detach the Gaussian base parameters),
  - `warmup_network` reproduces initialize_network
    (slam_backend.py:160-236): deform-only optimization of the dystart
    keyframe with the network loss.

TPU-first structure (vs the reference's 26 sequential CUDA launches per
iteration): ALL renders of an iteration — the window+replay RGB-D views
AND both flow renders of every window view — are ONE batched
`rasterize_multi` launch over a (nv + 2*vw)-view set with per-view
deformed geometry, per-view cameras and per-view payloads (RGB for main
views, NDC scene-flow for flow views). Window/flow-view tile binning is
reused across `rebin_every` iterations like the static path (replay
views re-bin every iteration), and with `mesh=` the view set is sharded
over the mesh's first axis with parameter/deform gradients psum'd — the
multi-chip extension the reference cannot express.
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
from fourdgs.models.deform import (
    ControlNodeFloats,
    ControlNodes,
    arap_loss,
    cn_floats,
    cn_merge,
    elastic_loss,
    warp,
)
from fourdgs.models.gaussian_map import AdamState, GaussianMap, adam_step
from fourdgs.ops.rasterize import rasterize
from fourdgs.ops.rasterize.api import (
    compute_bins_multi,
    ndc_project,
    rasterize_multi,
)
from fourdgs.slam.camera import Intrinsics
from fourdgs.slam.keyframes import KeyframeStore
from fourdgs.slam.losses import (
    apply_exposure,
    isotropic_loss,
    mapping_loss_rgbd,
    masked_flow_l1,
    network_loss_rgbd,
)
from fourdgs.slam.mapping import MappingConfig, PoseAdam

# per-view kinds in the batched render set
KIND_MAIN = 0    # RGB-D mapping view (window or replay)
KIND_FLOW_B = 1  # flow render at the view camera/time   (loss vs flow_bwd)
KIND_FLOW_F = 2  # flow render at the pair camera/time   (loss vs flow_fwd)


class DeformAdam(NamedTuple):
    mu: ControlNodeFloats
    nu: ControlNodeFloats
    count: jax.Array


def init_deform_adam(cn: ControlNodes) -> DeformAdam:
    z = jax.tree.map(jnp.zeros_like, cn_floats(cn))
    return DeformAdam(mu=z, nu=z, count=jnp.zeros((), jnp.int32))


def deform_adam_step(cn_f: ControlNodeFloats, grads: ControlNodeFloats,
                     state: DeformAdam, lr: float = 8e-4,
                     b1=0.9, b2=0.999, eps=1e-15):
    count = state.count + 1
    t = count.astype(jnp.float32)

    def upd(p, g, mu, nu):
        mu2 = b1 * mu + (1 - b1) * g
        nu2 = b2 * nu + (1 - b2) * g * g
        step = lr * (mu2 / (1 - b1**t)) / (jnp.sqrt(nu2 / (1 - b2**t)) + eps)
        return p - step, mu2, nu2

    out = jax.tree.map(upd, cn_f, grads, state.mu, state.nu)
    leaves, treedef = jax.tree.flatten(out, is_leaf=lambda x: isinstance(x, tuple) and len(x) == 3 and not hasattr(x, "_fields"))
    new_p = jax.tree.unflatten(treedef, [l[0] for l in leaves])
    new_mu = jax.tree.unflatten(treedef, [l[1] for l in leaves])
    new_nu = jax.tree.unflatten(treedef, [l[2] for l in leaves])
    return new_p, DeformAdam(mu=new_mu, nu=new_nu, count=count)


def phase_weights(i, num_iters, flow_weight: float,
                  flow_weight_fine: float | None):
    """Per-iteration mapping phase switch (reference
    slam_backend.py:349-356): the first half of the phase (i < iters/2)
    runs dynamic=True with flow_loss; the second half dynamic=False with
    flow_loss_fine (falling back to flow_loss when the config lacks it).
    Returns (dynamic: bool array, flow_w: float array); both may be
    traced (used inside the chunk fori_loop). Pinned against the literal
    reference conditions in tests/test_mapping_dynamic.py."""
    dynamic = i * 2 < num_iters      # i < iters/2 with integer arithmetic
    fine = flow_weight if flow_weight_fine is None else flow_weight_fine
    flow_w = jnp.where(dynamic, flow_weight, fine)
    return dynamic, flow_w


def _deformed_render(gmap: GaussianMap, cn: ControlNodes, T_cw, t, proj,
                     intr: Intrinsics, cfg: MappingConfig, mean2d_offset=None):
    """Single deformed render (eval / warmup path)."""
    d_xyz, d_rot, d_scale = warp(
        cn, jax.lax.stop_gradient(gmap.params.xyz), t,
        motion_mask=gmap.dygs,
    )
    out = rasterize(
        gmap.params.xyz + d_xyz,
        gmap.get_scaling + d_scale,
        gmap.get_rotation + d_rot,
        gmap.get_opacity,
        gmap.get_color,
        gmap.alive,
        T_cw, proj, jnp.zeros(3),
        fx=intr.fx, fy=intr.fy, width=intr.width, height=intr.height,
        tan_fovx=intr.tan_fovx, tan_fovy=intr.tan_fovy,
        mean2d_offset=mean2d_offset,
        config=cfg.raster,
    )
    return out, (d_xyz, d_rot, d_scale)


def _dyn_view_geometry(params, cn_p, gmap: GaussianMap, store: KeyframeStore,
                       slots, pair_slots_all, dtaus, vw: int, nv: int):
    """Per-view geometry/payload/camera arrays for the batched render
    set: [nv main views | vw flow-bwd views | vw flow-fwd views].

    Main views carry live map parameters + deformation at the view time;
    flow views detach the base parameters (reference render_flow,
    gaussian_renderer/__init__.py:229-361) and carry the NDC scene-flow
    payload with the dygs flag in z."""
    from fourdgs.geometry.quaternion import quat_normalize
    from fourdgs.geometry.sh import sh0_to_rgb

    sg = jax.lax.stop_gradient
    xyz = params.xyz
    scales = jnp.exp(params.scaling)
    quats = quat_normalize(params.rotation)
    opac = jax.nn.sigmoid(params.opacity)[:, 0]
    colors = sh0_to_rgb(params.f_dc)

    t_views = store.times[slots]                         # (nv,)
    pair_c = jnp.maximum(pair_slots_all[:vw], 0)         # (vw,)
    t_pairs = store.times[pair_c]                        # (vw,)
    times = jnp.concatenate([t_views, t_pairs])          # (nv+vw,)

    # deformation at every distinct view/pair time (vmapped warp)
    d_xyz, d_rot, d_scale = jax.vmap(
        lambda t: warp(cn_p, sg(xyz), t, motion_mask=gmap.dygs)
    )(times)                                             # (nv+vw, N, .)

    T_views = jax.vmap(lambda tau, slot: se3_exp(tau) @ store.T_cw[slot])(
        dtaus, slots
    )                                                    # (nv, 4, 4)
    T_pairs = store.T_cw[pair_c]                         # (vw, 4, 4)

    # main views: live params + deform at view time
    m_means = xyz[None] + d_xyz[:nv]
    m_scales = scales[None] + d_scale[:nv]
    m_quats = quats[None] + d_rot[:nv]
    m_opac = jnp.broadcast_to(opac[None], (nv, opac.shape[0]))
    m_colors = jnp.broadcast_to(colors[None], (nv,) + colors.shape)

    # flow views (window views only): detached base + deform
    x1 = sg(xyz)[None] + d_xyz[:vw]                      # (vw, N, 3) at t_v
    x2 = sg(xyz)[None] + d_xyz[nv:]                      # (vw, N, 3) at t_p
    f_scales1 = sg(scales)[None] + d_scale[:vw]
    f_quats1 = sg(quats)[None] + d_rot[:vw]
    f_scales2 = sg(scales)[None] + d_scale[nv:]
    f_quats2 = sg(quats)[None] + d_rot[nv:]
    f_opac = jnp.broadcast_to(sg(opac)[None], (vw, opac.shape[0]))

    return dict(
        times=times, T_views=T_views, T_pairs=T_pairs,
        m_means=m_means, m_scales=m_scales, m_quats=m_quats,
        m_opac=m_opac, m_colors=m_colors,
        x1=x1, x2=x2, f_scales1=f_scales1, f_quats1=f_quats1,
        f_scales2=f_scales2, f_quats2=f_quats2, f_opac=f_opac,
    )


class DynChunkResult(NamedTuple):
    gmap: GaussianMap
    adam: AdamState
    store: KeyframeStore
    pose_adam: PoseAdam
    deform: ControlNodes
    deform_adam: DeformAdam
    final_loss: jax.Array


@partial(jax.jit, static_argnames=("intr", "cfg", "flow_weight",
                                   "flow_weight_fine", "time_interval",
                                   "mesh"))
def map_chunk_dynamic(
    gmap: GaussianMap,
    adam: AdamState,
    store: KeyframeStore,
    cn: ControlNodes,
    deform_adam: DeformAdam,
    window_slots: jax.Array,     # (Vw,)
    window_valid: jax.Array,
    opt_pose: jax.Array,
    flow_pair_slots: jax.Array,  # (Vw,) closest earlier keyframe slot (-1: none)
    flow_fwd: jax.Array,         # (Vw, 2, H, W) normalized flow pair->view
    flow_bwd: jax.Array,         # (Vw, 2, H, W) normalized flow view->pair
    rand_pool: jax.Array,
    rand_pool_size: jax.Array,
    pose_adam: PoseAdam,
    key: jax.Array,
    num_iters: jax.Array,
    step_after: jax.Array,
    iter_base: jax.Array,   # () int32 — global iteration_count at chunk start
    intr: Intrinsics,
    cfg: MappingConfig = MappingConfig(),
    flow_weight: float = 3.0,
    flow_weight_fine: float | None = None,
    time_interval: float = 1.0 / 100,
    mesh: jax.sharding.Mesh | None = None,
) -> DynChunkResult:
    proj = intr.proj()
    vw = cfg.num_window_views
    vr = cfg.num_random_views
    cap = gmap.capacity
    nv = vw + vr
    vt = nv + 2 * vw             # total batched render views
    pose_lr = jnp.concatenate(
        [jnp.full((3,), cfg.lr_trans), jnp.full((3,), cfg.lr_rot), jnp.full((2,), cfg.lr_exposure)]
    )

    cn_valid = cn.valid
    kw = dict(
        fx=intr.fx, fy=intr.fy, width=intr.width, height=intr.height,
        tan_fovx=intr.tan_fovx, tan_fovy=intr.tan_fovy,
    )
    has_pair = flow_pair_slots >= 0                      # (vw,)
    pair_c = jnp.maximum(flow_pair_slots, 0)
    reg_w = jnp.concatenate([jnp.full((vw,), 1e-3), jnp.full((vr,), 1e-4)])

    def assemble_views(params, cn_fp, dtaus, slots, store):
        """(vt, ...) per-view geometry/camera/payload arrays (store is
        the CARRIED keyframe store — poses move within the chunk)."""
        cn_p = cn_merge(cn_fp, cn_valid)
        geo = _dyn_view_geometry(
            params, cn_p, gmap, store, slots, flow_pair_slots, dtaus, vw, nv
        )
        # flow payloads: NDC displacement + dygs flag in z
        dy = gmap.dygs.astype(jnp.float32)[:, None]

        def flows(x1v, x2v, Tv, Tp):
            f = ndc_project(x2v, proj @ Tp) - ndc_project(x1v, proj @ Tv)
            return jnp.concatenate([f[:, :2], dy], axis=1)

        flow12 = jax.vmap(flows)(
            geo["x1"], geo["x2"], geo["T_views"][:vw], geo["T_pairs"]
        )                                                # (vw, N, 3)
        payload21 = jnp.concatenate([-flow12[:, :, :2],
                                     jnp.broadcast_to(dy[None], (vw,) + dy.shape)],
                                    axis=2)
        means = jnp.concatenate([geo["m_means"], geo["x1"], geo["x2"]])
        scales = jnp.concatenate(
            [geo["m_scales"], geo["f_scales1"], geo["f_scales2"]]
        )
        quats = jnp.concatenate(
            [geo["m_quats"], geo["f_quats1"], geo["f_quats2"]]
        )
        opacs = jnp.concatenate([geo["m_opac"], geo["f_opac"], geo["f_opac"]])
        colors = jnp.concatenate([geo["m_colors"], flow12, payload21])
        T_all = jnp.concatenate(
            [geo["T_views"], geo["T_views"][:vw], geo["T_pairs"]]
        )
        return means, scales, quats, opacs, colors, T_all, cn_p

    def view_losses(out_color, out_depth, out_radii, slots, valids,
                    dexps, dynamic_phase, flow_w, store):
        """Per-view losses from the batched render outputs."""
        # main RGB-D mapping views
        exp_abs = store.exposure[slots] + dexps[:nv]
        images_gt = store.images_u8[slots].astype(jnp.float32) / 255.0
        depths_gt = store.depths[slots]
        motions = store.motion[slots]
        images_ab = jax.vmap(apply_exposure)(
            out_color[:nv], exp_abs[:, 0], exp_abs[:, 1]
        )
        main_l = jax.vmap(
            lambda ia, ig, d, dg, m: mapping_loss_rgbd(
                ia, d, ig, dg, motion_mask=m, alpha=cfg.alpha,
                rgb_boundary_threshold=cfg.rgb_boundary_threshold,
                rm_dynamic=False, dynamic=dynamic_phase,
            )
        )(images_ab, images_gt, out_depth[:nv], depths_gt, motions)
        total = jnp.sum(jnp.where(valids, main_l, 0.0))

        # flow views: bwd at the view camera, fwd at the pair camera
        fb = jax.vmap(masked_flow_l1)(
            out_color[nv:nv + vw, :2], flow_bwd, ~motions[:vw]
        )
        ff = jax.vmap(masked_flow_l1)(
            out_color[nv + vw:, :2], flow_fwd, ~store.motion[pair_c]
        )
        fmask = valids[:vw] & has_pair
        total = total + jnp.sum(
            jnp.where(fmask, flow_w * (fb + ff), 0.0)
        )
        radii_oks = (out_radii[:nv] > 0) & valids[:, None]
        return total, radii_oks

    def body(i, state, bins_w):
        gmap_s, adam, store, pose_adam, cn_f, deform_adam, _ = state
        ki = jax.random.fold_in(key, i)
        size = jnp.maximum(rand_pool_size, 1)
        r1 = jax.random.randint(ki, (), 0, size)
        r2 = jax.random.randint(jax.random.fold_in(ki, 1), (), 0, jnp.maximum(size - 1, 1))
        r2 = jnp.where(r2 >= r1, r2 + 1, r2) % size
        rand_slots = jnp.stack([rand_pool[r1], rand_pool[r2]])[:vr]
        rand_valid = jnp.arange(vr) < jnp.minimum(rand_pool_size, vr)
        slots = jnp.concatenate([window_slots, rand_slots])
        valids = jnp.concatenate([window_valid, rand_valid])
        # mapping phase switch (reference slam_backend.py:349-356)
        dynamic_phase, flow_w = phase_weights(
            i, num_iters, flow_weight, flow_weight_fine
        )

        taps = jnp.zeros((vt, cap, 2))
        dtaus = jnp.zeros((nv, 6))
        dexps = jnp.zeros((nv, 2))

        def loss_fn(params, cn_fp, dtaus, dexps, taps):
            means, scales, quats, opacs, colors, T_all, cn_p = assemble_views(
                params, cn_fp, dtaus, slots, store
            )
            bins = None
            if bins_w is not None:
                # replay-view bins fresh each iteration; splice into the
                # fixed-view bins at positions [vw:nv)
                rep_bins = compute_bins_multi(
                    jax.lax.stop_gradient(means[vw:nv]),
                    jax.lax.stop_gradient(scales[vw:nv]),
                    jax.lax.stop_gradient(quats[vw:nv]),
                    gmap_s.alive, jax.lax.stop_gradient(T_all[vw:nv]), proj,
                    jax.lax.stop_gradient(opacs[vw:nv]),
                    config=cfg.raster, **kw,
                )
                bins = jax.tree.map(
                    lambda f, r: jnp.concatenate([f[:vw], r, f[vw:]]),
                    bins_w, rep_bins,
                )
            out = rasterize_multi(
                means, scales, quats, opacs, colors, gmap_s.alive,
                T_all, proj, jnp.zeros(3),
                mean2d_offsets=taps, config=cfg.raster, bins=bins, **kw,
            )
            total, radii_oks = view_losses(
                out.color, out.depth, out.radii, slots, valids, dexps,
                dynamic_phase, flow_w, store,
            )

            # ARAP + elastic regularizers per view (reference :517-519,
            # :645-648): window views weight 1e-3, replay views 1e-4
            t_views = store.times[slots]
            ka = jax.random.fold_in(ki, 100)
            regs = jax.vmap(
                lambda v, t: arap_loss(
                    cn_p, jax.random.fold_in(ka, v), t,
                    5 * time_interval, t_samp_num=2,
                ) + elastic_loss(
                    cn_p, jax.random.fold_in(jax.random.fold_in(ka, v), 1),
                    t, 5 * time_interval,
                )
            )(jnp.arange(nv), t_views)
            total = total + jnp.sum(jnp.where(valids, reg_w * regs, 0.0))

            total = total + cfg.isotropic_weight * isotropic_loss(
                jnp.exp(params.scaling), gmap_s.alive
            )
            return total, radii_oks

        if mesh is None:
            (loss_val, radii_oks), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True
            )(gmap_s.params, cn_f, dtaus, dexps, taps)
            g_params, g_cn, g_taus, g_exps, g_taps = grads
        else:
            # view-sharded gradient: each device renders/backprops a
            # slice of the (vt)-view set; param/deform grads psum over
            # the mesh axis, per-view grads stay sharded. The full view
            # set is materialized per device only as indices — geometry
            # assembly happens inside the shard on local views.
            ax = mesh.axis_names[0]
            ndev = int(np.prod(mesh.devices.shape))
            vtp = -(-vt // ndev) * ndev

            def shard_fn(view_ids_l, taps_l):
                def local_loss(params, cn_fp, dtaus_l, dexps_l, tp):
                    # assemble ONLY the local views: each global view id
                    # maps to (kind, window index) and needs at most two
                    # deform warps — materializing the full vt-view
                    # geometry per device (and backpropping through it)
                    # would replicate the deformation stage ndev times
                    from fourdgs.geometry.quaternion import quat_normalize
                    from fourdgs.geometry.sh import sh0_to_rgb

                    cn_p = cn_merge(cn_fp, cn_valid)
                    sgd = jax.lax.stop_gradient
                    xyz = params.xyz
                    scl = jnp.exp(params.scaling)
                    qts = quat_normalize(params.rotation)
                    opa = jax.nn.sigmoid(params.opacity)[:, 0]
                    rgb = sh0_to_rgb(params.f_dc)
                    dy = gmap_s.dygs.astype(jnp.float32)[:, None]
                    t_views = store.times[slots]
                    t_pairs = store.times[pair_c]

                    def one_view(v):
                        is_main = v < nv
                        is_fb = (v >= nv) & (v < nv + vw)
                        k_m = jnp.minimum(v, nv - 1)
                        k_f = jnp.clip(
                            jnp.where(is_fb, v - nv, v - nv - vw), 0, vw - 1
                        )
                        k_t = jnp.where(is_main, k_m, k_f)
                        t_a = t_views[k_t]
                        t_b = jnp.where(is_main, t_a, t_pairs[k_f])
                        da = warp(cn_p, sgd(xyz), t_a,
                                  motion_mask=gmap_s.dygs)
                        db = warp(cn_p, sgd(xyz), t_b,
                                  motion_mask=gmap_s.dygs)
                        T_v = se3_exp(dtaus_l[k_t]) @ store.T_cw[
                            slots[k_t]
                        ]
                        T_p = store.T_cw[pair_c[k_f]]
                        x1 = sgd(xyz) + da[0]
                        x2 = sgd(xyz) + db[0]
                        f = (ndc_project(x2, proj @ T_p)
                             - ndc_project(x1, proj @ T_v))
                        fsign = jnp.where(is_fb, 1.0, -1.0)
                        payload = jnp.concatenate(
                            [fsign * f[:, :2], dy], axis=1
                        )
                        mean = jnp.where(
                            is_main, xyz + da[0], jnp.where(is_fb, x1, x2)
                        )
                        scale = jnp.where(
                            is_main, scl + da[2],
                            jnp.where(is_fb, sgd(scl) + da[2],
                                      sgd(scl) + db[2]),
                        )
                        quat = jnp.where(
                            is_main, qts + da[1],
                            jnp.where(is_fb, sgd(qts) + da[1],
                                      sgd(qts) + db[1]),
                        )
                        opac_v = jnp.where(is_main, opa, sgd(opa))
                        color_v = jnp.where(is_main, rgb, payload)
                        T_r = jnp.where(is_main | is_fb, T_v, T_p)
                        return mean, scale, quat, opac_v, color_v, T_r

                    vids = jnp.minimum(view_ids_l, vt - 1)
                    ok = view_ids_l < vt
                    means, scales, quats, opacs, colors, T_all = jax.vmap(
                        one_view
                    )(vids)
                    out = rasterize_multi(
                        means, scales, quats, opacs, colors, gmap_s.alive,
                        T_all, proj, jnp.zeros(3),
                        mean2d_offsets=tp, config=cfg.raster, **kw,
                    )
                    # per-view losses on the local slice: rebuild the
                    # global loss as a masked sum over local views
                    l = _local_view_losses(
                        out, view_ids_l, ok, slots, valids, dexps_l,
                        dynamic_phase, flow_w,
                    )
                    return l, (out.radii > 0)

                (l, radii_l), gr = jax.value_and_grad(
                    local_loss, argnums=(0, 1, 2, 3, 4), has_aux=True
                )(gmap_s.params, cn_f, dtaus, dexps, taps_l)
                return (
                    jax.lax.psum(l, ax), radii_l,
                    jax.lax.psum(gr[0], ax), jax.lax.psum(gr[1], ax),
                    jax.lax.psum(gr[2], ax), jax.lax.psum(gr[3], ax),
                    gr[4],
                )

            def _local_view_losses(out, vids, ok, slots, valids, dexps_l,
                                   dynamic_phase, flow_w):
                def one(idx, col, dep):
                    is_main = idx < nv
                    midx = jnp.minimum(idx, nv - 1)
                    slot = slots[midx]
                    exp_ab = store.exposure[slot] + dexps_l[midx]
                    img_gt = store.images_u8[slot].astype(jnp.float32) / 255.0
                    dep_gt = store.depths[slot]
                    mot = store.motion[slot]
                    ia = apply_exposure(col, exp_ab[0], exp_ab[1])
                    lm = mapping_loss_rgbd(
                        ia, dep, img_gt, dep_gt, motion_mask=mot,
                        alpha=cfg.alpha,
                        rgb_boundary_threshold=cfg.rgb_boundary_threshold,
                        rm_dynamic=False, dynamic=dynamic_phase,
                    )
                    lm = jnp.where(valids[midx], lm, 0.0)
                    # flow views
                    fbi = jnp.clip(idx - nv, 0, vw - 1)
                    ffi = jnp.clip(idx - nv - vw, 0, vw - 1)
                    is_fb = (idx >= nv) & (idx < nv + vw)
                    fidx = jnp.where(is_fb, fbi, ffi)
                    tgt = jnp.where(
                        is_fb, flow_bwd[fidx], flow_fwd[fidx]
                    )
                    fmot = jnp.where(
                        is_fb, ~store.motion[slots[fidx]],
                        ~store.motion[pair_c[fidx]],
                    )
                    lf = masked_flow_l1(col[:2], tgt, fmot)
                    fok = valids[fidx] & has_pair[fidx]
                    lf = jnp.where(fok, flow_w * lf, 0.0)
                    return jnp.where(is_main, lm, lf)

                per = jax.vmap(one)(vids, out.color, out.depth)
                return jnp.sum(jnp.where(ok, per, 0.0))

            view_ids = jnp.arange(vtp, dtype=jnp.int32)
            taps_p = jnp.zeros((vtp, cap, 2))
            loss_views, radii_all, g_params, g_cn, g_taus, g_exps, g_taps_p = (
                shard_map(
                    shard_fn, mesh=mesh,
                    in_specs=(P(ax), P(ax)),
                    out_specs=(P(), P(ax), P(), P(), P(ax), P(ax), P(ax)),
                    check_vma=False,
                )(view_ids, taps_p)
            )
            # regularizers + isotropic on the replicated params
            def rep_loss(params, cn_fp):
                cn_p = cn_merge(cn_fp, cn_valid)
                t_views = store.times[slots]
                ka = jax.random.fold_in(ki, 100)
                regs = jax.vmap(
                    lambda v, t: arap_loss(
                        cn_p, jax.random.fold_in(ka, v), t,
                        5 * time_interval, t_samp_num=2,
                    ) + elastic_loss(
                        cn_p, jax.random.fold_in(jax.random.fold_in(ka, v), 1),
                        t, 5 * time_interval,
                    )
                )(jnp.arange(nv), t_views)
                return (
                    jnp.sum(jnp.where(valids, reg_w * regs, 0.0))
                    + cfg.isotropic_weight * isotropic_loss(
                        jnp.exp(params.scaling), gmap_s.alive
                    )
                )

            rl, rgrads = jax.value_and_grad(rep_loss, argnums=(0, 1))(
                gmap_s.params, cn_f
            )
            loss_val = loss_views + rl
            g_params = jax.tree.map(jnp.add, g_params, rgrads[0])
            g_cn = jax.tree.map(jnp.add, g_cn, rgrads[1])
            g_taps = g_taps_p[:vt]
            radii_oks = radii_all[:nv] & valids[:, None]

        norms = jnp.linalg.norm(g_taps[:nv], axis=-1)
        upd = radii_oks.astype(jnp.float32)
        gmap_s = gmap_s._replace(
            grad_accum=gmap_s.grad_accum + jnp.sum(norms * upd, axis=0),
            denom=gmap_s.denom + jnp.sum(upd, axis=0),
        )

        # xyz LR schedule at the global iteration count (reference
        # update_learning_rate, slam_backend.py:771)
        from fourdgs.models.gaussian_map import expon_lr

        adv = jnp.maximum(0, i - jnp.maximum(step_after + 1, 0))
        xyz_lr_mult = expon_lr(
            (iter_base + adv).astype(jnp.float32), 1.0, cfg.xyz_lr_ratio,
            max_steps=cfg.xyz_lr_max_steps,
        )

        def do_step(operand):
            gm, adam = operand
            p2, a2 = adam_step(gm.params, g_params, adam, cfg.lrs, gm.alive,
                               xyz_lr_mult=xyz_lr_mult)
            return gm._replace(params=p2), a2

        gmap_s, adam = jax.lax.cond(
            i > step_after, do_step, lambda o: o, (gmap_s, adam)
        )

        cn_f, deform_adam = deform_adam_step(cn_f, g_cn, deform_adam)

        # pose/exposure update (same as static map_chunk)
        gp = jnp.concatenate([g_taus[:vw], g_exps[:vw]], axis=1)
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
        step = pose_lr[None] * (mu / (1 - b1**t)) / (jnp.sqrt(nu / (1 - b2**t)) + eps)
        upd8 = -step * mask8
        taus = upd8[:, :6]
        new_T = jax.vmap(lambda tau, T: se3_exp(tau) @ T)(taus, store.T_cw[window_slots])
        new_exp = store.exposure[window_slots] + upd8[:, 6:8]
        store = store._replace(
            T_cw=store.T_cw.at[window_slots].set(new_T),
            exposure=store.exposure.at[window_slots].set(new_exp),
        )
        pose_adam = PoseAdam(mu=mu, nu=nu, count=count)

        return (gmap_s, adam, store, pose_adam, cn_f, deform_adam, loss_val)

    # Two-level loop (same structure as the static map_chunk): the OUTER
    # fori runs rounds of rebin_every iterations; bins for the fixed
    # window/flow views are computed unconditionally at the round top and
    # closed over by the inner fori — never loop-carried. Iterations past
    # num_iters in the final round take a cheap identity branch.
    reuse_bins = (
        mesh is None and not cfg.raster.use_oracle and cfg.rebin_every > 1
    )
    rb = max(cfg.rebin_every, 1) if reuse_bins else 1
    n_rounds = -(-num_iters // rb) if reuse_bins else num_iters

    def round_body(r, state):
        if reuse_bins:
            gmap_r, _, store_r, _, cn_fr, _, _ = state
            dtaus0 = jnp.zeros((nv, 6))
            slots0 = jnp.concatenate(
                [window_slots, jnp.broadcast_to(window_slots[:1], (vr,))]
            )
            m, sc, q, o, c, T_all, _ = assemble_views(
                jax.lax.stop_gradient(gmap_r.params), cn_fr, dtaus0, slots0,
                store_r,
            )
            sel = jnp.concatenate([jnp.arange(vw), jnp.arange(nv, vt)])
            bins_w = compute_bins_multi(
                m[sel], sc[sel], q[sel], gmap_r.alive, T_all[sel], proj,
                o[sel],
                config=cfg.raster, **kw,
            )
        else:
            bins_w = None

        def inner(j, st):
            i = r * rb + j
            return jax.lax.cond(
                i < num_iters,
                lambda ss: body(i, ss, bins_w),
                lambda ss: ss,
                st,
            )

        if rb == 1:
            return body(r, state, bins_w)
        return jax.lax.fori_loop(0, rb, inner, state)

    init = (gmap, adam, store, pose_adam, cn_floats(cn), deform_adam,
            jnp.asarray(jnp.inf, jnp.float32))
    gmap, adam, store, pose_adam, cn_f, deform_adam, loss_val = (
        jax.lax.fori_loop(0, n_rounds, round_body, init)
    )
    return DynChunkResult(
        gmap=gmap, adam=adam, store=store, pose_adam=pose_adam,
        deform=cn_merge(cn_f, cn_valid), deform_adam=deform_adam,
        final_loss=loss_val,
    )


@partial(jax.jit, static_argnames=("intr", "cfg"))
def warmup_network(
    gmap: GaussianMap,
    adam: AdamState,
    cn: ControlNodes,
    deform_adam: DeformAdam,
    store: KeyframeStore,
    slot: jax.Array,
    num_iters: jax.Array,
    key: jax.Array,
    intr: Intrinsics,
    cfg: MappingConfig = MappingConfig(),
):
    """Deform-MLP warmup on the dystart keyframe (initialize_network,
    reference slam_backend.py:160-236): network loss + map step."""
    proj = intr.proj()
    image_gt = store.images_u8[slot].astype(jnp.float32) / 255.0
    depth_gt = store.depths[slot]
    motion = store.motion[slot]
    t_kf = store.times[slot]
    T_kf = store.T_cw[slot]

    cn_valid = cn.valid

    def body(i, state):
        gmap, adam, cn_f, deform_adam, _ = state

        def loss_fn(params, cn_fp):
            cn_p = cn_merge(cn_fp, cn_valid)
            g = gmap._replace(params=params)
            out, _ = _deformed_render(g, cn_p, T_kf, t_kf, proj, intr, cfg)
            return network_loss_rgbd(
                out.color, out.depth, out.alpha, image_gt, depth_gt,
                motion_mask=motion, dynamic=True,
            )

        (loss_val), grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            gmap.params, cn_f
        )
        g_params, g_cn = grads
        p2, adam2 = adam_step(gmap.params, g_params, adam, cfg.lrs, gmap.alive)
        cn_f2, da2 = deform_adam_step(cn_f, g_cn, deform_adam)
        return (gmap._replace(params=p2), adam2, cn_f2, da2, loss_val)

    init = (gmap, adam, cn_floats(cn), deform_adam, jnp.asarray(jnp.inf, jnp.float32))
    gmap, adam, cn_f, deform_adam, loss_val = jax.lax.fori_loop(
        0, num_iters, body, init
    )
    return gmap, adam, cn_merge(cn_f, cn_valid), deform_adam, loss_val
