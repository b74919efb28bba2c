"""Dynamic (4D) mapping: deformation-aware map optimization with flow
supervision.

Extends the static `map_chunk` with the reference's dynamic_network path
(utils/slam_backend.py:306-774, dynamic branches):

  - each view render deforms the dynamic Gaussians (dygs) through the
    control-node warp at the view's timestamp,
  - bidirectional scene-flow losses against precomputed optical flow
    (RAFT/GMA or exact synthetic flow) between each window view and its
    closest earlier keyframe (render_flow x2, :471-503), masked to
    dynamic pixels and weighted by `flow_loss` (config),
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
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

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
from fourdgs.ops.rasterize import rasterize, render_flow
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


def _deformed_render(gmap: GaussianMap, cn: ControlNodes, T_cw, t, proj,
                     intr: Intrinsics, cfg: MappingConfig, mean2d_offset=None):
    """Render with the control-node warp applied to dynamic Gaussians."""
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


class DynChunkResult(NamedTuple):
    gmap: GaussianMap
    adam: AdamState
    store: KeyframeStore
    pose_adam: PoseAdam
    deform: ControlNodes
    deform_adam: DeformAdam
    final_loss: jax.Array


@partial(jax.jit, static_argnames=("intr", "cfg", "flow_weight",
                                   "flow_weight_fine", "time_interval"))
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
) -> DynChunkResult:
    proj = intr.proj()
    vw = cfg.num_window_views
    vr = cfg.num_random_views
    cap = gmap.capacity
    pose_lr = jnp.concatenate(
        [jnp.full((3,), cfg.lr_trans), jnp.full((3,), cfg.lr_rot), jnp.full((2,), cfg.lr_exposure)]
    )

    cn_valid = cn.valid

    def body(i, state):
        gmap, adam, store, pose_adam, cn_f, deform_adam, _ = state
        ki = jax.random.fold_in(key, i)
        size = jnp.maximum(rand_pool_size, 1)
        r1 = jax.random.randint(ki, (), 0, size)
        r2 = jax.random.randint(jax.random.fold_in(ki, 1), (), 0, jnp.maximum(size - 1, 1))
        r2 = jnp.where(r2 >= r1, r2 + 1, r2) % size
        rand_slots = jnp.stack([rand_pool[r1], rand_pool[r2]])
        rand_valid = jnp.arange(vr) < jnp.minimum(rand_pool_size, vr)
        slots = jnp.concatenate([window_slots, rand_slots])
        valids = jnp.concatenate([window_valid, rand_valid])
        # mapping phase switch (reference slam_backend.py:349-356): the
        # first half of the phase runs dynamic=True (x2 dynamic-pixel
        # upweight) with flow_loss; the second half dynamic=False with
        # flow_loss_fine (falling back to flow_loss when absent)
        dynamic_phase, flow_w = phase_weights(
            i, num_iters, flow_weight, flow_weight_fine
        )

        def loss_fn(params, cn_fp, dtaus, dexps, taps):
            cn_p = cn_merge(cn_fp, cn_valid)
            g = gmap._replace(params=params)
            # stacked per-view inputs so the view loop is a lax.scan
            # (compile-time: the reference window is 8+2 views; unrolling
            # trebles the graph with the flow renders)
            pair_slots_all = jnp.concatenate(
                [flow_pair_slots, jnp.full((vr,), -1, jnp.int32)]
            )
            flow_fwd_all = jnp.concatenate(
                [flow_fwd, jnp.zeros((vr,) + flow_fwd.shape[1:])], axis=0
            )
            flow_bwd_all = jnp.concatenate(
                [flow_bwd, jnp.zeros((vr,) + flow_bwd.shape[1:])], axis=0
            )
            reg_w_all = jnp.concatenate(
                [jnp.full((vw,), 1e-3), jnp.full((vr,), 1e-4)]
            )

            def view_loss(carry, inp):
                v, = inp
                slot = slots[v]
                T_v = se3_exp(dtaus[v]) @ store.T_cw[slot]
                exp_ab = store.exposure[slot] + dexps[v]
                image_gt = store.images_u8[slot].astype(jnp.float32) / 255.0
                depth_gt = store.depths[slot]
                motion = store.motion[slot]
                t_v = store.times[slot]
                out, (d_xyz, d_rot, d_scale) = _deformed_render(
                    g, cn_p, T_v, t_v, proj, intr, cfg, mean2d_offset=taps[v]
                )
                image_ab = apply_exposure(out.color, exp_ab[0], exp_ab[1])
                l = mapping_loss_rgbd(
                    image_ab, out.depth, image_gt, depth_gt,
                    motion_mask=motion, alpha=cfg.alpha,
                    rgb_boundary_threshold=cfg.rgb_boundary_threshold,
                    rm_dynamic=False,
                    dynamic=dynamic_phase,
                )
                total_v = jnp.where(valids[v], l, 0.0)
                radii_ok = (out.radii > 0) & valids[v]

                # bidirectional flow loss vs the closest earlier keyframe
                # (random views carry pair = -1 and contribute 0)
                pair = pair_slots_all[v]
                has_pair = pair >= 0
                pair_c = jnp.maximum(pair, 0)
                T_p = store.T_cw[pair_c]
                t_p = store.times[pair_c]
                d2_xyz, d2_rot, d2_scale = warp(
                    cn_p, jax.lax.stop_gradient(g.params.xyz), t_p,
                    motion_mask=g.dygs,
                )
                kwargs = dict(
                    fx=intr.fx, fy=intr.fy, width=intr.width,
                    height=intr.height, tan_fovx=intr.tan_fovx,
                    tan_fovy=intr.tan_fovy, config=cfg.raster,
                )
                f12 = render_flow(
                    g.params.xyz, g.get_scaling, g.get_rotation,
                    g.get_opacity, g.dygs, g.alive,
                    d_xyz, d2_xyz, d_rot, d_scale,
                    T_v, T_p, proj, **kwargs,
                )
                l_b = masked_flow_l1(f12.color[:2], flow_bwd_all[v], ~motion)
                f21 = render_flow(
                    g.params.xyz, g.get_scaling, g.get_rotation,
                    g.get_opacity, g.dygs, g.alive,
                    d2_xyz, d_xyz, d2_rot, d2_scale,
                    T_p, T_v, proj, **kwargs,
                )
                l_f = masked_flow_l1(f21.color[:2], flow_fwd_all[v], ~store.motion[pair_c])
                total_v = total_v + jnp.where(
                    valids[v] & has_pair, flow_w * (l_b + l_f), 0.0
                )

                ka = jax.random.fold_in(ki, 100 + v)
                total_v = total_v + jnp.where(
                    valids[v],
                    reg_w_all[v]
                    * arap_loss(cn_p, ka, t_v, 5 * time_interval, t_samp_num=2)
                    + reg_w_all[v]
                    * elastic_loss(cn_p, jax.random.fold_in(ka, 1), t_v, 5 * time_interval),
                    0.0,
                )
                return carry + total_v, radii_ok

            total, radii_oks = jax.lax.scan(
                view_loss, 0.0, (jnp.arange(vw + vr),)
            )
            total = total + cfg.isotropic_weight * isotropic_loss(
                jnp.exp(params.scaling), g.alive
            )
            return total, radii_oks

        taps = jnp.zeros((vw + vr, cap, 2))
        dtaus = jnp.zeros((vw + vr, 6))
        dexps = jnp.zeros((vw + vr, 2))
        (loss_val, radii_oks), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True
        )(gmap.params, cn_f, dtaus, dexps, taps)
        g_params, g_cn, g_taus, g_exps, g_taps = grads

        norms = jnp.linalg.norm(g_taps, axis=-1)
        upd = radii_oks.astype(jnp.float32)
        gmap = gmap._replace(
            grad_accum=gmap.grad_accum + jnp.sum(norms * upd, axis=0),
            denom=gmap.denom + jnp.sum(upd, axis=0),
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
            gmap, adam = operand
            p2, a2 = adam_step(gmap.params, g_params, adam, cfg.lrs, gmap.alive,
                               xyz_lr_mult=xyz_lr_mult)
            return gmap._replace(params=p2), a2

        gmap, adam = jax.lax.cond(i > step_after, do_step, lambda o: o, (gmap, adam))

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

        return (gmap, adam, store, pose_adam, cn_f, deform_adam, loss_val)

    init = (gmap, adam, store, pose_adam, cn_floats(cn), deform_adam,
            jnp.asarray(jnp.inf, jnp.float32))
    gmap, adam, store, pose_adam, cn_f, deform_adam, loss_val = jax.lax.fori_loop(
        0, num_iters, body, init
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
