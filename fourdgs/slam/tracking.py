"""Camera tracking: pose-only optimization by differentiable rendering.

Re-design of the reference frontend tracking loop
(utils/slam_frontend.py:335-470) as ONE jitted program: a
`lax.while_loop` running up to `max_iters` render+grad+Adam steps with
the reference's early exit (|tau| < 1e-4 after retraction,
utils/pose_utils.py:80-97). Only the static Gaussians are rendered
(mask = ~dygs, reference slam_frontend.py:413) and the loss removes
dynamic pixels via the motion mask (rm_dynamic=True).

The optimized variables mirror the reference exactly: SE(3) delta
(rot lr 0.003 / trans lr 0.001 from config) retracted left-multiplicatively
each step with the Adam moments persisting across steps (the reference
zeroes the delta parameters but keeps optimizer state), plus exposure
affine a/b (lr 0.01).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fourdgs.geometry.se3 import se3_exp
from fourdgs.models.gaussian_map import GaussianMap
from fourdgs.ops.rasterize import RasterConfig, rasterize
from fourdgs.ops.rasterize.api import compute_bins
from fourdgs.slam.camera import Frame, Intrinsics
from fourdgs.slam.losses import apply_exposure, median_depth, tracking_loss_rgbd


class TrackingConfig(NamedTuple):
    max_iters: int = 100
    monocular: bool = False
    lr_rot: float = 0.003
    lr_trans: float = 0.001
    lr_exposure: float = 0.01
    alpha: float = 0.9
    rgb_boundary_threshold: float = 0.01
    converged_threshold: float = 1e-4
    # tile binning is recomputed every `rebin_every` iterations instead of
    # every render: per-iteration pose deltas (<1e-3) move screen means by
    # far less than a 16px tile, so assignments are stable between re-bins
    # (exact re-bin at the final render; 1 = reference behavior of
    # re-sorting every call)
    rebin_every: int = 8
    # safeguard on the stale-binning assumption: if the previous applied
    # pose step exceeds this SE(3) norm (roughly a tile's worth of screen
    # motion at typical depth/focal: 16px/535 ~ 0.03 rad / 0.06 m), the
    # next iteration re-bins immediately instead of waiting for the
    # cadence (early iterations on fast motion can move > a tile)
    rebin_delta_threshold: float = 0.01
    raster: RasterConfig = RasterConfig()


class TrackResult(NamedTuple):
    T_cw: jax.Array        # (4, 4) refined pose
    exposure: jax.Array    # (2,) [a, b]
    n_iters: jax.Array     # () int32
    final_loss: jax.Array  # ()
    median_depth: jax.Array
    visibility: jax.Array  # (C,) bool — n_touched > 0 at the final pose
    opacity: jax.Array     # (H, W) final rendered opacity
    depth: jax.Array       # (H, W) final rendered depth
    overflow: jax.Array    # () bool — any render overflowed its pair buffer
    num_pairs: jax.Array   # () int32 — max binned pairs seen this frame


def _adam_update(g, mu, nu, count, lr, b1=0.9, b2=0.999, eps=1e-8):
    mu = b1 * mu + (1 - b1) * g
    nu = b2 * nu + (1 - b2) * g * g
    t = count.astype(jnp.float32)
    mhat = mu / (1 - b1**t)
    vhat = nu / (1 - b2**t)
    return lr * mhat / (jnp.sqrt(vhat) + eps), mu, nu


@partial(jax.jit, static_argnames=("intr", "config", "use_motion_mask"))
def track_frame(
    gmap: GaussianMap,
    frame: Frame,
    T_init: jax.Array,
    exposure_init: jax.Array,
    intr: Intrinsics,
    config: TrackingConfig = TrackingConfig(),
    use_motion_mask: bool = True,
) -> TrackResult:
    """Optimize the frame pose against the static map."""
    static_alive = gmap.alive & ~gmap.dygs
    colors = gmap.get_color
    scales = gmap.get_scaling
    quats = gmap.get_rotation
    opac = gmap.get_opacity
    xyz = gmap.params.xyz
    proj = intr.proj()
    bg = jnp.zeros(3)
    lr = jnp.concatenate(
        [
            jnp.full((3,), config.lr_trans),
            jnp.full((3,), config.lr_rot),
            jnp.full((2,), config.lr_exposure),
        ]
    )

    def render_at(T_cw, bins=None):
        return rasterize(
            xyz, scales, quats, opac, colors, static_alive, T_cw, proj, bg,
            fx=intr.fx, fy=intr.fy, width=intr.width, height=intr.height,
            tan_fovx=intr.tan_fovx, tan_fovy=intr.tan_fovy,
            config=config.raster,
            bins=bins,
        )

    def bins_at(T_cw):
        return compute_bins(
            xyz, scales, quats, static_alive, T_cw, proj, opac,
            fx=intr.fx, fy=intr.fy, width=intr.width, height=intr.height,
            tan_fovx=intr.tan_fovx, tan_fovy=intr.tan_fovy,
            config=config.raster,
        )

    def loss_fn(delta, T_cw, bins):
        # delta = [trans(3), rot(3), exposure_a, exposure_b]
        tau = jnp.concatenate([delta[:3], delta[3:6]])
        T = se3_exp(tau) @ T_cw
        out = render_at(T, bins=bins)
        image_ab = apply_exposure(out.color, delta[6], delta[7])
        motion = frame.motion_mask if use_motion_mask else None
        # the reference skips the motion mask on frame 0 (uid > 0 check)
        if config.monocular:
            # rgb-only tracking (reference get_loss_tracking_rgb,
            # utils/slam_utils.py:66-106)
            rgb_mask = (
                (jnp.sum(frame.image, axis=0) > config.rgb_boundary_threshold)
                & frame.grad_mask
            )
            if motion is not None:
                rgb_mask = rgb_mask & motion
            loss = jnp.mean(
                out.alpha[None]
                * jnp.abs((image_ab - frame.image) * rgb_mask.astype(jnp.float32)[None])
            )
        else:
            loss = tracking_loss_rgbd(
                image_ab, out.depth, out.alpha, frame.image, frame.depth,
                frame.grad_mask,
                motion_mask=motion,
                alpha=config.alpha,
                rgb_boundary_threshold=config.rgb_boundary_threshold,
            )
        return loss, out

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    # Two-level loop: the OUTER while_loop runs one "round" of
    # rebin_every iterations; tile binning is computed unconditionally at
    # round start and closed over by the inner fori_loop — it is NOT
    # loop-carried state, so no per-iteration lax.cond copies of the
    # multi-MB bins arrays (measured ~1 ms/iteration as carried state).
    # Convergence still exits at iteration granularity: converged
    # iterations inside a round take the identity branch (at most
    # rebin_every-1 cheap copies per frame, once). The large-step re-bin
    # safeguard (rebin_delta_threshold) acts at round granularity.
    rb = max(config.rebin_every, 1)

    def iter_body(T_cw, exp_ab, mu, nu, count, bins):
        delta0 = jnp.concatenate([jnp.zeros(6), exp_ab])
        (loss_val, _), g = grad_fn(delta0, T_cw, bins)
        count = count + 1
        step, mu, nu = _adam_update(g, mu, nu, count, lr)
        upd = -step
        tau = jnp.concatenate([upd[:3], upd[3:6]])
        T_new = se3_exp(tau) @ T_cw
        exp_new = exp_ab + upd[6:8]
        tau_norm = jnp.linalg.norm(tau)
        converged = tau_norm < config.converged_threshold
        # large applied step: cut the round short so the next round
        # re-bins immediately (rebin_delta_threshold safeguard)
        stale = tau_norm > config.rebin_delta_threshold
        return (T_new, exp_new, mu, nu, count, converged, loss_val, stale)

    def round_body(state):
        core = state[:7] + (jnp.asarray(False),)   # fresh bins: not stale
        ov_seen, pm_seen = state[8], state[9]
        # (the oracle compositor has no binning stage)
        if config.raster.use_oracle:
            bins = None
        else:
            bins = bins_at(state[0])
            ov_seen = ov_seen | bins.overflow
            pm_seen = jnp.maximum(
                pm_seen, jnp.maximum(bins.num_pairs, bins.aligned_slots)
            )

        def inner(j, st):
            return jax.lax.cond(
                (~st[5]) & (~st[7]) & (st[4] < config.max_iters),
                lambda s: iter_body(s[0], s[1], s[2], s[3], s[4], bins),
                lambda s: s,
                st,
            )

        return jax.lax.fori_loop(0, rb, inner, core) + (ov_seen, pm_seen)

    def live(state):
        return (state[4] < config.max_iters) & ~state[5]

    init = (
        T_init,
        exposure_init,
        jnp.zeros(8),
        jnp.zeros(8),
        jnp.zeros((), jnp.int32),
        jnp.asarray(False),
        jnp.asarray(jnp.inf, jnp.float32),
        jnp.asarray(False),
        jnp.zeros((), bool),
        jnp.zeros((), jnp.int32),
    )
    # STATIC trip count (ceil(max_iters/rb) rounds), converged rounds
    # skipped by lax.cond — the identical round/inner structure the
    # mapping loop uses (mapping.py:505-527). A dynamic
    # lax.while_loop here compiled fine but KERNEL-FAULTED the chip at
    # pair buckets >= 2^18 (c_max 2048) while the same kernels inside a
    # fori_loop run clean at the same shapes (r4 bench fault, bisected
    # round 5 — scripts/bisect_track.py / bisect_bwd.py); structurally
    # the early exit is unchanged: converged rounds take the identity
    # branch and skip binning + all renders.
    n_rounds = -(-config.max_iters // rb)

    def round_wrap(_, state):
        return jax.lax.cond(live(state), round_body, lambda s: s, state)

    T_cw, exp_ab, _, _, count, _, loss_val, _, ov_seen, pm_seen = (
        jax.lax.fori_loop(0, n_rounds, round_wrap, init)
    )

    out = render_at(T_cw)
    med, _, _ = median_depth(out.depth, out.alpha)
    return TrackResult(
        T_cw=T_cw,
        exposure=exp_ab,
        n_iters=count,
        final_loss=loss_val,
        median_depth=med,
        visibility=out.n_touched > 0,
        opacity=out.alpha,
        depth=out.depth,
        overflow=ov_seen | jnp.any(out.overflow),
        num_pairs=jnp.maximum(pm_seen, jnp.max(out.num_pairs)),
    )
