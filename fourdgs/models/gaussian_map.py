"""Fixed-capacity Gaussian map: the scene model of the SLAM system.

TPU-native re-design of the reference `GaussianModel`
(gaussian_splatting/scene/gaussian_model.py:37-1036). The reference grows
and shrinks parameter tensors and performs "Adam-state surgery"
(cat_tensors_to_optimizer / _prune_optimizer, :793-827, :749-777); under
XLA every shape must be static, so the map is a preallocated capacity-C
pytree with an `alive` mask:

  - insertion writes new Gaussians into dead slots (and zeroes their
    Adam moments),
  - pruning just clears `alive` (and the moments),
  - densify/clone/split select with masks and insert through the same
    fixed-capacity path.

Per-slot bookkeeping matches the reference fields: `dygs` (dynamic
Gaussian flag), `kf_id` (spawning keyframe), `n_obs`, `max_radii2d`,
densification accumulators. sh_degree is 0 throughout the SLAM pipeline
(reference slam.py constructs GaussianModel(sh_degree=0)), so colors are
a single DC coefficient; `features_rest` has no counterpart.

All methods are pure functions over (GaussianMap, AdamState) and jit
cleanly with a static capacity.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fourdgs.geometry.quaternion import quat_normalize, quat_to_rotmat
from fourdgs.geometry.sh import rgb_to_sh0, sh0_to_rgb
from fourdgs.ops.knn import knn_mean_sq_dist


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


class GaussianParams(NamedTuple):
    """Learnable per-Gaussian parameters (raw, pre-activation)."""

    xyz: jax.Array        # (C, 3)
    f_dc: jax.Array       # (C, 3) SH DC coefficients
    scaling: jax.Array    # (C, 3) log-scale
    rotation: jax.Array   # (C, 4) unnormalized quaternion (wxyz)
    opacity: jax.Array    # (C, 1) logit-opacity


class GaussianMap(NamedTuple):
    params: GaussianParams
    alive: jax.Array          # (C,) bool
    dygs: jax.Array           # (C,) bool — dynamic Gaussian flag
    kf_id: jax.Array          # (C,) int32 spawning keyframe
    n_obs: jax.Array          # (C,) int32
    max_radii2d: jax.Array    # (C,) float32
    grad_accum: jax.Array     # (C,) float32 — |d mean2d| accumulated
    denom: jax.Array          # (C,) float32

    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    # ---- activations (reference gaussian_model.py:60-68) ----
    @property
    def get_scaling(self) -> jax.Array:
        return jnp.exp(self.params.scaling)

    @property
    def get_rotation(self) -> jax.Array:
        return quat_normalize(self.params.rotation)

    @property
    def get_opacity(self) -> jax.Array:
        return jax.nn.sigmoid(self.params.opacity)[:, 0]

    @property
    def get_color(self) -> jax.Array:
        return sh0_to_rgb(self.params.f_dc)

    @property
    def num_alive(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32))


class AdamState(NamedTuple):
    """Per-field Adam moments over GaussianParams (eps matches the
    reference's torch.optim.Adam(eps=1e-15))."""

    mu: GaussianParams
    nu: GaussianParams
    count: jax.Array  # () int32


class MapLRs(NamedTuple):
    """Per-field learning rates (reference training_setup,
    gaussian_model.py:400-447; spatial_lr_scale = 6 from slam.py:74)."""

    xyz: float = 0.00016 * 6.0
    f_dc: float = 0.0025
    scaling: float = 0.001 * 6.0
    rotation: float = 0.001
    opacity: float = 0.05


def empty_map(capacity: int) -> GaussianMap:
    z3 = jnp.zeros((capacity, 3), jnp.float32)
    rot = jnp.zeros((capacity, 4), jnp.float32).at[:, 0].set(1.0)
    return GaussianMap(
        params=GaussianParams(
            xyz=z3,
            f_dc=z3,
            scaling=jnp.full((capacity, 3), -10.0, jnp.float32),
            rotation=rot,
            opacity=jnp.full((capacity, 1), -10.0, jnp.float32),
        ),
        alive=jnp.zeros((capacity,), bool),
        dygs=jnp.zeros((capacity,), bool),
        kf_id=jnp.zeros((capacity,), jnp.int32),
        n_obs=jnp.zeros((capacity,), jnp.int32),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        grad_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
    )


def resize_map(gmap: GaussianMap, adam: AdamState, new_capacity: int):
    """Grow (or shrink, alive slots permitting) the capacity. Shapes are
    static under XLA, so jitted programs recompile once per capacity
    bucket; the runner grows in powers of two as the map fills
    (the reference's tensors grow every densify call instead)."""
    old = gmap.capacity

    def grow(x, fill=0):
        pad = [(0, new_capacity - old)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad, constant_values=fill)

    def shrink_order():
        # keep alive slots first
        return jnp.argsort(~gmap.alive, stable=True)[:new_capacity]

    if new_capacity >= old:
        # pad params with the SAFE dead-slot defaults (empty_map), never
        # zeros: a zero quaternion in a dead slot NaNs the normalize VJP
        # (0/0 under a zero cotangent is still NaN), and the NaN then
        # leaks into the dead slot's params and eventually into densify
        # stats — the bug class tests/test_e2e_kernel_path.py guards
        fresh = empty_map(new_capacity).params

        def grow_param(x, f):
            return f.at[:old].set(x) if new_capacity > old else x

        gmap2 = GaussianMap(
            params=jax.tree.map(grow_param, gmap.params, fresh),
            alive=grow(gmap.alive),
            dygs=grow(gmap.dygs),
            kf_id=grow(gmap.kf_id),
            n_obs=grow(gmap.n_obs),
            max_radii2d=grow(gmap.max_radii2d),
            grad_accum=grow(gmap.grad_accum),
            denom=grow(gmap.denom),
        )
        adam2 = AdamState(
            mu=jax.tree.map(grow, adam.mu),
            nu=jax.tree.map(grow, adam.nu),
            count=adam.count,
        )
    else:
        order = shrink_order()

        def take(x):
            return x[order]

        gmap2 = jax.tree.map(take, gmap)
        adam2 = AdamState(
            mu=jax.tree.map(take, adam.mu),
            nu=jax.tree.map(take, adam.nu),
            count=adam.count,
        )
    return gmap2, adam2


def init_adam(capacity: int) -> AdamState:
    zero = empty_map(capacity).params
    zero = jax.tree.map(jnp.zeros_like, zero)
    return AdamState(mu=zero, nu=zero, count=jnp.zeros((), jnp.int32))


def adam_step(
    params: GaussianParams,
    grads: GaussianParams,
    state: AdamState,
    lrs: MapLRs,
    alive: jax.Array,
    xyz_lr_mult: jax.Array | float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
) -> tuple[GaussianParams, AdamState]:
    """Adam update gated by `alive` (dead slots never move — they do not
    exist in the reference)."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    c1 = 1.0 - b1**t
    c2 = 1.0 - b2**t
    lr_map = lrs._asdict()
    lr_map["xyz"] = lrs.xyz * xyz_lr_mult

    new_p, new_mu, new_nu = {}, {}, {}
    for name in GaussianParams._fields:
        p = getattr(params, name)
        g = getattr(grads, name)
        mu = b1 * getattr(state.mu, name) + (1 - b1) * g
        nu = b2 * getattr(state.nu, name) + (1 - b2) * g * g
        step = lr_map[name] * (mu / c1) / (jnp.sqrt(nu / c2) + eps)
        # where-gating, not multiply-gating: a NaN gradient on a dead slot
        # (autodiff through degenerate dead-slot activations emits NaN
        # even under zero cotangents) must not poison the slot — NaN * 0
        # is still NaN
        mask = alive.reshape((-1,) + (1,) * (p.ndim - 1))
        new_p[name] = jnp.where(mask, p - step, p)
        new_mu[name] = jnp.where(mask, mu, 0.0)
        new_nu[name] = jnp.where(mask, nu, 0.0)
    return GaussianParams(**new_p), AdamState(
        mu=GaussianParams(**new_mu), nu=GaussianParams(**new_nu), count=count
    )


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=30000):
    """3DGS exponential LR schedule (reference `helper`,
    gaussian_splatting/scene/gaussian_model.py:79-97): log-linear
    interpolation lr_init -> lr_final over max_steps. The delay easing
    only applies when lr_delay_steps > 0 — the reference's
    update_learning_rate call leaves it at the default 0, so delay_rate
    is 1.0 there."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay = 1.0
    return delay * jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)


class NewGaussians(NamedTuple):
    """Fixed-size batch of candidate insertions (masked)."""

    xyz: jax.Array      # (P, 3)
    rgb: jax.Array      # (P, 3) linear color in [0,1]
    scaling: jax.Array  # (P, 3) log-scale
    rotation: jax.Array
    opacity: jax.Array  # (P, 1) raw
    valid: jax.Array    # (P,) bool


def insert(
    gmap: GaussianMap,
    adam: AdamState,
    new: NewGaussians,
    kf_id: jax.Array | int,
    dygs: bool | jax.Array = False,
) -> tuple[GaussianMap, AdamState, jax.Array]:
    """Place candidates in dead slots (densification_postfix semantics,
    reference gaussian_model.py:833-871: new Gaussians with zeroed Adam
    moments and reset densification stats). Overflow beyond capacity is
    dropped; returns the number actually inserted."""
    # candidate batches larger than the capacity keep their first
    # `capacity` valid entries (overflow drops, like the reference would
    # OOM-free by construction)
    p = min(new.valid.shape[0], gmap.capacity)
    # stable: valid candidates first
    cand_order = jnp.argsort(~new.valid, stable=True)[:p]
    valid_sorted = new.valid[cand_order]
    # dead slots first
    slot_order = jnp.argsort(gmap.alive, stable=True)
    slots = slot_order[:p]
    slot_dead = ~gmap.alive[slots]
    take = valid_sorted & slot_dead

    def put(arr, vals):
        vals_sorted = vals[cand_order]
        cur = arr[slots]
        mask = take.reshape((-1,) + (1,) * (arr.ndim - 1))
        return arr.at[slots].set(jnp.where(mask, vals_sorted, cur))

    params = GaussianParams(
        xyz=put(gmap.params.xyz, new.xyz),
        f_dc=put(gmap.params.f_dc, rgb_to_sh0(new.rgb)),
        scaling=put(gmap.params.scaling, new.scaling),
        rotation=put(gmap.params.rotation, new.rotation),
        opacity=put(gmap.params.opacity, new.opacity),
    )
    zeros = NewGaussians(
        xyz=jnp.zeros_like(new.xyz),
        rgb=jnp.zeros_like(new.rgb),
        scaling=jnp.zeros_like(new.scaling),
        rotation=jnp.zeros_like(new.rotation),
        opacity=jnp.zeros_like(new.opacity),
        valid=new.valid,
    )
    mu = GaussianParams(
        xyz=put(adam.mu.xyz, zeros.xyz),
        f_dc=put(adam.mu.f_dc, zeros.rgb),
        scaling=put(adam.mu.scaling, zeros.scaling),
        rotation=put(adam.mu.rotation, zeros.rotation),
        opacity=put(adam.mu.opacity, zeros.opacity),
    )
    nu = GaussianParams(
        xyz=put(adam.nu.xyz, zeros.xyz),
        f_dc=put(adam.nu.f_dc, zeros.rgb),
        scaling=put(adam.nu.scaling, zeros.scaling),
        rotation=put(adam.nu.rotation, zeros.rotation),
        opacity=put(adam.nu.opacity, zeros.opacity),
    )

    def put1(arr, vals):
        return arr.at[slots].set(jnp.where(take, vals[cand_order], arr[slots]))

    kf_arr = jnp.full((p,), kf_id, jnp.int32)
    dy_arr = jnp.broadcast_to(jnp.asarray(dygs, bool), (p,))
    gmap2 = GaussianMap(
        params=params,
        alive=put1(gmap.alive, jnp.ones((p,), bool)),
        dygs=put1(gmap.dygs, dy_arr),
        kf_id=put1(gmap.kf_id, kf_arr),
        n_obs=put1(gmap.n_obs, jnp.zeros((p,), jnp.int32)),
        max_radii2d=put1(gmap.max_radii2d, jnp.zeros((p,), jnp.float32)),
        grad_accum=put1(gmap.grad_accum, jnp.zeros((p,), jnp.float32)),
        denom=put1(gmap.denom, jnp.zeros((p,), jnp.float32)),
    )
    return gmap2, AdamState(mu=mu, nu=nu, count=adam.count), jnp.sum(take)


def prune(gmap: GaussianMap, adam: AdamState, kill: jax.Array) -> tuple[GaussianMap, AdamState]:
    """Clear `alive` for killed slots and zero their Adam moments
    (reference prune_points + _prune_optimizer, gaussian_model.py:749-791)."""
    keep = gmap.alive & ~kill
    keepf = keep.astype(jnp.float32)

    def m(x):
        return x * keepf.reshape((-1,) + (1,) * (x.ndim - 1))

    return (
        gmap._replace(alive=keep),
        adam._replace(mu=jax.tree.map(m, adam.mu), nu=jax.tree.map(m, adam.nu)),
    )


def add_densification_stats(
    gmap: GaussianMap, mean2d_grad: jax.Array, update_filter: jax.Array
) -> GaussianMap:
    """Accumulate |d mean2d| for visible Gaussians (reference
    gaussian_model.py:973-977). `mean2d_grad` is the gradient tap from
    rasterize(mean2d_offset=...)."""
    norm = jnp.linalg.norm(mean2d_grad, axis=-1)
    f = update_filter.astype(jnp.float32)
    return gmap._replace(
        grad_accum=gmap.grad_accum + norm * f,
        denom=gmap.denom + f,
    )


def update_max_radii(gmap: GaussianMap, radii: jax.Array, visible: jax.Array) -> GaussianMap:
    return gmap._replace(
        max_radii2d=jnp.where(
            visible, jnp.maximum(gmap.max_radii2d, radii.astype(jnp.float32)), gmap.max_radii2d
        )
    )


def reset_opacity(gmap: GaussianMap, adam: AdamState, value: float = 0.01):
    """Clamp all opacities to `value` and reset the opacity Adam moments
    (reference reset_opacity + replace_tensor_to_optimizer,
    gaussian_model.py:622-625)."""
    new_op = jnp.full_like(gmap.params.opacity, inverse_sigmoid(value))
    params = gmap.params._replace(opacity=new_op)
    adam = adam._replace(
        mu=adam.mu._replace(opacity=jnp.zeros_like(adam.mu.opacity)),
        nu=adam.nu._replace(opacity=jnp.zeros_like(adam.nu.opacity)),
    )
    return gmap._replace(params=params), adam


def reset_opacity_nonvisible(gmap: GaussianMap, adam: AdamState, visible: jax.Array):
    """Reset only Gaussians not visible in the current window to 0.4
    (reference reset_opacity_nonvisible, gaussian_model.py:627-635)."""
    target = inverse_sigmoid(0.4)
    new_op = jnp.where(visible[:, None], gmap.params.opacity, target)
    params = gmap.params._replace(opacity=new_op)
    nonvisf = (~visible).astype(jnp.float32)[:, None]
    adam = adam._replace(
        mu=adam.mu._replace(opacity=adam.mu.opacity * (1 - nonvisf)),
        nu=adam.nu._replace(opacity=adam.nu.opacity * (1 - nonvisf)),
    )
    return gmap._replace(params=params), adam


@partial(jax.jit, static_argnames=("percent_dense",))
def densify_and_prune(
    gmap: GaussianMap,
    adam: AdamState,
    key: jax.Array,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float,
    percent_dense: float = 0.01,
):
    """Clone small high-gradient Gaussians, split large ones (2 samples,
    scale/1.6), prune transparent/oversized ones — reference
    densify_and_clone/split/prune (gaussian_model.py:875-971).

    Candidate batches have capacity C (each existing Gaussian can be
    selected at most once per call), so the fixed-capacity insert is
    exact up to total-capacity overflow."""
    p = gmap.params
    orig_alive = gmap.alive
    orig_max_radii = gmap.max_radii2d
    grads = jnp.where(gmap.denom > 0, gmap.grad_accum / jnp.maximum(gmap.denom, 1.0), 0.0)
    scaling = jnp.exp(p.scaling)
    max_scale = jnp.max(scaling, axis=1)
    hi_grad = (grads >= max_grad) & gmap.alive

    clone_sel = hi_grad & (max_scale <= percent_dense * extent)
    split_sel = hi_grad & (max_scale > percent_dense * extent)

    # -- clone: copy in place --
    clones = NewGaussians(
        xyz=p.xyz, rgb=sh0_to_rgb(p.f_dc), scaling=p.scaling,
        rotation=p.rotation, opacity=p.opacity, valid=clone_sel,
    )
    gmap, adam, n_clone = insert_raw(gmap, adam, clones, gmap.kf_id, gmap.dygs)

    # -- split: 2 samples from N(mean, scale), scale /= 1.6 --
    rot = quat_to_rotmat(quat_normalize(p.rotation))
    new_scaling = jnp.log(scaling / (0.8 * 2.0))
    keys = jax.random.split(key, 2)
    for i in range(2):
        noise = jax.random.normal(keys[i], p.xyz.shape) * scaling
        offs = jnp.einsum("nij,nj->ni", rot, noise)
        samples = NewGaussians(
            xyz=p.xyz + offs, rgb=sh0_to_rgb(p.f_dc), scaling=new_scaling,
            rotation=p.rotation, opacity=p.opacity, valid=split_sel,
        )
        gmap, adam, _ = insert_raw(gmap, adam, samples, gmap.kf_id, gmap.dygs)

    # -- prune: originals of splits + transparent + oversized. Masks are
    # evaluated against the PRE-insert population (the reference prunes
    # with a mask padded with False over the freshly added Gaussians,
    # gaussian_model.py:916-923). --
    opacity = jax.nn.sigmoid(p.opacity)[:, 0]
    kill = split_sel | (opacity < min_opacity)
    kill = jnp.where(
        max_screen_size > 0,
        kill
        | (orig_max_radii > max_screen_size)
        | (jnp.max(jnp.exp(p.scaling), axis=1) > 0.1 * extent),
        kill,
    )
    gmap, adam = prune(gmap, adam, kill & orig_alive)
    gmap = gmap._replace(
        grad_accum=jnp.zeros_like(gmap.grad_accum),
        denom=jnp.zeros_like(gmap.denom),
        max_radii2d=jnp.zeros_like(gmap.max_radii2d),
    )
    return gmap, adam


def insert_raw(gmap, adam, new: NewGaussians, kf_src: jax.Array, dy_src: jax.Array):
    """insert() variant carrying per-candidate kf_id/dygs (for clone/split
    which inherit bookkeeping from their source Gaussian)."""
    pcount = min(new.valid.shape[0], gmap.capacity)
    cand_order = jnp.argsort(~new.valid, stable=True)[:pcount]
    valid_sorted = new.valid[cand_order]
    slot_order = jnp.argsort(gmap.alive, stable=True)
    slots = slot_order[:pcount]
    take = valid_sorted & ~gmap.alive[slots]

    def put(arr, vals):
        vals_sorted = vals[cand_order]
        mask = take.reshape((-1,) + (1,) * (arr.ndim - 1))
        return arr.at[slots].set(jnp.where(mask, vals_sorted, arr[slots]))

    params = GaussianParams(
        xyz=put(gmap.params.xyz, new.xyz),
        f_dc=put(gmap.params.f_dc, rgb_to_sh0(new.rgb)),
        scaling=put(gmap.params.scaling, new.scaling),
        rotation=put(gmap.params.rotation, new.rotation),
        opacity=put(gmap.params.opacity, new.opacity),
    )

    def zput(arr):
        mask = take.reshape((-1,) + (1,) * (arr.ndim - 1))
        return arr.at[slots].set(jnp.where(mask, jnp.zeros_like(arr[slots]), arr[slots]))

    adam2 = AdamState(
        mu=jax.tree.map(zput, adam.mu),
        nu=jax.tree.map(zput, adam.nu),
        count=adam.count,
    )
    gmap2 = GaussianMap(
        params=params,
        alive=put(gmap.alive, jnp.ones((pcount,), bool)),
        dygs=put(gmap.dygs, dy_src),
        kf_id=put(gmap.kf_id, kf_src),
        n_obs=put(gmap.n_obs, jnp.zeros((pcount,), jnp.int32)),
        max_radii2d=put(gmap.max_radii2d, jnp.zeros((pcount,), jnp.float32)),
        grad_accum=put(gmap.grad_accum, jnp.zeros((pcount,), jnp.float32)),
        denom=put(gmap.denom, jnp.zeros((pcount,), jnp.float32)),
    )
    return gmap2, adam2, jnp.sum(take)


@partial(jax.jit, static_argnames=("max_new", "downsample", "adaptive_pointsize"))
def candidates_from_rgbd(
    key: jax.Array,
    image: jax.Array,        # (3, H, W)
    depth: jax.Array,        # (H, W) — zeros where not to spawn
    T_cw: jax.Array,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    *,
    downsample: int,
    point_size: float = 0.01,
    adaptive_pointsize: bool = True,
    max_new: int = 16384,
    exposure_a: jax.Array | float = 0.0,
    exposure_b: jax.Array | float = 0.0,
) -> NewGaussians:
    """Back-project an RGB-D keyframe into Gaussian candidates.

    Replaces the reference's Open3D RGBD point cloud + random_down_sample
    + distCUDA2 scale init path (gaussian_model.py:185-255): random
    pixel subsampling at rate 1/downsample, 3-NN mean-squared-distance
    scale (log sqrt), opacity 0.5, identity rotation."""
    from fourdgs.geometry.projection import backproject_depth

    h, w = depth.shape
    img = jnp.clip(jnp.exp(exposure_a) * image + exposure_b, 0.0, 1.0)
    pts = backproject_depth(depth, fx, fy, cx, cy, T_cw)  # (H*W, 3)
    rgb = img.reshape(3, -1).T

    valid = (depth > 0).reshape(-1)
    keep = jax.random.uniform(key, (h * w,)) < (1.0 / downsample)
    sel = valid & keep
    # compact the first max_new selected pixels
    order = jnp.argsort(~sel, stable=True)[:max_new]
    ok = sel[order]
    xyz = pts[order]
    rgb = rgb[order]

    if adaptive_pointsize:
        med = jnp.nanmedian(jnp.where(depth > 0.1, depth, jnp.nan))
        psize = jnp.minimum(0.05, point_size * med)
    else:
        psize = point_size
    d2 = jnp.maximum(knn_mean_sq_dist(xyz, ok, k=3) * psize, 1e-7)
    scaling = jnp.log(jnp.sqrt(d2))[:, None] * jnp.ones((1, 3))

    rotation = jnp.zeros((max_new, 4)).at[:, 0].set(1.0)
    opacity = jnp.full((max_new, 1), inverse_sigmoid(0.5))
    return NewGaussians(
        xyz=xyz, rgb=rgb, scaling=scaling, rotation=rotation,
        opacity=opacity, valid=ok,
    )
