"""SC-GS control-node deformation field — the "4D" mechanism.

JAX re-design of the reference ControlNodeWarp + DeformNetwork
(utils/time_utils.py:327-475, 788-1295) and the ARAP/elastic regularizers
(utils/deform_utils.py:58-205, time_utils.py:1128-1165):

  - a fixed-capacity set of control nodes (positions + learnable
    Gaussian-kernel radius + node weight) with a validity mask,
  - a NeRF-style MLP (D=8, W=256, skip at 4) over positional encodings of
    (node, t) predicting per-node (d_xyz, d_rotation, d_scaling), heads
    initialized near zero so the field starts as the identity warp,
  - per-Gaussian deformation by K=3 Gaussian-kernel KNN blending of the
    node deltas (cal_nn_weight, time_utils.py:981-1015) — pytorch3d
    `knn_points` is replaced by the MXU-friendly chunked top-k in
    fourdgs/ops/knn.py,
  - ARAP: K=10 node connectivity, per-node best-fit rotations by batched
    3x3 SVD (the reference's torch-batch-svd becomes vmapped
    jnp.linalg.svd) between time samples, stretch energy on edges,
  - elastic: variance of edge lengths over jittered time samples.

Parameters live in plain pytrees (Adam-compatible with the same masked
optimizer used for the Gaussian map).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fourdgs.ops.knn import knn_indices, farthest_point_sample

XYZ_MULTIRES = 10
T_MULTIRES = 10
MLP_DEPTH = 8
MLP_WIDTH = 256
SKIP_LAYER = MLP_DEPTH // 2


def posenc(x: jax.Array, num_freqs: int) -> jax.Array:
    """NeRF positional encoding incl. identity (reference get_embedder,
    time_utils.py:208-260): [x, sin(2^k x), cos(2^k x)]_k."""
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    xb = x[..., None, :] * freqs[:, None]
    enc = jnp.concatenate(
        [jnp.sin(xb), jnp.cos(xb)], axis=-1
    ).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, enc], axis=-1)


def _posenc_dim(d: int, num_freqs: int) -> int:
    return d * (1 + 2 * num_freqs)


class MLPParams(NamedTuple):
    weights: tuple
    biases: tuple
    head_warp: tuple      # (W, b) -> 3
    head_scaling: tuple   # (W, b) -> 3
    head_rotation: tuple  # (W, b) -> 4


class ControlNodes(NamedTuple):
    nodes: jax.Array        # (M, 3)
    radius_raw: jax.Array   # (M,) log-radius
    weight_raw: jax.Array   # (M, 1) node weight
    valid: jax.Array        # (M,) bool
    mlp: MLPParams

    @property
    def node_radius(self) -> jax.Array:
        return jnp.exp(self.radius_raw)

    @property
    def node_weight(self) -> jax.Array:
        return jnp.abs(self.weight_raw) + 1e-7


class ControlNodeFloats(NamedTuple):
    """Differentiable subset of ControlNodes (grad/Adam operate here; the
    bool validity mask is carried separately)."""

    nodes: jax.Array
    radius_raw: jax.Array
    weight_raw: jax.Array
    mlp: MLPParams


def cn_floats(cn: ControlNodes) -> ControlNodeFloats:
    return ControlNodeFloats(cn.nodes, cn.radius_raw, cn.weight_raw, cn.mlp)


def cn_merge(f: ControlNodeFloats, valid: jax.Array) -> ControlNodes:
    return ControlNodes(
        nodes=f.nodes, radius_raw=f.radius_raw, weight_raw=f.weight_raw,
        valid=valid, mlp=f.mlp,
    )


def init_mlp(key: jax.Array) -> MLPParams:
    in_dim = _posenc_dim(3, XYZ_MULTIRES) + _posenc_dim(1, T_MULTIRES)
    dims = []
    for i in range(MLP_DEPTH):
        # the layer AFTER the skip concat consumes W + input features
        d_in = in_dim if i == 0 else (
            MLP_WIDTH + in_dim if i == SKIP_LAYER + 1 else MLP_WIDTH
        )
        dims.append((d_in, MLP_WIDTH))
    keys = jax.random.split(key, MLP_DEPTH + 3)
    ws, bs = [], []
    for i, (d_in, d_out) in enumerate(dims):
        bound = jnp.sqrt(6.0 / d_in)  # kaiming uniform fan_in
        ws.append(jax.random.uniform(keys[i], (d_in, d_out), minval=-bound, maxval=bound))
        bs.append(jnp.zeros(d_out))

    def head(key, d_out, std):
        return (
            jax.random.normal(key, (MLP_WIDTH, d_out)) * std,
            jnp.zeros(d_out),
        )

    return MLPParams(
        weights=tuple(ws),
        biases=tuple(bs),
        head_warp=head(keys[-3], 3, 1e-5),
        head_scaling=head(keys[-2], 3, 1e-8),
        head_rotation=head(keys[-1], 4, 1e-5),
    )


def init_nodes(
    key: jax.Array,
    capacity: int,
    init_points: jax.Array,
    points_valid: jax.Array,
    node_num: int | None = None,
) -> ControlNodes:
    """FPS-sample control nodes from the dynamic-region point cloud and
    set radii to 0.1x the scene range (reference init,
    time_utils.py:904-952)."""
    node_num = capacity if node_num is None else min(node_num, capacity)
    k1, k2 = jax.random.split(key)
    sel = farthest_point_sample(init_points, points_valid, node_num, k1)
    nodes = jnp.zeros((capacity, 3)).at[:node_num].set(init_points[sel])
    valid = jnp.zeros((capacity,), bool).at[:node_num].set(True)
    pv = points_valid
    pmax = jnp.max(jnp.where(pv[:, None], init_points, -jnp.inf))
    pmin = jnp.min(jnp.where(pv[:, None], init_points, jnp.inf))
    scene_range = pmax - pmin
    radius_raw = jnp.full((capacity,), jnp.log(0.1 * scene_range + 1e-7))
    return ControlNodes(
        nodes=nodes,
        radius_raw=radius_raw,
        weight_raw=jnp.zeros((capacity, 1)),
        valid=valid,
        mlp=init_mlp(k2),
    )


def extend_nodes(
    cn: ControlNodes,
    key: jax.Array,
    new_points: jax.Array,
    points_valid: jax.Array,
    sample_number: int = 250,
) -> ControlNodes:
    """Add control nodes for newly appearing dynamic regions into spare
    capacity slots (reference extend_node, time_utils.py:954-973): FPS
    sample from the new point cloud, radius from the existing median."""
    capacity = cn.nodes.shape[0]
    free = jnp.sum(~cn.valid)
    n_add = int(min(sample_number, capacity))
    sel = farthest_point_sample(new_points, points_valid, n_add, key)
    # place into dead slots (stable order)
    slot_order = jnp.argsort(cn.valid, stable=True)
    slots = slot_order[:n_add]
    take = (~cn.valid[slots]) & (jnp.arange(n_add) < free)
    med_r = jnp.median(jnp.where(cn.valid, cn.radius_raw, jnp.nan))
    med_r = jnp.where(jnp.isnan(med_r), jnp.log(0.1), med_r)
    nodes = cn.nodes.at[slots].set(
        jnp.where(take[:, None], new_points[sel], cn.nodes[slots])
    )
    radius = cn.radius_raw.at[slots].set(
        jnp.where(take, med_r, cn.radius_raw[slots])
    )
    weight = cn.weight_raw.at[slots].set(
        jnp.where(take[:, None], 0.0, cn.weight_raw[slots])
    )
    valid = cn.valid.at[slots].set(take | cn.valid[slots])
    return cn._replace(nodes=nodes, radius_raw=radius, weight_raw=weight, valid=valid)


def mlp_forward(mlp: MLPParams, x: jax.Array, t: jax.Array):
    """x (..., 3), t (..., 1) -> (d_xyz, d_rotation, d_scaling)."""
    x_emb = posenc(x, XYZ_MULTIRES)
    t_emb = posenc(t, T_MULTIRES)
    inp = jnp.concatenate([x_emb, t_emb], axis=-1)
    h = inp
    for i in range(MLP_DEPTH):
        h = h @ mlp.weights[i] + mlp.biases[i]
        h = jax.nn.relu(h)
        if i == SKIP_LAYER:
            h = jnp.concatenate([inp, h], axis=-1)
    d_xyz = h @ mlp.head_warp[0] + mlp.head_warp[1]
    d_scaling = h @ mlp.head_scaling[0] + mlp.head_scaling[1]
    d_rotation = h @ mlp.head_rotation[0] + mlp.head_rotation[1]
    return d_xyz, d_rotation, d_scaling


def node_deform(cn: ControlNodes, t: jax.Array):
    """Per-node deltas at scalar time t (expand_time + node_deform,
    time_utils.py:975-1050). Node positions are detached."""
    nodes = jax.lax.stop_gradient(cn.nodes)
    tt = jnp.broadcast_to(jnp.reshape(t, (1, 1)), (nodes.shape[0], 1))
    return mlp_forward(cn.mlp, nodes, tt)


def nn_weights(cn: ControlNodes, x: jax.Array, k: int = 3):
    """Gaussian-kernel KNN blend weights (cal_nn_weight,
    time_utils.py:981-1015): exp(-d^2/(2 r^2)) * node_weight, normalized."""
    d2, idx = knn_indices(
        jax.lax.stop_gradient(x), jax.lax.stop_gradient(cn.nodes), k,
        ref_valid=cn.valid,
    )
    r = cn.node_radius[idx]
    w = jnp.exp(-d2 / (2.0 * r * r))
    w = w * cn.node_weight[idx, 0]
    w = w + 1e-7
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return w, idx


def warp(cn: ControlNodes, x: jax.Array, t: jax.Array, k: int = 3,
         motion_mask: jax.Array | None = None):
    """Deform points x at time t: blended (d_xyz (N,3), d_rotation (N,4)
    residual, d_scaling (N,3)) — ControlNodeWarp.forward
    (time_utils.py:1192-1295, d_rot_as_res branch)."""
    w, idx = nn_weights(cn, x, k)
    nd_xyz, nd_rot, nd_scale = node_deform(cn, t)
    d_xyz = jnp.sum(nd_xyz[idx] * w[..., None], axis=1)
    d_rot = jnp.sum(nd_rot[idx] * w[..., None], axis=1)
    d_scale = jnp.sum(nd_scale[idx] * w[..., None], axis=1)
    if motion_mask is not None:
        m = motion_mask.astype(d_xyz.dtype)[:, None]
        d_xyz, d_rot, d_scale = d_xyz * m, d_rot * m, d_scale * m
    return d_xyz, d_rot, d_scale


# ---------------------------------------------------------------------------
# Regularizers
# ---------------------------------------------------------------------------


def _connectivity(points: jax.Array, valid: jax.Array, k: int = 10):
    """K-NN edges (self excluded) + adaptive weights
    (cal_connectivity_from_points, deform_utils.py:58-98)."""
    n = points.shape[0]
    d2, idx = knn_indices(points, points, k + 1, ref_valid=valid)
    d2, idx = d2[:, 1:], idx[:, 1:]
    weight = jnp.exp(-d2 / jnp.maximum(jnp.mean(d2), 1e-9))
    weight = weight * valid[:, None] * valid[idx]
    return idx, weight


def _estimate_rotation(src_edges, tgt_edges, weight):
    """Per-node best-fit rotation via batched 3x3 SVD
    (estimate_rotation, deform_utils.py:130-166)."""
    S = jnp.einsum("nka,nk,nkb->nab", src_edges, weight, tgt_edges)
    U, sig, Vt = jnp.linalg.svd(S)
    W = Vt.swapaxes(-1, -2)
    R = W @ U.swapaxes(-1, -2)
    det = jnp.linalg.det(R)
    # flip the column of U of the smallest singular value where det<=0
    flip = det <= 0
    col = jnp.argmin(sig, axis=-1)
    sign = jnp.where(
        flip[:, None] & (jnp.arange(3)[None, :] == col[:, None]), -1.0, 1.0
    )
    Umod = U * sign[:, None, :]
    Rfix = W @ Umod.swapaxes(-1, -2)
    return jnp.where(flip[:, None, None], Rfix, R)


def arap_loss(cn: ControlNodes, key: jax.Array, t: jax.Array,
              delta_t: float, t_samp_num: int = 2, k: int = 10) -> jax.Array:
    """As-rigid-as-possible energy between time samples around t
    (arap_loss, time_utils.py:1128-1141 + cal_arap_error,
    deform_utils.py:179-205)."""
    k1, k2 = jax.random.split(key)
    t0 = t + delta_t * (jax.random.uniform(k1, ()) - 0.5)
    t_samp = jax.random.uniform(k2, (t_samp_num,)) * delta_t + t0 - 0.5 * delta_t

    def nodes_at(tt):
        d_xyz, _, _ = node_deform(cn, tt)
        return jax.lax.stop_gradient(cn.nodes) + d_xyz

    nodes_t = jax.vmap(nodes_at)(t_samp)  # (T, M, 3)
    idx, weight = _connectivity(jax.lax.stop_gradient(nodes_t[0]), cn.valid, k)

    src = nodes_t[0]
    src_edges = src[idx] - src[:, None]  # (M, K, 3)

    def step_err(carry, tgt):
        tgt_edges = tgt[idx] - tgt[:, None]
        R = jax.lax.stop_gradient(
            _estimate_rotation(src_edges, tgt_edges, weight)
        )
        rigid = jnp.einsum("nab,nkb->nka", R, src_edges)
        stretch = jnp.sum((tgt_edges - rigid) ** 2, axis=-1)
        return carry + jnp.sum(weight * stretch), None

    err, _ = jax.lax.scan(step_err, 0.0, nodes_t[1:])
    return err


def elastic_loss(cn: ControlNodes, key: jax.Array, t: jax.Array,
                 delta_t: float, k: int = 2, t_samp_num: int = 8) -> jax.Array:
    """Edge-length variance over jittered time samples (elastic_loss,
    time_utils.py:1143-1165)."""
    k1, k2 = jax.random.split(key)
    t0 = t + delta_t * (jax.random.uniform(k1, ()) - 0.5)
    t_samp = jax.random.uniform(k2, (t_samp_num,)) * delta_t + t0 - 0.5 * delta_t

    def nodes_at(tt):
        d_xyz, _, _ = node_deform(cn, tt)
        return jax.lax.stop_gradient(cn.nodes) + d_xyz

    nodes_t = jax.vmap(nodes_at)(t_samp)  # (T, M, 3)
    w, idx = nn_weights(cn, jax.lax.stop_gradient(cn.nodes), k + 1)
    w, idx = w[:, 1:], idx[:, 1:]
    edge_t = jnp.linalg.norm(
        nodes_t[:, idx] - nodes_t[:, :, None], axis=-1
    )  # (T, M, K)
    var = jnp.var(edge_t, axis=0)
    var = var / (jax.lax.stop_gradient(var) + 1e-5)
    maskf = cn.valid.astype(var.dtype)
    return jnp.mean(jnp.sum(var * w, axis=1) * maskf)


def acc_loss(cn: ControlNodes, key: jax.Array, t: jax.Array, delta_t: float) -> jax.Array:
    """Acceleration regularizer (acc_loss, time_utils.py:1167-1179)."""
    t0 = t + delta_t * (jax.random.uniform(key, ()) - 0.5)
    ts = jnp.stack([t0 - delta_t, t0, t0 + delta_t])

    def nodes_at(tt):
        d_xyz, _, _ = node_deform(cn, tt)
        return jax.lax.stop_gradient(cn.nodes) + d_xyz

    nodes_t = jax.vmap(nodes_at)(ts)
    acc = jnp.linalg.norm(nodes_t[0] + nodes_t[2] - 2 * nodes_t[1], axis=-1)
    acc = acc / (jax.lax.stop_gradient(acc) + 1e-5)
    return jnp.mean(acc * cn.valid.astype(acc.dtype))
