"""K-nearest-neighbour ops, MXU-friendly.

TPU-native replacements for the reference's native KNN dependencies:
  - `knn_mean_sq_dist` replaces the simple-knn CUDA kernel `distCUDA2`
    (reference submodules/simple-knn/simple_knn.cu:119-220, used for
    initial Gaussian scales at gaussian_model.py:236-242),
  - `knn_indices`/`knn_weights` replace pytorch3d `knn_points` for the
    control-node blend (reference utils/time_utils.py:981-1015).

All distances are computed as d^2 = |q|^2 + |r|^2 - 2 q.r so the inner
product rides the MXU; queries are processed in static chunks to bound
the (chunk, N_ref) intermediate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e10


def _pad_to(x: jax.Array, n: int, axis: int = 0) -> jax.Array:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad)


def _chunked_topk_neg_dist(
    queries: jax.Array,
    refs: jax.Array,
    ref_valid: jax.Array | None,
    k: int,
    exclude_self: bool,
    chunk: int = 2048,
) -> tuple[jax.Array, jax.Array]:
    """Returns (sq_dists, indices) of the k nearest refs per query."""
    nq = queries.shape[0]
    nchunks = max(1, -(-nq // chunk))
    padded = _pad_to(queries, nchunks * chunk)
    qc = padded.reshape(nchunks, chunk, 3)

    r_sq = jnp.sum(refs * refs, axis=-1)
    if ref_valid is not None:
        invalid_bias = jnp.where(ref_valid, 0.0, _BIG)
    else:
        invalid_bias = jnp.zeros_like(r_sq)

    def body(carry, inp):
        q, base = inp
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        d2 = q_sq + r_sq[None, :] - 2.0 * (q @ refs.T) + invalid_bias[None, :]
        if exclude_self:
            rows = base + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
            d2 = jnp.where(rows == cols, _BIG, d2)
        neg, idx = jax.lax.top_k(-d2, k)
        return carry, (-neg, idx)

    bases = jnp.arange(nchunks, dtype=jnp.int32) * chunk
    _, (d2s, idxs) = jax.lax.scan(body, None, (qc, bases))
    d2s = d2s.reshape(nchunks * chunk, k)[:nq]
    idxs = idxs.reshape(nchunks * chunk, k)[:nq]
    return jnp.maximum(d2s, 0.0), idxs


def knn_indices(
    queries: jax.Array,
    refs: jax.Array,
    k: int,
    ref_valid: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """(Nq,3) x (Nr,3) -> (sq_dists (Nq,k), indices (Nq,k))."""
    return _chunked_topk_neg_dist(queries, refs, ref_valid, k, exclude_self=False)


def knn_mean_sq_dist(
    points: jax.Array,
    valid: jax.Array | None = None,
    k: int = 3,
) -> jax.Array:
    """Mean squared distance from each point to its k nearest *other*
    points (distCUDA2 semantics). Invalid points get distance 0."""
    d2, _ = _chunked_topk_neg_dist(points, points, valid, k, exclude_self=True)
    # A query with fewer than k valid neighbours picks up _BIG entries;
    # clamp them out like the reference clamps dist2 min.
    d2 = jnp.where(d2 >= _BIG * 0.5, 0.0, d2)
    mean = jnp.mean(d2, axis=-1)
    if valid is not None:
        mean = jnp.where(valid, mean, 0.0)
    return mean


def knn_weights(
    queries: jax.Array,
    nodes: jax.Array,
    node_radius: jax.Array,
    k: int = 3,
    node_valid: jax.Array | None = None,
    eps: float = 1e-7,
) -> tuple[jax.Array, jax.Array]:
    """Gaussian-kernel KNN blend weights for control-node skinning
    (reference utils/time_utils.py:981-1015 `cal_nn_weight`):
        w_i = exp(-d_i^2 / (2 r_i^2)),  normalized over the K picks.

    Returns (weights (Nq,k), indices (Nq,k))."""
    d2, idx = knn_indices(queries, nodes, k, ref_valid=node_valid)
    r = node_radius[idx]
    w = jnp.exp(-d2 / (2.0 * jnp.maximum(r * r, eps)))
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), eps)
    return w, idx


@functools.partial(jax.jit, static_argnames=("n_samples",))
def farthest_point_sample(points: jax.Array, valid: jax.Array, n_samples: int, key: jax.Array) -> jax.Array:
    """FPS over valid points (reference utils/time_utils.py:478-500).
    Returns (n_samples,) indices into `points`. Invalid points are never
    selected (their distance contribution is forced to -inf)."""
    n = points.shape[0]
    validf = valid.astype(points.dtype)
    start = jax.random.choice(key, n, p=validf / jnp.maximum(jnp.sum(validf), 1.0))

    def body(carry, _):
        min_d2, selected_prev = carry
        p = points[selected_prev]
        d2 = jnp.sum((points - p[None]) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        scored = jnp.where(valid, min_d2, -jnp.inf)
        nxt = jnp.argmax(scored)
        return (min_d2, nxt), selected_prev

    (_, last), sel = jax.lax.scan(
        body, (jnp.full((n,), jnp.inf, dtype=points.dtype), start), None, length=n_samples
    )
    return sel
