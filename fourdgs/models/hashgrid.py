"""Multiresolution hash-grid deformation network (the reference's
optional `use_hash=True` path, HashDeformNetwork,
utils/time_utils.py:552-785, backed there by tinycudann).

Pure-JAX Instant-NGP-style encoder: L levels of hashed 3D (or 4D with
hash_time) grids with trilinear interpolation, concatenated features into
a small MLP with (d_xyz, d_rotation, d_scaling) heads. Hash-table lookups
are gathers (fast on TPU); feature tables are plain arrays so the same
masked Adam machinery applies.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

PRIMES = (1, 2654435761, 805459861, 3674653429)


BASE_RES = 16
GROWTH = 1.45


class HashGridParams(NamedTuple):
    tables: tuple          # L arrays (T, F)
    head_w1: jax.Array
    head_b1: jax.Array
    head_w2: jax.Array
    head_b2: jax.Array
    dx_w: jax.Array
    dx_b: jax.Array
    ds_w: jax.Array
    ds_b: jax.Array
    dr_w: jax.Array
    dr_b: jax.Array
    aabb_min: jax.Array
    aabb_max: jax.Array


def init_hashgrid(
    key: jax.Array,
    n_levels: int = 12,
    features: int = 2,
    log2_table: int = 17,
    base_res: int = 16,
    growth: float = 1.45,
    width: int = 64,
    time_dim: bool = True,
    aabb_min=(-2.0, -2.0, -2.0),
    aabb_max=(2.0, 2.0, 2.0),
) -> HashGridParams:
    t = 1 << log2_table
    ks = jax.random.split(key, n_levels + 6)
    tables = tuple(
        jax.random.uniform(ks[i], (t, features), minval=-1e-4, maxval=1e-4)
        for i in range(n_levels)
    )
    feat_dim = n_levels * features + (1 if time_dim else 0) * 9  # + time posenc
    w1 = jax.random.normal(ks[-6], (feat_dim, width)) * np.sqrt(2.0 / feat_dim)
    w2 = jax.random.normal(ks[-5], (width, width)) * np.sqrt(2.0 / width)
    return HashGridParams(
        tables=tables,
        head_w1=w1, head_b1=jnp.zeros(width),
        head_w2=w2, head_b2=jnp.zeros(width),
        dx_w=jax.random.normal(ks[-4], (width, 3)) * 1e-5, dx_b=jnp.zeros(3),
        ds_w=jax.random.normal(ks[-3], (width, 3)) * 1e-8, ds_b=jnp.zeros(3),
        dr_w=jax.random.normal(ks[-2], (width, 4)) * 1e-5, dr_b=jnp.zeros(4),
        aabb_min=jnp.asarray(aabb_min, jnp.float32),
        aabb_max=jnp.asarray(aabb_max, jnp.float32),
    )


def _hash3(ix, iy, iz, table_size):
    # uint32 wraparound hashing (Instant-NGP primes exceed int32)
    ux = ix.astype(jnp.uint32)
    uy = iy.astype(jnp.uint32)
    uz = iz.astype(jnp.uint32)
    h = (
        ux * jnp.uint32(PRIMES[0])
        ^ uy * jnp.uint32(PRIMES[1])
        ^ uz * jnp.uint32(PRIMES[2])
    )
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


def hash_encode(hp: HashGridParams, xyz: jax.Array) -> jax.Array:
    """(N, 3) -> (N, L*F) trilinear hashed features."""
    norm = jnp.clip(
        (xyz - hp.aabb_min) / (hp.aabb_max - hp.aabb_min), 0.0, 1.0
    )
    feats = []
    for lvl, table in enumerate(hp.tables):
        res = int(np.floor(BASE_RES * (GROWTH ** lvl)))
        x = norm * res
        x0 = jnp.floor(x).astype(jnp.int32)
        d = x - x0
        tsize = table.shape[0]
        acc = 0.0
        for cx in range(2):
            for cy in range(2):
                for cz in range(2):
                    ix = x0[:, 0] + cx
                    iy = x0[:, 1] + cy
                    iz = x0[:, 2] + cz
                    idx = _hash3(ix, iy, iz, tsize)
                    w = (
                        jnp.where(cx, d[:, 0], 1 - d[:, 0])
                        * jnp.where(cy, d[:, 1], 1 - d[:, 1])
                        * jnp.where(cz, d[:, 2], 1 - d[:, 2])
                    )
                    acc = acc + table[idx] * w[:, None]
        feats.append(acc)
    return jnp.concatenate(feats, axis=-1)


def _time_enc(t: jax.Array, n: int) -> jax.Array:
    """9-dim time encoding: [t, sin/cos(2^k pi t)]_{k<4}."""
    tt = jnp.broadcast_to(jnp.reshape(t, (1, 1)), (n, 1))
    freqs = (2.0 ** jnp.arange(4)) * jnp.pi
    ang = tt * freqs[None, :]
    return jnp.concatenate([tt, jnp.sin(ang), jnp.cos(ang)], axis=-1)


def hash_deform(hp: HashGridParams, xyz: jax.Array, t: jax.Array):
    """(dx, d_rotation, d_scaling) per point."""
    feat = hash_encode(hp, xyz)
    feat = jnp.concatenate([feat, _time_enc(t, xyz.shape[0])], axis=-1)
    h = jax.nn.relu(feat @ hp.head_w1 + hp.head_b1)
    h = jax.nn.relu(h @ hp.head_w2 + hp.head_b2)
    return (
        h @ hp.dx_w + hp.dx_b,
        h @ hp.dr_w + hp.dr_b,
        h @ hp.ds_w + hp.ds_b,
    )
