"""On-chip microbench: row-gather formulations for the backward
per-gaussian reduction (values (P, F) gathered by a (N+1, R) slot table)
and the forward pair gather. Finds the index layout that hits the TPU
vector-gather emitter inside a realistic surrounding graph."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs.utils.xla_cache import enable_compile_cache

enable_compile_cache()

P = 262144
F = 10
N1 = 32769
R = 16
V = 10

rng = np.random.default_rng(0)
vals = jnp.asarray(rng.normal(size=(P, F)), jnp.float32)
vals_v = jnp.asarray(rng.normal(size=(V, P, F)), jnp.float32)
# realistic table: ~30% valid, valid entries unique per view
ca = np.full((N1, R), -1, np.int32)
nvalid = int(0.3 * N1 * R)
slots = rng.permutation(P)[: min(nvalid, P)]
rows = rng.integers(0, N1, slots.shape[0])
cols = rng.integers(0, R, slots.shape[0])
ca[rows, cols] = slots
ca = jnp.asarray(ca)
ca_v = jnp.broadcast_to(ca, (V, N1, R))


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10 * 1000
    print(f"{name:44s} {dt:8.3f} ms")
    return out


def current(vals, ca):
    valid = ca >= 0
    spread = (jnp.arange(N1 * R, dtype=jnp.int32).reshape(N1, R)) % P
    s = jnp.where(valid, ca, spread)
    vb, sb = jax.lax.optimization_barrier((vals, s))
    rows = jax.lax.optimization_barrier(vb[sb])
    rows = rows * valid.astype(vals.dtype)[:, :, None]
    return jnp.sum(rows, axis=1)


def lane128(vals, ca):
    valid = ca >= 0
    spread = (jnp.arange(N1 * R, dtype=jnp.int32).reshape(N1, R)) % P
    s = jnp.where(valid, ca, spread)
    total = N1 * R
    pad = (-total) % 128
    flat = jnp.concatenate([s.reshape(-1), jnp.arange(pad, dtype=jnp.int32) % P])
    idx = flat.reshape(-1, 128)
    vb, ib = jax.lax.optimization_barrier((vals, idx))
    rows = jax.lax.optimization_barrier(vb[ib])           # (X, 128, F)
    rows = rows.reshape(-1, F)[:total].reshape(N1, R, F)
    rows = rows * valid.astype(vals.dtype)[:, :, None]
    return jnp.sum(rows, axis=1)


def vmap_current(vals_v, ca_v):
    return jax.vmap(current)(vals_v, ca_v)


def multi_flat(vals_v, ca_v):
    v, p, f = vals_v.shape
    valid = ca_v >= 0
    spread = (jnp.arange(N1 * R, dtype=jnp.int32).reshape(1, N1, R)) % p
    voff = (jnp.arange(v, dtype=jnp.int32) * p)[:, None, None]
    s = jnp.where(valid, ca_v, spread) + voff
    flat_vals = vals_v.reshape(v * p, f)
    total = v * N1 * R
    pad = (-total) % 128
    flat = jnp.concatenate(
        [s.reshape(-1), jnp.arange(pad, dtype=jnp.int32) % p]
    )
    idx = flat.reshape(-1, 128)
    vb, ib = jax.lax.optimization_barrier((flat_vals, idx))
    rows = jax.lax.optimization_barrier(vb[ib])
    rows = rows.reshape(-1, f)[:total].reshape(v, N1, R, f)
    rows = rows * valid.astype(vals_v.dtype)[..., None]
    return jnp.sum(rows, axis=2)


r1 = bench("single: current (N1,R) idx", current, vals, ca)
r2 = bench("single: lane128 idx", lane128, vals, ca)
np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-6)
rv1 = bench("multi: vmap(current)", vmap_current, vals_v, ca_v)
rv2 = bench("multi: flat lane128", multi_flat, vals_v, ca_v)
np.testing.assert_allclose(np.asarray(rv1), np.asarray(rv2), rtol=1e-6)

# forward pair gather formulations: rows (N1, F) -> (F, P) via gid (P,)
gid = jnp.asarray(rng.integers(0, N1, P), jnp.int32)
rows_tbl = jnp.asarray(rng.normal(size=(N1, F)), jnp.float32)


def fwd_current(rows_tbl, gid):
    rb, gb = jax.lax.optimization_barrier((rows_tbl, gid))
    return rb[gb].T


def fwd_lane(rows_tbl, gid):
    rb, gb = jax.lax.optimization_barrier((rows_tbl, gid.reshape(-1, 128)))
    g = jax.lax.optimization_barrier(rb[gb])
    return g.reshape(P, F).T


bench("fwd pair gather: flat idx", fwd_current, rows_tbl, gid)
bench("fwd pair gather: (-1,128) idx", fwd_lane, rows_tbl, gid)


def multi_map(vals_v, ca_v):
    return jax.lax.map(lambda a: current(a[0], a[1]), (vals_v, ca_v))


def multi_unroll(vals_v, ca_v):
    return jnp.stack([current(vals_v[i], ca_v[i]) for i in range(V)])


rv3 = bench("multi: lax.map(current)", multi_map, vals_v, ca_v)
np.testing.assert_allclose(np.asarray(rv1), np.asarray(rv3), rtol=1e-6)
rv4 = bench("multi: unrolled loop", multi_unroll, vals_v, ca_v)
np.testing.assert_allclose(np.asarray(rv1), np.asarray(rv4), rtol=1e-6)

# and the fwd pair gather at multi-view scale (2.6M indices into (V*N1, F))
rows_big = jnp.asarray(rng.normal(size=(V * N1, F)), jnp.float32)
gid_big = jnp.asarray(rng.integers(0, V * N1, V * P), jnp.int32)


def fwd_multi_current(rows_big, gid_big):
    rb, gb = jax.lax.optimization_barrier((rows_big, gid_big.reshape(-1, 128)))
    g = jax.lax.optimization_barrier(rb[gb])
    return g.reshape(V * P, F).T


def fwd_multi_perview(rows_big, gid_big):
    rt = rows_big.reshape(V, N1, F)
    gt = gid_big.reshape(V, P) % N1  # per-view local ids
    out = jax.lax.map(lambda a: fwd_lane(a[0], a[1]), (rt, gt))
    return out.reshape(V * P, F).T  # note: transposed layout per view


bench("fwd multi pair gather: one flat", fwd_multi_current, rows_big, gid_big)
bench("fwd multi pair gather: lax.map/view", fwd_multi_perview, rows_big, gid_big)
