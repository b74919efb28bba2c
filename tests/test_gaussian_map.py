import jax
import jax.numpy as jnp
import numpy as np

from fourdgs.models.gaussian_map import (
    AdamState,
    GaussianParams,
    MapLRs,
    NewGaussians,
    adam_step,
    add_densification_stats,
    candidates_from_rgbd,
    densify_and_prune,
    empty_map,
    init_adam,
    insert,
    inverse_sigmoid,
    prune,
    reset_opacity,
    reset_opacity_nonvisible,
)

CAP = 64


def _mk_new(n, valid_n=None, seed=0):
    rng = np.random.default_rng(seed)
    valid = np.zeros(n, bool)
    valid[: (valid_n if valid_n is not None else n)] = True
    return NewGaussians(
        xyz=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        rgb=jnp.asarray(rng.uniform(0.2, 0.8, size=(n, 3)), jnp.float32),
        scaling=jnp.full((n, 3), -3.0),
        rotation=jnp.zeros((n, 4)).at[:, 0].set(1.0),
        opacity=jnp.full((n, 1), inverse_sigmoid(0.5)),
        valid=jnp.asarray(valid),
    )


def test_insert_basic():
    gmap = empty_map(CAP)
    adam = init_adam(CAP)
    new = _mk_new(16, valid_n=10)
    gmap, adam, n = insert(gmap, adam, new, kf_id=3)
    assert int(n) == 10
    assert int(gmap.num_alive) == 10
    assert bool(jnp.all(gmap.kf_id[gmap.alive] == 3))
    # colors round-trip through SH0
    got = np.sort(np.asarray(gmap.get_color[np.asarray(gmap.alive)])[:, 0])
    want = np.sort(np.asarray(new.rgb[:10, 0]))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_insert_overflow_drops():
    gmap = empty_map(8)
    adam = init_adam(8)
    gmap, adam, n1 = insert(gmap, adam, _mk_new(6), kf_id=0)
    gmap, adam, n2 = insert(gmap, adam, _mk_new(6, seed=1), kf_id=1)
    assert int(n1) == 6 and int(n2) == 2
    assert int(gmap.num_alive) == 8


def test_prune_zeroes_adam():
    gmap = empty_map(CAP)
    adam = init_adam(CAP)
    gmap, adam, _ = insert(gmap, adam, _mk_new(8), kf_id=0)
    adam = adam._replace(mu=jax.tree.map(lambda x: x + 1.0, adam.mu))
    kill = jnp.zeros(CAP, bool).at[:4].set(True)
    gmap, adam = prune(gmap, adam, kill)
    assert int(gmap.num_alive) == int(jnp.sum(~kill[:8]))
    assert float(jnp.sum(jnp.abs(adam.mu.xyz[:4]))) == 0.0


def test_adam_moves_alive_only():
    gmap = empty_map(CAP)
    adam = init_adam(CAP)
    gmap, adam, _ = insert(gmap, adam, _mk_new(8), kf_id=0)
    grads = jax.tree.map(jnp.ones_like, gmap.params)
    p2, adam2 = adam_step(gmap.params, grads, adam, MapLRs(), gmap.alive)
    moved = np.abs(np.asarray(p2.xyz - gmap.params.xyz)).sum(axis=1)
    alive = np.asarray(gmap.alive)
    assert np.all(moved[alive] > 0)
    assert np.all(moved[~alive] == 0)


def test_reset_opacity():
    gmap = empty_map(CAP)
    adam = init_adam(CAP)
    gmap, adam, _ = insert(gmap, adam, _mk_new(8), kf_id=0)
    gmap, adam = reset_opacity(gmap, adam, 0.01)
    np.testing.assert_allclose(
        np.asarray(gmap.get_opacity[np.asarray(gmap.alive)]), 0.01, atol=1e-5
    )


def test_reset_opacity_nonvisible():
    gmap = empty_map(CAP)
    adam = init_adam(CAP)
    gmap, adam, _ = insert(gmap, adam, _mk_new(8), kf_id=0)
    visible = jnp.zeros(CAP, bool).at[:4].set(True)
    op_before = np.asarray(gmap.get_opacity)
    gmap, adam = reset_opacity_nonvisible(gmap, adam, visible)
    op_after = np.asarray(gmap.get_opacity)
    np.testing.assert_allclose(op_after[:4], op_before[:4], atol=1e-6)
    np.testing.assert_allclose(op_after[4:8], 0.4, atol=1e-5)


def test_densify_clone_and_split():
    gmap = empty_map(CAP)
    adam = init_adam(CAP)
    new = _mk_new(8)
    # 4 small gaussians (clone candidates), 4 big (split candidates)
    scaling = jnp.concatenate([jnp.full((4, 3), -6.0), jnp.full((4, 3), 1.0)])
    new = new._replace(scaling=scaling)
    gmap, adam, _ = insert(gmap, adam, new, kf_id=0)
    # all have high accumulated gradient
    gmap = gmap._replace(
        grad_accum=jnp.where(gmap.alive, 1.0, 0.0),
        denom=jnp.where(gmap.alive, 1.0, 0.0),
    )
    n0 = int(gmap.num_alive)
    gmap2, adam2 = densify_and_prune(
        gmap, adam, jax.random.key(0),
        max_grad=0.5, min_opacity=0.1, extent=1.0, max_screen_size=0.0,
    )
    # clones: 4 small doubled; splits: 4 big -> 8 children, originals pruned
    assert int(gmap2.num_alive) == 4 * 2 + 4 * 2
    # stats reset
    assert float(jnp.sum(gmap2.grad_accum)) == 0.0


def test_densify_prunes_transparent():
    gmap = empty_map(CAP)
    adam = init_adam(CAP)
    new = _mk_new(8)
    op = jnp.concatenate(
        [jnp.full((4, 1), inverse_sigmoid(0.9)), jnp.full((4, 1), inverse_sigmoid(0.001))]
    )
    gmap, adam, _ = insert(gmap, adam, new._replace(opacity=op), kf_id=0)
    gmap2, _ = densify_and_prune(
        gmap, adam, jax.random.key(0),
        max_grad=1e9, min_opacity=0.005, extent=1.0, max_screen_size=0.0,
    )
    assert int(gmap2.num_alive) == 4


def test_candidates_from_rgbd():
    h, w = 32, 40
    fx = fy = 40.0
    cx, cy = w / 2, h / 2
    img = jnp.full((3, h, w), 0.5)
    depth = jnp.full((h, w), 2.0)
    cands = candidates_from_rgbd(
        jax.random.key(0), img, depth, jnp.eye(4), fx, fy, cx, cy,
        downsample=4, max_new=256,
    )
    n = int(jnp.sum(cands.valid))
    assert 0.5 * h * w / 4 < n < 2.0 * h * w / 4
    pts = np.asarray(cands.xyz[np.asarray(cands.valid)])
    np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-5)
    # scales are finite logs
    sc = np.asarray(cands.scaling[np.asarray(cands.valid)])
    assert np.all(np.isfinite(sc))


def test_candidates_masked_depth():
    h, w = 16, 16
    depth = jnp.zeros((h, w)).at[:8].set(2.0)  # bottom half invalid
    cands = candidates_from_rgbd(
        jax.random.key(1), jnp.full((3, h, w), 0.5), depth, jnp.eye(4),
        20.0, 20.0, 8.0, 8.0, downsample=1, max_new=256,
    )
    pts = np.asarray(cands.xyz[np.asarray(cands.valid)])
    assert pts.shape[0] == 8 * 16
    assert np.all(pts[:, 2] > 0)


def test_add_densification_stats():
    gmap = empty_map(CAP)
    adam = init_adam(CAP)
    gmap, adam, _ = insert(gmap, adam, _mk_new(8), kf_id=0)
    g2d = jnp.ones((CAP, 2))
    filt = jnp.zeros(CAP, bool).at[:4].set(True)
    gmap = add_densification_stats(gmap, g2d, filt)
    np.testing.assert_allclose(np.asarray(gmap.grad_accum[:4]), np.sqrt(2), rtol=1e-6)
    assert float(jnp.sum(gmap.grad_accum[4:])) == 0.0


def test_resize_map_grow_and_shrink():
    from fourdgs.models.gaussian_map import resize_map

    gmap = empty_map(CAP)
    adam = init_adam(CAP)
    gmap, adam, _ = insert(gmap, adam, _mk_new(16), kf_id=2)
    adam = adam._replace(mu=jax.tree.map(lambda x: x + 1.0, adam.mu))
    g2, a2 = resize_map(gmap, adam, CAP * 2)
    assert g2.capacity == CAP * 2
    assert int(g2.num_alive) == 16
    np.testing.assert_allclose(np.asarray(a2.mu.xyz[:CAP]), np.asarray(adam.mu.xyz))
    assert float(jnp.abs(a2.mu.xyz[CAP:]).sum()) == 0.0
    # shrink keeps alive slots
    g3, a3 = resize_map(g2, a2, 32)
    assert g3.capacity == 32
    assert int(g3.num_alive) == 16
    np.testing.assert_allclose(
        np.sort(np.asarray(g3.params.xyz[np.asarray(g3.alive)][:, 0])),
        np.sort(np.asarray(gmap.params.xyz[np.asarray(gmap.alive)][:, 0])),
        atol=1e-6,
    )
