import jax
import jax.numpy as jnp
import numpy as np

from fourdgs.models.deform import (
    ControlNodes,
    arap_loss,
    acc_loss,
    elastic_loss,
    init_nodes,
    mlp_forward,
    node_deform,
    nn_weights,
    posenc,
    warp,
)


def _nodes(cap=64, n=32, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(-1, 1, (256, 3)), jnp.float32)
    valid = jnp.ones(256, bool)
    return init_nodes(jax.random.key(seed), cap, pts, valid, node_num=n)


def test_posenc_shape():
    x = jnp.ones((5, 3))
    enc = posenc(x, 10)
    assert enc.shape == (5, 3 * (1 + 2 * 10))


def test_mlp_near_identity_at_init():
    cn = _nodes()
    d_xyz, d_rot, d_scale = node_deform(cn, jnp.float32(0.3))
    # heads are initialized with ~1e-5 std: the warp starts as identity
    assert float(jnp.abs(d_xyz).max()) < 1e-2
    assert float(jnp.abs(d_rot).max()) < 1e-2
    assert float(jnp.abs(d_scale).max()) < 1e-2


def test_nn_weights_normalized_and_local():
    cn = _nodes()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (100, 3)), jnp.float32)
    w, idx = nn_weights(cn, x, k=3)
    np.testing.assert_allclose(np.asarray(jnp.sum(w, axis=-1)), 1.0, atol=1e-5)
    # picked nodes are valid
    assert bool(jnp.all(cn.valid[idx]))


def test_warp_fits_translation():
    """Train the field to move a point cluster linearly in time."""
    cn = _nodes(cap=32, n=16)
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (128, 3)), jnp.float32)
    target_vel = jnp.array([0.5, -0.2, 0.1])

    def loss_fn(mlp, t):
        d_xyz, _, _ = warp(cn._replace(mlp=mlp), pts, t)
        target = target_vel[None, :] * t
        return jnp.mean((d_xyz - target) ** 2)

    import optax

    opt = optax.adam(1e-3)
    mlp = cn.mlp
    state = opt.init(mlp)
    key = jax.random.key(0)

    @jax.jit
    def step(mlp, state, t):
        l, g = jax.value_and_grad(loss_fn)(mlp, t)
        updates, state = opt.update(g, state)
        return optax.apply_updates(mlp, updates), state, l

    l0 = float(loss_fn(mlp, jnp.float32(1.0)))
    for i in range(300):
        key, k = jax.random.split(key)
        t = jax.random.uniform(k, ())
        mlp, state, l = step(mlp, state, t)
    l1 = float(loss_fn(mlp, jnp.float32(1.0)))
    assert l1 < 0.05 * l0, (l0, l1)
    # check the learned warp at t=1
    d_xyz, _, _ = warp(cn._replace(mlp=mlp), pts, jnp.float32(1.0))
    err = float(jnp.mean(jnp.linalg.norm(d_xyz - target_vel[None], axis=-1)))
    assert err < 0.12, err


def test_regularizers_finite_and_zero_at_identity():
    cn = _nodes()
    key = jax.random.key(3)
    a = float(arap_loss(cn, key, jnp.float32(0.5), delta_t=0.05))
    e = float(elastic_loss(cn, key, jnp.float32(0.5), delta_t=0.05))
    c = float(acc_loss(cn, key, jnp.float32(0.5), delta_t=0.05))
    assert np.isfinite(a) and np.isfinite(e) and np.isfinite(c)
    # near-identity field: ARAP energy tiny
    assert a < 1e-4

    # gradients flow to the MLP
    g = jax.grad(
        lambda mlp: arap_loss(cn._replace(mlp=mlp), key, jnp.float32(0.5), 0.05)
        + elastic_loss(cn._replace(mlp=mlp), key, jnp.float32(0.5), 0.05)
    )(cn.mlp)
    flat = jnp.concatenate([jnp.ravel(x) for x in jax.tree.leaves(g)])
    assert bool(jnp.all(jnp.isfinite(flat)))


def test_warp_motion_mask():
    cn = _nodes()
    # force a nonzero field by biasing the warp head
    mlp = cn.mlp._replace(
        head_warp=(cn.mlp.head_warp[0], cn.mlp.head_warp[1] + 0.5)
    )
    cn = cn._replace(mlp=mlp)
    pts = jnp.zeros((10, 3))
    mask = jnp.asarray([1, 1, 1, 1, 1, 0, 0, 0, 0, 0], bool)
    d_xyz, _, _ = warp(cn, pts, jnp.float32(0.5), motion_mask=mask)
    assert float(jnp.abs(d_xyz[:5]).min()) > 0.1
    np.testing.assert_allclose(np.asarray(d_xyz[5:]), 0.0)


def test_extend_nodes():
    from fourdgs.models.deform import extend_nodes

    cn = _nodes(cap=64, n=16)
    rng = np.random.default_rng(5)
    new_pts = jnp.asarray(rng.uniform(2, 3, (128, 3)), jnp.float32)
    cn2 = extend_nodes(cn, jax.random.key(0), new_pts, jnp.ones(128, bool),
                       sample_number=20)
    assert int(jnp.sum(cn2.valid)) == 36
    # old nodes untouched
    np.testing.assert_allclose(
        np.asarray(cn2.nodes[np.asarray(cn.valid)]),
        np.asarray(cn.nodes[np.asarray(cn.valid)]),
    )
    # new nodes come from the new cloud
    newly = np.asarray(cn2.valid & ~cn.valid)
    assert np.all(np.asarray(cn2.nodes)[newly] >= 1.9)
