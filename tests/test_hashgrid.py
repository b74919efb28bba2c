import jax
import jax.numpy as jnp
import numpy as np

from fourdgs.models.hashgrid import hash_deform, hash_encode, init_hashgrid


def test_hash_encode_shapes_and_continuity():
    hp = init_hashgrid(jax.random.key(0), n_levels=6, log2_table=12)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(-1, 1, (32, 3)), jnp.float32)
    f = hash_encode(hp, xyz)
    assert f.shape == (32, 12)
    # continuity: nearby points give nearby features
    eps = 1e-4
    f2 = hash_encode(hp, xyz + eps)
    assert float(jnp.abs(f - f2).max()) < 1e-4


def test_hash_deform_near_identity_and_fits():
    import optax

    hp = init_hashgrid(jax.random.key(1), n_levels=8, log2_table=13)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-1, 1, (256, 3)), jnp.float32)
    dx, dr, ds = hash_deform(hp, pts, jnp.float32(0.5))
    assert float(jnp.abs(dx).max()) < 1e-2  # near-identity init

    def loss_fn(hp, t):
        dx, _, _ = hash_deform(hp, pts, t)
        return jnp.mean((dx - jnp.array([0.2, -0.1, 0.0]) * t) ** 2)

    opt = optax.adam(5e-3)
    state = opt.init(hp)

    @jax.jit
    def step(hp, state, t):
        l, g = jax.value_and_grad(loss_fn)(hp, t)
        updates, state = opt.update(g, state)
        return optax.apply_updates(hp, updates), state, l

    l0 = float(loss_fn(hp, jnp.float32(1.0)))
    key = jax.random.key(0)
    for _ in range(200):
        key, k = jax.random.split(key)
        hp, state, _ = step(hp, state, jax.random.uniform(k, ()))
    l1 = float(loss_fn(hp, jnp.float32(1.0)))
    assert l1 < 0.1 * l0, (l0, l1)
