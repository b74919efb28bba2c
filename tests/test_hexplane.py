import jax
import jax.numpy as jnp
import numpy as np

from fourdgs.models.hexplane import (
    get_dynamic_mask,
    hexplane_deform,
    hexplane_features,
    init_hexplane,
    l1_time_planes_loss,
    plane_tv_loss,
    time_smoothness_loss,
    _grid_sample_2d,
)


def _hp(res=(8, 8, 8, 5), multires=(1, 2)):
    return init_hexplane(jax.random.key(0), resolution=res, multires=multires,
                         out_dim=8, width=16)


def test_grid_sample_corners_and_center():
    plane = jnp.arange(12.0).reshape(1, 3, 4)  # C=1, H=3, W=4
    uv = jnp.array([[0.0, 0.0], [1.0, 1.0], [1 / 3, 0.5]])
    out = _grid_sample_2d(plane, uv)
    np.testing.assert_allclose(out[0, 0], 0.0)
    np.testing.assert_allclose(out[1, 0], 11.0)
    np.testing.assert_allclose(out[2, 0], 5.0, atol=1e-5)  # (x=1, y=1) -> row1 col1


def test_feature_shapes_and_near_identity():
    hp = _hp()
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)
    feats = hexplane_features(hp, xyz, jnp.float32(0.5))
    assert feats.shape == (64, 16)
    dx, ds, dr = hexplane_deform(hp, xyz, jnp.float32(0.5))
    assert dx.shape == (64, 3) and ds.shape == (64, 3) and dr.shape == (64, 4)
    # 1e-5 head init: near-identity field
    assert float(jnp.abs(dx).max()) < 1e-2


def test_dynamic_mask_thresholds():
    hp = _hp()
    xyz = jnp.zeros((16, 3))
    mask = get_dynamic_mask(hp, xyz, jnp.float32(0.5))
    assert mask.shape == (16,)
    assert not bool(mask.any())  # identity field -> static
    hp2 = hp._replace(dx_b=hp.dx_b + 1.0)
    assert bool(get_dynamic_mask(hp2, xyz, jnp.float32(0.5)).all())


def test_regularizers():
    hp = _hp()
    tv = float(plane_tv_loss(hp))
    ts = float(time_smoothness_loss(hp))
    l1 = float(l1_time_planes_loss(hp))
    assert np.isfinite(tv) and np.isfinite(ts) and np.isfinite(l1)
    # constant planes: zero TV / smoothness; identity planes: zero L1
    ident = hp._replace(planes=tuple(jnp.ones_like(p) for p in hp.planes))
    assert float(plane_tv_loss(ident)) == 0.0
    assert float(time_smoothness_loss(ident)) == 0.0
    assert float(l1_time_planes_loss(ident)) == 0.0


def test_field_fits_motion():
    """Train the hexplane to a time-varying translation."""
    import optax

    hp = _hp(res=(8, 8, 8, 8), multires=(1, 2))
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-1, 1, (128, 3)), jnp.float32)

    def loss_fn(hp, t):
        dx, _, _ = hexplane_deform(hp, pts, t)
        target = jnp.array([0.3, 0.0, -0.2]) * t
        return jnp.mean((dx - target[None]) ** 2)

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
