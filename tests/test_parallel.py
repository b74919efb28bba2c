"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs.models.gaussian_map import empty_map, init_adam, insert
from fourdgs.ops.rasterize import RasterConfig
from fourdgs.parallel import batch_render_sharded, make_mesh, sharded_map_step
from fourdgs.slam.camera import Intrinsics
from tests.test_tracking import build_map  # reuse synthetic map builder

INTR = Intrinsics(fx=80.0, fy=80.0, cx=39.5, cy=29.5, width=80, height=60)
RASTER = RasterConfig(use_oracle=True)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(8)


def _shard(mesh, tree, spec_axis=0):
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def test_sharded_map_step_runs_and_descends(mesh):
    gmap, _ = build_map(n=96, cap=128)
    # targets: renders at 8 poses of the GT map
    from fourdgs.ops.rasterize import rasterize
    from tests.test_tracking import render_gt

    poses = jnp.stack([jnp.eye(4)] * 8)
    target = render_gt(gmap, jnp.eye(4))
    images = jnp.stack([target.color] * 8)
    depths = jnp.stack([target.depth] * 8)

    # corrupt colors, then fit them back with the sharded step
    params = gmap.params._replace(f_dc=gmap.params.f_dc * 0.0)
    mu = jax.tree.map(jnp.zeros_like, params)
    nu = jax.tree.map(jnp.zeros_like, params)

    params, mu, nu = (_shard(mesh, t) for t in (params, mu, nu))
    alive = _shard(mesh, gmap.alive)
    images, depths, poses = (_shard(mesh, t) for t in (images, depths, poses))

    step = sharded_map_step(mesh, INTR, RASTER)
    count = jnp.zeros((), jnp.int32)
    losses = []
    for _ in range(5):
        params, mu, nu, count, loss = step(
            params, mu, nu, alive, count, images, depths, poses
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.all(np.isfinite(losses))


def test_batch_render_sharded_matches_single(mesh):
    gmap, _ = build_map(n=96, cap=128)
    from tests.test_tracking import render_gt

    poses = jnp.stack([jnp.eye(4)] * 8)
    render = batch_render_sharded(mesh, INTR, RASTER)
    colors, depths, alphas = render(gmap.params, gmap.alive, poses)
    assert colors.shape == (8, 3, INTR.height, INTR.width)
    ref = render_gt(gmap, jnp.eye(4))
    np.testing.assert_allclose(np.asarray(colors[3]), np.asarray(ref.color), atol=1e-5)
