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
# small-scene intrinsics for the mesh-vs-single equivalence tests
INTR_S = Intrinsics(fx=60.0, fy=60.0, cx=23.5, cy=15.5, width=48, height=32)
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


def test_map_chunk_sharded_matches_single_device(mesh):
    """The PRODUCTION mapping step under shard_map (views sharded over the
    mesh, map replicated, grads psum'd) must match the single-device
    `map_chunk` — same window/replay picks, pose+exposure optimization,
    isotropic loss, densification stats — after several iterations."""
    from tests.test_mapping import CFG, _setup
    from fourdgs.slam.mapping import init_pose_adam, map_chunk

    MINTR = INTR_S  # small scene: equivalence is scale-independent and
    #                 8 virtual devices serialize on this 1-core box
    gmap, adam, store, img, depth = _setup(MINTR, cap=512, downsample=4,
                                           min_n=100)
    window_slots = jnp.array([0, 0], jnp.int32)
    window_valid = jnp.array([True, False])
    opt_pose = jnp.array([False, True])
    args = (window_slots, window_valid, opt_pose, jnp.zeros(8, jnp.int32),
            jnp.int32(0), init_pose_adam(2), jax.random.key(5),
            jnp.int32(3), jnp.int32(-1), jnp.int32(0), MINTR, CFG)

    res1 = map_chunk(gmap, adam, store, *args)
    res8 = map_chunk(gmap, adam, store, *args, mesh=mesh)

    # measured float-reassociation noise at 3 iters is ~1e-6 (psum order
    # vs single-sum); Adam amplifies sign flips of near-zero grads, so
    # longer horizons diverge chaotically even for identical math
    np.testing.assert_allclose(
        float(res8.final_loss), float(res1.final_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(res1.gmap.params),
                    jax.tree.leaves(res8.gmap.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(res1.store.T_cw), np.asarray(res8.store.T_cw), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(res1.gmap.denom), np.asarray(res8.gmap.denom), atol=0)
    np.testing.assert_allclose(
        np.asarray(res1.gmap.grad_accum), np.asarray(res8.gmap.grad_accum),
        atol=1e-5)


def test_map_chunk_dynamic_sharded_matches_single_device(mesh):
    """The PRODUCTION dynamic mapping step under shard_map (the padded
    view set — main + flow renders — sharded over the mesh, map and
    deform field replicated, grads psum'd) must match the single-device
    `map_chunk_dynamic`: same deform warp, flow losses, ARAP/elastic
    regularizers, pose+exposure and deform Adam steps."""
    from fourdgs.models.deform import init_nodes
    from fourdgs.slam.camera import make_frame
    from fourdgs.slam.keyframes import store_keyframe
    from fourdgs.slam.mapping import init_pose_adam
    from fourdgs.slam.mapping_dynamic import init_deform_adam, map_chunk_dynamic
    from tests.test_mapping import CFG, _setup

    MINTR = INTR_S
    gmap, adam, store, img, depth = _setup(MINTR, cap=512, downsample=4,
                                           min_n=100)
    # mark a block of alive Gaussians dynamic and hang control nodes on them
    dygs = np.zeros(gmap.capacity, bool)
    dygs[np.nonzero(np.asarray(gmap.alive))[0][:64]] = True
    gmap = gmap._replace(dygs=jnp.asarray(dygs))
    deform = init_nodes(
        jax.random.key(1), 32, gmap.params.xyz, jnp.asarray(dygs), node_num=16
    )
    dadam = init_deform_adam(deform)

    # second keyframe at a slightly moved pose: view 0's flow pair
    frame1 = make_frame(1, img, depth, jnp.eye(4), time=0.5)
    store = store_keyframe(store, 1, frame1, jnp.eye(4), jnp.zeros(2))
    vw = CFG.num_window_views
    h, w = MINTR.height, MINTR.width
    pair_slots = jnp.array([1, -1], jnp.int32)
    fwd = jnp.full((vw, 2, h, w), 0.01, jnp.float32)
    bwd = jnp.full((vw, 2, h, w), -0.01, jnp.float32)

    args = dict(
        window_slots=jnp.array([0, 1], jnp.int32),
        window_valid=jnp.array([True, True]),
        opt_pose=jnp.array([False, True]),
        flow_pair_slots=pair_slots, flow_fwd=fwd, flow_bwd=bwd,
        rand_pool=jnp.zeros(8, jnp.int32), rand_pool_size=jnp.int32(2),
        pose_adam=init_pose_adam(vw), key=jax.random.key(5),
        num_iters=jnp.int32(2), step_after=jnp.int32(-1),
        iter_base=jnp.int32(0), intr=MINTR, cfg=CFG,
        flow_weight=3.0, flow_weight_fine=2.0, time_interval=0.01,
    )
    res1 = map_chunk_dynamic(gmap, adam, store, deform, dadam, **args)
    res8 = map_chunk_dynamic(gmap, adam, store, deform, dadam, **args, mesh=mesh)

    np.testing.assert_allclose(
        float(res8.final_loss), float(res1.final_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(res1.gmap.params),
                    jax.tree.leaves(res8.gmap.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # deform Adam runs at eps=1e-15 (reference parity): psum float
    # reassociation on near-zero MLP grads is amplified to ~lr-scale
    # (measured 4e-5 after 2 iters, identical at 1 iter) — structural
    # equivalence is what this asserts, hence the looser bound
    for a, b in zip(jax.tree.leaves(res1.deform),
                    jax.tree.leaves(res8.deform)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(res1.store.T_cw), np.asarray(res8.store.T_cw), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(res1.gmap.grad_accum), np.asarray(res8.gmap.grad_accum),
        atol=1e-5)


@pytest.mark.slow
def test_map_chunk_sharded_production_window_across_densify(mesh):
    """Mesh-vs-single equivalence at the PRODUCTION view set (8 window +
    2 replay views) on the real Pallas compositor (interpret mode on
    CPU), across a rebin boundary (3 iters > rebin_every=2) and a
    host-side densify/prune boundary between two chunks — the structure
    change every real mapping phase goes through."""
    from fourdgs.models.gaussian_map import densify_and_prune
    from fourdgs.slam.camera import make_frame
    from fourdgs.slam.keyframes import store_keyframe
    from fourdgs.slam.mapping import MappingConfig, init_pose_adam, map_chunk
    from tests.test_mapping import INTR as MINTR, _setup

    cfg = MappingConfig(
        num_window_views=8, num_random_views=2, rebin_every=2,
        raster=RasterConfig(
            tile_cap=128, max_pairs=1 << 14, with_n_touched=False
        ),
    )
    gmap, adam, store, img, depth = _setup()
    # fill 8 window slots with perturbed-pose observations
    from fourdgs.geometry import se3_exp

    for s in range(1, 8):
        tau = jnp.asarray(
            np.array([0.01 * s, -0.005 * s, 0.0, 0.0, 0.002 * s, 0.0]),
            jnp.float32,
        )
        frame = make_frame(s, img, depth, jnp.eye(4), time=0.1 * s)
        store = store_keyframe(
            store, s, frame, se3_exp(tau), jnp.zeros(2)
        )
    slots = jnp.arange(8, dtype=jnp.int32)
    valid = jnp.ones(8, bool)
    opt_pose = jnp.array([False] + [True] * 7)
    args = (slots, valid, opt_pose, jnp.arange(8, dtype=jnp.int32),
            jnp.int32(8), init_pose_adam(8), jax.random.key(7),
            jnp.int32(3), jnp.int32(-1), jnp.int32(0), MINTR, cfg)

    def run(mesh_arg):
        r = map_chunk(gmap, adam, store, *args, mesh=mesh_arg)
        g2, a2 = densify_and_prune(
            r.gmap, r.adam, jax.random.key(11), 1e-7, 0.005, 1.0, 20,
        )
        args2 = (slots, valid, opt_pose, jnp.arange(8, dtype=jnp.int32),
                 jnp.int32(8), init_pose_adam(8), jax.random.key(9),
                 jnp.int32(2), jnp.int32(-1), jnp.int32(3), MINTR, cfg)
        return map_chunk(g2, a2, r.store, *args2, mesh=mesh_arg), r, g2

    res1, r1, g1 = run(None)
    res8, r8, g8 = run(mesh)

    # tight agreement at the first-chunk boundary (3 iters, one internal
    # rebin at iter 2). With fresh Adam moments the very first step is
    # lr*sign(g) per element, so a reassociation sign flip on a near-zero
    # gradient component lands a full-LR quantum of difference: assert
    # the BULK is tight (99% of elements within 2e-4) and the outliers
    # stay at LR scale (measured 0.7% of xyz at <=1.4e-3 for identical
    # math on 10 summed views)
    np.testing.assert_allclose(
        float(r8.final_loss), float(r1.final_loss), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(r1.gmap.params),
                    jax.tree.leaves(r8.gmap.params)):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert float(np.quantile(d, 0.95)) < 2e-4, float(np.quantile(d, 0.95))
        assert float(np.quantile(d, 0.99)) < 1e-3, float(np.quantile(d, 0.99))
        assert float(d.max()) < 1e-2, float(d.max())
    np.testing.assert_allclose(
        np.asarray(r1.store.T_cw), np.asarray(r8.store.T_cw), atol=5e-5)
    # identical densify decisions (structure change) on both paths —
    # clone/split/prune masks depend on accumulated grad stats
    np.testing.assert_array_equal(np.asarray(g1.alive), np.asarray(g8.alive))
    # past the densify, freshly-zeroed Adam moments turn reassociation
    # sign flips on near-zero grads into full-LR step divergence
    # (measured ~5e-3 after 3 iters for identical math), so the
    # second-chunk claim is structural: same loss to 0.2%, params within
    # an LR-scale envelope, all finite
    np.testing.assert_allclose(
        float(res8.final_loss), float(res1.final_loss), rtol=2e-3)
    for a, b in zip(jax.tree.leaves(res1.gmap.params),
                    jax.tree.leaves(res8.gmap.params)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
        np.testing.assert_allclose(a, b, atol=3e-2)
    # chunk 2 re-inits pose Adam: first steps are lr*sign(g), so flipped
    # near-zero pose-grad components differ by LR quanta (lr_rot 1.5e-3)
    np.testing.assert_allclose(
        np.asarray(res1.store.T_cw), np.asarray(res8.store.T_cw), atol=2e-3)


def test_batch_render_sharded_matches_single(mesh):
    gmap, _ = build_map(n=96, cap=128)
    from tests.test_tracking import render_gt

    poses = jnp.stack([jnp.eye(4)] * 8)
    render = batch_render_sharded(mesh, INTR, RASTER)
    colors, depths, alphas = render(gmap.params, gmap.alive, poses)
    assert colors.shape == (8, 3, INTR.height, INTR.width)
    ref = render_gt(gmap, jnp.eye(4))
    np.testing.assert_allclose(np.asarray(colors[3]), np.asarray(ref.color), atol=1e-5)
