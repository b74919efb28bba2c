import jax
import jax.numpy as jnp
import numpy as np

from fourdgs.geometry import se3_exp
from fourdgs.models.gaussian_map import (
    candidates_from_rgbd,
    empty_map,
    init_adam,
    insert,
)
from fourdgs.ops.rasterize import RasterConfig
from fourdgs.ops.image import psnr
from fourdgs.slam.camera import Intrinsics, make_frame
from fourdgs.slam.keyframes import empty_store, store_keyframe
from fourdgs.slam.mapping import (
    MappingConfig,
    init_pose_adam,
    map_chunk,
    render_keyframe,
    window_visibility,
)

INTR = Intrinsics(fx=80.0, fy=80.0, cx=39.5, cy=29.5, width=80, height=60)
CFG = MappingConfig(
    num_window_views=2,
    num_random_views=1,
    raster=RasterConfig(use_oracle=True),
)


def _gt_scene():
    """A textured fronto-parallel wall at z=3 plus a slab at z=2."""
    h, w = INTR.height, INTR.width
    v, u = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            0.5 + 0.4 * np.sin(u / 5.0),
            0.5 + 0.4 * np.cos(v / 7.0),
            0.5 + 0.3 * np.sin((u + v) / 9.0),
        ]
    ).astype(np.float32)
    depth = np.full((h, w), 3.0, np.float32)
    depth[20:40, 30:60] = 2.0
    return jnp.asarray(img), jnp.asarray(depth)


def _poses():
    taus = [
        np.zeros(6),
        np.array([0.05, 0.0, 0.0, 0.0, 0.02, 0.0]),
        np.array([-0.05, 0.02, 0.0, 0.0, -0.02, 0.01]),
    ]
    return [np.asarray(se3_exp(jnp.asarray(t, jnp.float32))) for t in taus]


def _setup(intr=INTR, cap=2048, downsample=3, min_n=800):
    img, depth = _gt_scene()
    if (intr.height, intr.width) != (INTR.height, INTR.width):
        img = img[:, :intr.height, :intr.width]
        depth = depth[:intr.height, :intr.width]
    # Single RGB-D observation defines the "GT" for all views by warping
    # is complex; instead use the same image/depth for the anchor view and
    # initialize the map from it.
    gmap = empty_map(cap)
    adam = init_adam(cap)
    cands = candidates_from_rgbd(
        jax.random.key(0), img, depth, jnp.eye(4),
        intr.fx, intr.fy, intr.cx, intr.cy,
        downsample=downsample, max_new=cap,
    )
    gmap, adam, n = insert(gmap, adam, cands, kf_id=0)
    assert int(n) > min_n
    store = empty_store(8, intr.height, intr.width)
    frame = make_frame(0, img, depth, jnp.eye(4), time=0.0)
    store = store_keyframe(store, 0, frame, jnp.eye(4), jnp.zeros(2))
    return gmap, adam, store, img, depth


def test_map_chunk_reduces_loss_and_improves_psnr():
    gmap, adam, store, img, depth = _setup()
    window_slots = jnp.array([0, 0], jnp.int32)
    window_valid = jnp.array([True, False])
    opt_pose = jnp.array([False, False])
    rand_pool = jnp.zeros(8, jnp.int32)

    out0 = render_keyframe(gmap, store, jnp.int32(0), INTR, CFG)
    psnr0 = float(psnr(out0.color, img))

    res = map_chunk(
        gmap, adam, store, window_slots, window_valid, opt_pose,
        rand_pool, jnp.int32(0), init_pose_adam(2), jax.random.key(1),
        jnp.int32(15), jnp.int32(-1), jnp.int32(0), INTR, CFG,
    )
    out1 = render_keyframe(res.gmap, res.store, jnp.int32(0), INTR, CFG)
    psnr1 = float(psnr(out1.color, img))
    assert np.isfinite(float(res.final_loss))
    # 15 iters on a 1-core CI box: direction, not convergence (the full
    # schedule is exercised by the slow-marked e2e runs)
    assert psnr1 > psnr0 + 1.0, (psnr0, psnr1)
    # depth should move toward GT where confidently rendered (few iters
    # of a fresh map: coarse agreement, tight fit needs the full schedule)
    gt = np.asarray(depth)
    # depth error (confident pixels) must not regress vs the fresh map
    def med_err(out):
        dd = np.asarray(out.depth)
        aa = np.asarray(out.alpha)
        conf = aa > min(0.6, float(np.quantile(aa, 0.9)))
        e = np.abs(dd - gt)[conf]
        return float(np.median(e)) if e.size else np.inf

    assert med_err(out1) <= med_err(out0) * 1.2


def test_map_chunk_pose_refinement():
    """Perturb the stored keyframe pose; with opt_pose on, mapping should
    pull it back toward the true pose while fitting the map."""
    # half-size map: pose-gradient direction is independent of density,
    # and this is one of the costliest fast-gate tests on the 1-core box
    gmap, adam, store, img, depth = _setup(cap=1024, downsample=4,
                                           min_n=400)
    tau = jnp.array([0.02, -0.01, 0.01, 0.004, -0.003, 0.002])
    T_pert = se3_exp(tau) @ jnp.eye(4)
    # second slot: same observations, perturbed pose estimate, uid != 0
    frame1 = make_frame(7, img, depth, jnp.eye(4), time=0.1)
    store = store_keyframe(store, 1, frame1, T_pert, jnp.zeros(2))

    window_slots = jnp.array([0, 1], jnp.int32)
    window_valid = jnp.array([True, True])
    opt_pose = jnp.array([False, True])
    err0 = float(jnp.linalg.norm(store.T_cw[1][:3, 3]))

    res = map_chunk(
        gmap, adam, store, window_slots, window_valid, opt_pose,
        jnp.zeros(8, jnp.int32), jnp.int32(0), init_pose_adam(2),
        jax.random.key(2), jnp.int32(25), jnp.int32(-1), jnp.int32(0),
        INTR, CFG,
    )
    err1 = float(jnp.linalg.norm(res.store.T_cw[1][:3, 3]))
    assert err1 < err0, (err0, err1)
    # slot 0 pose must be untouched (opt_pose False)
    np.testing.assert_allclose(np.asarray(res.store.T_cw[0]), np.eye(4), atol=1e-6)


def test_window_visibility():
    gmap, adam, store, img, depth = _setup()
    vis = window_visibility(
        gmap, store,
        jnp.array([0, 0], jnp.int32), jnp.array([True, False]), INTR, CFG,
    )
    assert vis.shape == (2, gmap.capacity)
    assert int(jnp.sum(vis[0])) > 100
    assert int(jnp.sum(vis[1])) == 0


def test_expon_lr_matches_reference_helper():
    """expon_lr must reproduce the reference `helper`
    (gaussian_splatting/scene/gaussian_model.py:79-97) with
    lr_delay_steps=0 (the update_learning_rate call path): pure
    log-linear interpolation, no delay easing at step 0."""
    from fourdgs.models.gaussian_map import expon_lr

    lr_init, lr_final, max_steps = 0.00016 * 6, 1.6e-6 * 6, 30000
    for step in [0, 1, 100, 5000, 15000, 30000, 50000]:
        t = np.clip(step / max_steps, 0, 1)
        expected = np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
        got = float(expon_lr(jnp.float32(step), lr_init, lr_final,
                             max_steps=max_steps))
        np.testing.assert_allclose(got, expected, rtol=1e-5), step
    # step 0 must give exactly lr_init (no 1% delay factor)
    np.testing.assert_allclose(
        float(expon_lr(jnp.float32(0), lr_init, lr_final, max_steps=max_steps)),
        lr_init, rtol=1e-6,
    )


def test_map_chunk_xyz_lr_schedule():
    """iter_base at the end of the schedule must shrink xyz movement by
    ~the lr ratio (0.01) while leaving other fields' steps unchanged
    (only the xyz param group is scheduled — reference
    update_learning_rate loops param_groups and touches name=='xyz'
    only)."""
    gmap, adam, store, img, depth = _setup()
    window_slots = jnp.array([0, 0], jnp.int32)
    window_valid = jnp.array([True, False])
    opt_pose = jnp.array([False, False])
    args = (window_slots, window_valid, opt_pose, jnp.zeros(8, jnp.int32),
            jnp.int32(0), init_pose_adam(2), jax.random.key(3),
            jnp.int32(1), jnp.int32(-1))

    res_hi = map_chunk(gmap, adam, store, *args, jnp.int32(0), INTR, CFG)
    res_lo = map_chunk(gmap, adam, store, *args, jnp.int32(CFG.xyz_lr_max_steps), INTR, CFG)

    d_hi = np.abs(np.asarray(res_hi.gmap.params.xyz - gmap.params.xyz)).max()
    d_lo = np.abs(np.asarray(res_lo.gmap.params.xyz - gmap.params.xyz)).max()
    assert d_hi > 0
    np.testing.assert_allclose(d_lo / d_hi, CFG.xyz_lr_ratio, rtol=0.05)
    # non-xyz fields identical between the two runs
    np.testing.assert_allclose(
        np.asarray(res_hi.gmap.params.opacity),
        np.asarray(res_lo.gmap.params.opacity), atol=1e-7,
    )


def test_refine_picks_uniform_over_history():
    """color_refinement view sampling must reach late keyframes uniformly
    (reference slam_backend.py:783-789 pops 10 random keyframes from the
    FULL history each iteration — not a fixed early window)."""
    from fourdgs.slam.mapping import refine_picks

    pool = jnp.asarray(np.arange(100, 140, dtype=np.int32))  # 40 keyframes
    pool = jnp.pad(pool, (0, 24))                            # padded tail
    size = jnp.int32(40)
    counts = np.zeros(64, np.int64)
    nv = 10
    n_iter = 400
    rp = jax.jit(refine_picks, static_argnums=3)
    for i in range(n_iter):
        slots, valids = rp(jax.random.key(i), pool, size, nv)
        s = np.asarray(slots)[np.asarray(valids)]
        assert len(set(s.tolist())) == nv        # distinct picks
        assert ((s >= 100) & (s < 140)).all()    # only valid pool entries
        np.add.at(counts, s - 100, 1)
    sel = counts[:40]
    expected = n_iter * nv / 40
    # every keyframe (early AND late) selected within 3 sigma of uniform
    sigma = np.sqrt(expected * (1 - nv / 40))
    assert sel.min() > expected - 4 * sigma, sel
    assert sel.max() < expected + 4 * sigma, sel


def test_refine_picks_small_pool():
    from fourdgs.slam.mapping import refine_picks

    pool = jnp.asarray(np.array([3, 7, 0, 0, 0, 0, 0, 0], np.int32))
    slots, valids = refine_picks(jax.random.key(0), pool, jnp.int32(2), 10)
    s = np.asarray(slots)[np.asarray(valids)]
    assert sorted(s.tolist()) == [3, 7]
