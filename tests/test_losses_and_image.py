import jax.numpy as jnp
import numpy as np

from fourdgs.ops.image import (
    image_gradient,
    image_gradient_mask,
    grad_intensity_mask,
    ssim,
    psnr,
    dilate3x3,
)
from fourdgs.slam.losses import (
    apply_exposure,
    tracking_loss_rgbd,
    mapping_loss_rgbd,
    pearson_depth_loss,
    isotropic_loss,
    masked_flow_l1,
    median_depth,
)


def _img(rng, c=3, h=32, w=40):
    return jnp.asarray(rng.uniform(size=(c, h, w)), dtype=jnp.float32)


def test_image_gradient_flat_is_zero(rng):
    img = jnp.full((1, 16, 16), 0.5)
    gv, gh = image_gradient(img)
    np.testing.assert_allclose(gv, 0.0, atol=1e-6)
    np.testing.assert_allclose(gh, 0.0, atol=1e-6)


def test_image_gradient_vertical_edge():
    img = jnp.concatenate(
        [jnp.zeros((1, 16, 8)), jnp.ones((1, 16, 8))], axis=-1
    )
    gv, gh = image_gradient(img)
    # horizontal gradient responds at the edge columns
    assert float(jnp.max(jnp.abs(gh))) > 0.4
    # vertical gradient stays ~0 in the interior rows
    assert float(jnp.max(jnp.abs(gv[:, 2:-2, :]))) < 1e-5


def test_image_gradient_mask_dark_pixels():
    img = jnp.zeros((1, 16, 16))
    mv, mh = image_gradient_mask(img)
    assert not bool(jnp.any(mv))
    img = jnp.ones((1, 16, 16))
    mv, mh = image_gradient_mask(img)
    # interior is valid, border (reflect-padded) too since all > eps
    assert bool(jnp.all(mv))


def test_grad_intensity_mask_selects_edges(rng):
    img = jnp.full((3, 32, 32), 0.3)
    img = img.at[:, :, 16:].set(1.0)
    mask = grad_intensity_mask(img, edge_threshold=1.1)
    assert mask.shape == (1, 32, 32)
    assert bool(jnp.any(mask[:, :, 14:18]))
    assert not bool(jnp.any(mask[:, :, :10]))


def test_ssim_identity(rng):
    img = _img(rng)
    assert float(ssim(img, img)) > 0.999
    assert float(ssim(img, 1.0 - img)) < 0.5


def test_psnr_masked(rng):
    img = _img(rng)
    noisy = img.at[:, :16, :].add(0.5)
    mask_clean = jnp.zeros(img.shape[1:], bool).at[16:, :].set(True)
    assert float(psnr(img, noisy, mask_clean)) > 60.0
    assert float(psnr(img, noisy)) < 20.0


def test_dilate3x3():
    m = jnp.zeros((9, 9), bool).at[4, 4].set(True)
    d = dilate3x3(m, iterations=1)
    assert int(jnp.sum(d)) == 9
    d3 = dilate3x3(m, iterations=3)
    assert int(jnp.sum(d3)) == 49


def test_exposure_identity(rng):
    img = _img(rng)
    out = apply_exposure(img, jnp.zeros(()), jnp.zeros(()))
    np.testing.assert_allclose(out, img, atol=1e-7)


def test_tracking_loss_zero_at_gt(rng):
    img = _img(rng)
    depth = jnp.asarray(rng.uniform(1.0, 3.0, size=(32, 40)), dtype=jnp.float32)
    opacity = jnp.ones((32, 40))
    grad_mask = jnp.ones((32, 40), bool)
    loss = tracking_loss_rgbd(img, depth, opacity, img, depth, grad_mask)
    assert float(loss) < 1e-6
    loss2 = tracking_loss_rgbd(img + 0.1, depth, opacity, img, depth, grad_mask)
    assert float(loss2) > float(loss)


def test_tracking_loss_motion_mask_removes_dynamic(rng):
    img = _img(rng)
    depth = jnp.ones((32, 40))
    opacity = jnp.ones((32, 40))
    grad_mask = jnp.ones((32, 40), bool)
    bad = img.at[:, :16, :].add(1.0)  # corrupt top half
    motion = jnp.zeros((32, 40), bool).at[16:, :].set(True)  # top half dynamic
    loss = tracking_loss_rgbd(bad, depth, opacity, img, depth, grad_mask, motion_mask=motion)
    assert float(loss) < 1e-6


def test_mapping_loss_dynamic_upweight(rng):
    img = _img(rng)
    gt = img + 0.1
    depth = jnp.ones((32, 40))
    motion = jnp.zeros((32, 40), bool)  # everything dynamic
    base = mapping_loss_rgbd(img, depth, gt, depth, motion_mask=motion, dynamic=False)
    up = mapping_loss_rgbd(img, depth, gt, depth, motion_mask=motion, dynamic=True)
    np.testing.assert_allclose(float(up), 2 * float(base), rtol=1e-5)


def test_pearson_loss_perfect_correlation(rng):
    gt = jnp.asarray(rng.uniform(1.0, 3.0, size=(32, 40)), dtype=jnp.float32)
    assert float(pearson_depth_loss(gt * 2.0 + 1.0, gt)) < 1e-4
    assert float(pearson_depth_loss(-gt, gt)) > 1.5


def test_isotropic_loss(rng):
    iso = jnp.ones((8, 3)) * jnp.array([[1.0, 1.0, 1.0]])
    alive = jnp.ones(8, bool)
    assert float(isotropic_loss(iso, alive)) < 1e-7
    aniso = jnp.tile(jnp.array([[1.0, 2.0, 3.0]]), (8, 1))
    assert float(isotropic_loss(aniso, alive)) > 0.1
    # dead slots don't contribute
    mixed = jnp.concatenate([iso[:4], aniso[:4] * 100])
    alive_half = jnp.array([True] * 4 + [False] * 4)
    assert float(isotropic_loss(mixed, alive_half)) < 1e-7


def test_masked_flow_l1():
    f1 = jnp.ones((2, 8, 8))
    f2 = jnp.zeros((2, 8, 8))
    mask = jnp.zeros((8, 8), bool).at[:4].set(True)
    np.testing.assert_allclose(float(masked_flow_l1(f1, f2, mask)), 1.0, rtol=1e-5)


def test_median_depth():
    depth = jnp.arange(1, 101, dtype=jnp.float32).reshape(10, 10)
    opacity = jnp.ones((10, 10))
    med, std, valid = median_depth(depth, opacity)
    assert 50.0 <= float(med) <= 51.0
    # masked version
    mask = depth <= 10
    med2, _, _ = median_depth(depth, opacity, mask)
    assert 5.0 <= float(med2) <= 6.0


def test_depth_smoothness_loss():
    from fourdgs.slam.losses import depth_smoothness_loss

    img = jnp.full((3, 32, 32), 0.5)
    flat = jnp.full((32, 32), 2.0)
    assert float(depth_smoothness_loss(flat, img)) < 1e-6
    bumpy = flat.at[:, 16:].set(3.0)
    assert float(depth_smoothness_loss(bumpy, img)) > 1e-3
    # depth discontinuities at image edges are not penalized
    img_edge = img.at[:, :, 16:].set(1.0)
    l_edge = float(depth_smoothness_loss(bumpy, img_edge))
    l_flat_img = float(depth_smoothness_loss(bumpy, img))
    assert l_edge < l_flat_img
