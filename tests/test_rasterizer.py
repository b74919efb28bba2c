import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs.geometry import projection_matrix, se3_exp
from fourdgs.geometry.quaternion import quat_normalize
from fourdgs.ops.rasterize import RasterConfig, rasterize

W, H = 64, 48
FX = FY = 60.0
CX, CY = (W - 1) / 2.0, (H - 1) / 2.0
TANX = W / (2 * FX)
TANY = H / (2 * FY)

CFG_ORACLE = RasterConfig(use_oracle=True)
CFG_PALLAS = RasterConfig(tile_cap=128, max_pairs=1 << 14)

PROJ = projection_matrix(FX, FY, CX, CY, W, H)
BG = jnp.zeros(3)


def make_scene(seed=0, n=48):
    rng = np.random.default_rng(seed)
    means = np.stack(
        [
            rng.uniform(-1.2, 1.2, n),
            rng.uniform(-0.9, 0.9, n),
            rng.uniform(2.0, 6.0, n),
        ],
        axis=-1,
    ).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.05), np.log(0.3), (n, 3))).astype(np.float32)
    quats = quat_normalize(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    alive = np.ones(n, bool)
    return (
        jnp.asarray(means),
        jnp.asarray(scales),
        quats,
        jnp.asarray(opac),
        jnp.asarray(colors),
        jnp.asarray(alive),
    )


def render(scene, T_cw=None, config=CFG_ORACLE, bg=BG):
    if T_cw is None:
        T_cw = jnp.eye(4)
    return rasterize(
        *scene,
        T_cw,
        PROJ,
        bg,
        fx=FX,
        fy=FY,
        width=W,
        height=H,
        tan_fovx=TANX,
        tan_fovy=TANY,
        config=config,
    )


def test_oracle_single_gaussian_center():
    scene = (
        jnp.array([[0.0, 0.0, 3.0]]),
        jnp.full((1, 3), 0.3),
        jnp.array([[1.0, 0.0, 0.0, 0.0]]),
        jnp.array([0.9]),
        jnp.array([[1.0, 0.2, 0.1]]),
        jnp.array([True]),
    )
    out = render(scene)
    cx, cy = int(CX), int(CY)
    # peak opacity at the projected center
    assert float(out.alpha[cy, cx]) > 0.85
    # color at center ~ alpha * gaussian color
    np.testing.assert_allclose(
        out.color[:, cy, cx],
        np.array([1.0, 0.2, 0.1]) * float(out.alpha[cy, cx]),
        rtol=2e-2,
    )
    # depth is alpha-weighted camera z
    np.testing.assert_allclose(
        float(out.depth[cy, cx]), 3.0 * float(out.alpha[cy, cx]), rtol=2e-2
    )
    # corners untouched
    assert float(out.alpha[0, 0]) < 1e-3
    assert int(out.n_touched[0]) > 10


def test_oracle_background():
    scene = make_scene(1, 8)
    bg = jnp.array([0.1, 0.5, 0.9])
    out = render(scene, bg=bg)
    empty = out.alpha < 1e-6
    assert bool(jnp.any(empty))
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(out.color[c])[np.asarray(empty)], float(bg[c]), atol=1e-5
        )


def test_oracle_depth_ordering():
    # an opaque near Gaussian must occlude a far one
    scene = (
        jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 5.0]]),
        jnp.full((2, 3), 0.5),
        jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (2, 1)),
        jnp.array([0.99, 0.99]),
        jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
        jnp.array([True, True]),
    )
    out = render(scene)
    cx, cy = int(CX), int(CY)
    assert float(out.color[0, cy, cx]) > 0.9  # red in front
    assert float(out.color[1, cy, cx]) < 0.1


def test_oracle_alive_mask():
    scene = list(make_scene(2, 16))
    out_all = render(tuple(scene))
    scene[5] = scene[5].at[:8].set(False)
    out_masked = render(tuple(scene))
    # masked render differs and only uses the last 8
    scene2 = tuple(x[8:] for x in make_scene(2, 16))
    out_sub = render(scene2)
    np.testing.assert_allclose(out_masked.color, out_sub.color, atol=1e-5)
    assert not np.allclose(out_all.color, out_masked.color, atol=1e-3)


def test_pallas_matches_oracle():
    scene = make_scene(3, 48)
    ref = render(scene, config=CFG_ORACLE)
    out = render(scene, config=CFG_PALLAS)
    np.testing.assert_allclose(out.color, ref.color, atol=2e-5)
    np.testing.assert_allclose(out.depth, ref.depth, atol=2e-4)
    np.testing.assert_allclose(out.alpha, ref.alpha, atol=2e-5)
    np.testing.assert_array_equal(out.n_touched, ref.n_touched)


def test_pallas_matches_oracle_dense_overlap():
    # many overlapping gaussians on one tile to exercise termination
    rng = np.random.default_rng(4)
    n = 96
    scene = (
        jnp.asarray(
            np.stack(
                [rng.normal(0, 0.05, n), rng.normal(0, 0.05, n), rng.uniform(2, 4, n)],
                -1,
            ),
            jnp.float32,
        ),
        jnp.full((n, 3), 0.2),
        quat_normalize(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)),
        jnp.asarray(rng.uniform(0.7, 0.99, n), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
        jnp.ones(n, bool),
    )
    ref = render(scene, config=CFG_ORACLE)
    out = render(scene, config=CFG_PALLAS)
    np.testing.assert_allclose(out.color, ref.color, atol=5e-5)
    np.testing.assert_allclose(out.alpha, ref.alpha, atol=5e-5)
    np.testing.assert_array_equal(out.n_touched, ref.n_touched)


def _loss_fn(config):
    def loss(means, scales, quats, opac, colors, tau):
        T_cw = se3_exp(tau) @ jnp.eye(4)
        out = rasterize(
            means, scales, quats, opac, colors, jnp.ones(means.shape[0], bool),
            T_cw, PROJ, BG,
            fx=FX, fy=FY, width=W, height=H,
            tan_fovx=TANX, tan_fovy=TANY, config=config,
        )
        target_c = 0.3
        target_d = 2.5
        return (
            jnp.mean((out.color - target_c) ** 2)
            + 0.3 * jnp.mean((out.depth - target_d) ** 2)
            + 0.1 * jnp.mean(out.alpha)
        )

    return loss


def test_pallas_gradients_match_oracle():
    means, scales, quats, opac, colors, _ = make_scene(5, 32)
    tau = jnp.zeros(6)
    args = (means, scales, quats, opac, colors, tau)
    g_ref = jax.grad(_loss_fn(CFG_ORACLE), argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_out = jax.grad(_loss_fn(CFG_PALLAS), argnums=(0, 1, 2, 3, 4, 5))(*args)
    names = ["means", "scales", "quats", "opac", "colors", "tau"]
    for name, a, b in zip(names, g_ref, g_out):
        scale = np.maximum(np.abs(np.asarray(a)).max(), 1e-4)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-3 * scale, err_msg=name
        )


@pytest.mark.parametrize("argnum,eps", [(5, 3e-3), (3, 1e-3)])
def test_finite_difference_grads(argnum, eps):
    """FD vs autodiff. Tolerances are loose for the pose (argnum 5): the
    tile-rect membership and depth-sort are discrete (exactly as in the
    CUDA rasterizer), so finite differences cross non-differentiable
    boundaries that autodiff correctly ignores."""
    means, scales, quats, opac, colors, _ = make_scene(6, 16)
    tau = jnp.zeros(6)
    args = [means, scales, quats, opac, colors, tau]
    loss = _loss_fn(CFG_ORACLE)
    g = jax.grad(loss, argnums=argnum)(*args)
    g = np.asarray(g).ravel()
    x0 = np.asarray(args[argnum], np.float64).ravel()
    num = np.zeros_like(x0)
    f = lambda v: float(
        loss(*[jnp.asarray(v.reshape(np.shape(args[i])), jnp.float32) if i == argnum else args[i] for i in range(6)])
    )
    for j in range(x0.size):
        xp, xm = x0.copy(), x0.copy()
        xp[j] += eps
        xm[j] -= eps
        num[j] = (f(xp) - f(xm)) / (2 * eps)
    scale = max(np.abs(num).max(), 1e-5)
    np.testing.assert_allclose(g, num, atol=1.2e-1 * scale)
    # direction must agree tightly even where magnitudes are FD-noisy
    cos = np.dot(g, num) / (np.linalg.norm(g) * np.linalg.norm(num) + 1e-12)
    assert cos > 0.99


def test_pose_gradient_descends():
    """A gradient step on tau from a perturbed pose must reduce photometric
    error against the unperturbed render (the tracking principle)."""
    scene = make_scene(7, 48)
    target = render(scene, T_cw=jnp.eye(4), config=CFG_ORACLE)

    def phot(tau):
        T = se3_exp(tau) @ jnp.eye(4)
        out = render(scene, T_cw=T, config=CFG_ORACLE)
        return jnp.mean(jnp.abs(out.color - target.color))

    tau0 = jnp.array([0.02, -0.01, 0.015, 0.004, -0.006, 0.005])
    l0 = float(phot(tau0))
    g = jax.grad(phot)(tau0)
    assert np.all(np.isfinite(np.asarray(g)))
    gn = g / (jnp.linalg.norm(g) + 1e-8)
    losses = [float(phot(tau0 - s * gn)) for s in (0.002, 0.005, 0.01, 0.02)]
    assert min(losses) < l0


def test_radius_capped_gaussian_not_over_culled():
    """Opacity-aware tile culling must use the UNCAPPED 3-sigma radius:
    for a Gaussian whose footprint radius is capped by config.max_radius
    and whose opacity is low (common mid-optimization), the capped
    radius understates the true spread and (before the fix) dropped
    in-rect tiles whose alpha is still above 1/255 — the CSR render then
    diverged from the oracle on exactly those tiles. Same max_rect on
    both paths -> identical footprint rects, so full-image parity must
    be exact."""
    # sigma ~ 16 px at z=3 (fx=60): 3-sigma 48 -> radius capped to 24
    means = jnp.asarray([[0.0, 0.0, 3.0]], jnp.float32)
    scales = jnp.full((1, 3), 0.8, jnp.float32)
    quats = jnp.asarray([[1.0, 0, 0, 0]], jnp.float32)
    opac = jnp.asarray([0.05], jnp.float32)   # low op shrinks d_max
    colors = jnp.asarray([[1.0, 0.5, 0.25]], jnp.float32)
    alive = jnp.ones(1, bool)
    T = jnp.eye(4, dtype=jnp.float32)

    kw = dict(fx=FX, fy=FY, width=W, height=H, tan_fovx=TANX, tan_fovy=TANY)
    out_o = rasterize(means, scales, quats, opac, colors, alive, T, PROJ,
                      BG, config=CFG_ORACLE, **kw)
    out_p = rasterize(means, scales, quats, opac, colors, alive, T, PROJ,
                      BG, config=CFG_PALLAS, **kw)
    np.testing.assert_allclose(
        np.asarray(out_p.color), np.asarray(out_o.color), atol=5e-4,
    )
    # the far in-rect tiles genuinely contribute (alpha ~ 0.02 there)
    assert float(np.asarray(out_o.alpha)[2, 8]) > 1e-3
