import jax
import jax.numpy as jnp
import numpy as np

from fourdgs.geometry import projection_matrix, se3_exp
from fourdgs.ops.rasterize import RasterConfig, render_flow

W, H = 64, 48
FX = FY = 60.0
CX, CY = (W - 1) / 2.0, (H - 1) / 2.0
PROJ = projection_matrix(FX, FY, CX, CY, W, H)
KW = dict(fx=FX, fy=FY, width=W, height=H, tan_fovx=W / (2 * FX),
          tan_fovy=H / (2 * FY), config=RasterConfig(tile_cap=128, max_pairs=1 << 14))


def _scene(n=16, seed=0):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(
        np.stack([rng.uniform(-0.6, 0.6, n), rng.uniform(-0.4, 0.4, n),
                  rng.uniform(2, 4, n)], -1), jnp.float32)
    scales = jnp.full((n, 3), 0.15)
    quats = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    opac = jnp.full((n,), 0.9)
    dygs = jnp.arange(n) % 2 == 0
    alive = jnp.ones(n, bool)
    return xyz, scales, quats, opac, dygs, alive


def test_flow_zero_when_static():
    xyz, scales, quats, opac, dygs, alive = _scene()
    z3 = jnp.zeros_like(xyz)
    z4 = jnp.zeros((xyz.shape[0], 4))
    out = render_flow(
        xyz, scales, quats, opac, dygs, alive,
        z3, z3, z4, z3, jnp.eye(4), jnp.eye(4), PROJ, **KW,
    )
    np.testing.assert_allclose(np.asarray(out.color[:2]), 0.0, atol=1e-5)
    # dygs channel renders the dynamic mask footprint
    assert float(out.color[2].max()) > 0.3


def test_flow_matches_projection_shift():
    """Move dynamic gaussians by dx; rendered flow over their footprint
    should equal the NDC displacement 2*fx*dx/ (z*W) (for small dx)."""
    xyz, scales, quats, opac, dygs, alive = _scene()
    dx_world = 0.1
    d1 = jnp.zeros_like(xyz)
    d2 = jnp.where(dygs[:, None], jnp.array([[dx_world, 0, 0]]), 0.0)
    z4 = jnp.zeros((xyz.shape[0], 4))
    out = render_flow(
        xyz, scales, quats, opac, dygs, alive,
        d1, d2, z4, jnp.zeros_like(xyz), jnp.eye(4), jnp.eye(4), PROJ, **KW,
    )
    flow_u = np.asarray(out.color[0])
    dymask = np.asarray(out.color[2]) > 0.6
    alpha = np.asarray(out.alpha)
    sel = dymask & (alpha > 0.8)
    assert sel.sum() > 20
    # expected ndc du for a gaussian at depth z: dx*fx*2/(W*z) (projection
    # derivative); depths are 2..4 -> du in [2*0.1*60/(64*4), ...]
    vals = flow_u[sel]
    assert np.all(vals > 0.02), vals.min()
    assert np.all(vals < 0.12), vals.max()


def test_flow_gradients_reach_deformation():
    xyz, scales, quats, opac, dygs, alive = _scene()

    def loss(d2):
        z3 = jnp.zeros_like(xyz)
        z4 = jnp.zeros((xyz.shape[0], 4))
        out = render_flow(
            xyz, scales, quats, opac, dygs, alive,
            z3, d2, z4, z3, jnp.eye(4), jnp.eye(4), PROJ, **KW,
        )
        return jnp.mean(jnp.abs(out.color[:2]))

    g = jax.grad(loss)(jnp.zeros_like(xyz))
    gn = np.linalg.norm(np.asarray(g), axis=-1)
    dy = np.asarray(dygs)
    assert np.all(np.isfinite(gn))
    assert gn[dy].max() > 0  # dynamic gaussians receive flow gradients
