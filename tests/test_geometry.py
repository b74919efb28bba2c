import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs.geometry import (
    se3_exp,
    so3_exp,
    so3_log,
    update_pose,
    projection_matrix,
    world_to_view,
    backproject_depth,
    quat_normalize,
    quat_to_rotmat,
    rotmat_to_quat,
    sh0_to_rgb,
    rgb_to_sh0,
)
from fourdgs.geometry.projection import camera_center


def test_so3_exp_identity():
    R = so3_exp(jnp.zeros(3))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)


def test_so3_exp_quarter_turn_z():
    R = so3_exp(jnp.array([0.0, 0.0, np.pi / 2]))
    expected = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_so3_log_roundtrip(rng):
    for _ in range(10):
        theta = rng.normal(size=3) * 0.5
        R = so3_exp(jnp.asarray(theta, dtype=jnp.float32))
        back = so3_log(R)
        np.testing.assert_allclose(back, theta, atol=1e-4)


def test_so3_exp_small_angle_matches_taylor():
    theta = jnp.array([1e-7, -2e-7, 1e-7])
    R = so3_exp(theta)
    # I + W for tiny angles
    W = np.array(
        [[0, -1e-7, -2e-7], [1e-7, 0, -1e-7], [2e-7, 1e-7, 0]], dtype=np.float64
    )
    np.testing.assert_allclose(np.asarray(R, np.float64), np.eye(3) + W, atol=1e-9)


def test_se3_exp_pure_translation():
    tau = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
    T = se3_exp(tau)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-7)
    np.testing.assert_allclose(T[:3, 3], [1.0, 2.0, 3.0], atol=1e-7)


def test_se3_exp_group_property(rng):
    # exp(tau) exp(-tau) = I
    tau = jnp.asarray(rng.normal(size=6) * 0.3, dtype=jnp.float32)
    T = se3_exp(tau) @ se3_exp(-tau)
    # not exactly I since exp(a)exp(-a)=I holds exactly for SE(3)? yes: inverse
    np.testing.assert_allclose(T, np.eye(4), atol=1e-5)


def test_se3_exp_differentiable():
    g = jax.grad(lambda tau: jnp.sum(se3_exp(tau)))(jnp.zeros(6))
    assert np.all(np.isfinite(g))


def test_update_pose_convergence_flag():
    T = jnp.eye(4)
    newT, conv = update_pose(jnp.full((6,), 1e-6), T)
    assert bool(conv)
    newT, conv = update_pose(jnp.full((6,), 1e-2), T)
    assert not bool(conv)


def test_projection_matrix_center_pixel():
    fx, fy, cx, cy, W, H = 535.4, 539.2, 320.1, 247.6, 640, 480
    P = projection_matrix(fx, fy, cx, cy, W, H)
    # Point on the optical axis at z=1 should project to (cx, cy) in pixels
    pt = jnp.array([0.0, 0.0, 1.0, 1.0])
    clip = P @ pt
    ndc = clip[:2] / clip[3]
    px = ((ndc[0] + 1.0) * W - 1.0) * 0.5
    py = ((ndc[1] + 1.0) * H - 1.0) * 0.5
    # off-center principal point: ndc 0 maps to (W-1)/2; offset is cx - W/2
    assert abs(float(px) - (cx - 0.5)) < 1e-2
    assert abs(float(py) - (cy - 0.5)) < 1e-2


def test_projection_matrix_pinhole_consistency():
    """Projecting through P must equal the plain pinhole model u = fx*x/z + cx."""
    fx, fy, cx, cy, W, H = 535.4, 539.2, 320.1, 247.6, 640, 480
    P = projection_matrix(fx, fy, cx, cy, W, H)
    rng = np.random.default_rng(1)
    for _ in range(10):
        x, y = rng.normal(size=2)
        z = rng.uniform(0.5, 5.0)
        clip = P @ jnp.array([x, y, z, 1.0])
        ndc = clip / clip[3]
        px = ((ndc[0] + 1.0) * W - 1.0) * 0.5
        py = ((ndc[1] + 1.0) * H - 1.0) * 0.5
        assert abs(float(px) - (fx * x / z + cx - 0.5)) < 1e-3
        assert abs(float(py) - (fy * y / z + cy - 0.5)) < 1e-3


def test_camera_center():
    R = np.asarray(so3_exp(jnp.array([0.1, 0.2, 0.3])))
    t = np.array([1.0, -2.0, 0.5], dtype=np.float32)
    T = world_to_view(jnp.asarray(R), jnp.asarray(t))
    c = camera_center(T)
    np.testing.assert_allclose(np.asarray(T[:3, :3]) @ np.asarray(c) + t, 0.0, atol=1e-6)


def test_backproject_roundtrip():
    fx, fy, cx, cy = 100.0, 100.0, 32.0, 24.0
    H, W = 48, 64
    depth = jnp.full((H, W), 2.0)
    T = jnp.eye(4)
    pts = backproject_depth(depth, fx, fy, cx, cy, T)
    # pixel (cy, cx) backprojects onto the optical axis
    idx = int(cy) * W + int(cx)
    np.testing.assert_allclose(pts[idx], [0.0, 0.0, 2.0], atol=1e-5)
    # reproject a random pixel
    u, v = 10, 33
    p = pts[v * W + u]
    np.testing.assert_allclose(
        [float(p[0] / p[2] * fx + cx), float(p[1] / p[2] * fy + cy)], [u, v], atol=1e-4
    )


def test_quat_rotmat_roundtrip(rng):
    q = quat_normalize(jnp.asarray(rng.normal(size=(16, 4)), dtype=jnp.float32))
    R = quat_to_rotmat(q)
    # valid rotations
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
    q2 = rotmat_to_quat(R)
    # q and -q are the same rotation
    sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-4)


def test_sh_roundtrip():
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    np.testing.assert_allclose(sh0_to_rgb(rgb_to_sh0(rgb)), rgb, atol=1e-6)
