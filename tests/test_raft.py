"""RAFT graph tests (random weights — the checkpoint can't be downloaded
in this container; load_torch_weights covers the conversion path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs.perception.raft import (
    bilinear_sample,
    corr_pyramid,
    corr_lookup,
    encoder_forward,
    make_params,
    raft_forward,
    _coords_grid,
    _upsample_flow,
)


def test_bilinear_sample_exact_and_interp():
    img = jnp.arange(12.0).reshape(1, 1, 3, 4)
    coords = jnp.array([[[1.0, 1.0], [0.5, 0.0], [2.5, 1.5]]])
    out = bilinear_sample(img, coords)
    np.testing.assert_allclose(out[0, 0, 0], 5.0)
    np.testing.assert_allclose(out[0, 0, 1], 0.5)
    np.testing.assert_allclose(out[0, 0, 2], (6 + 7 + 10 + 11) / 4.0)


def test_bilinear_sample_out_of_bounds_zero():
    img = jnp.ones((1, 1, 4, 4))
    coords = jnp.array([[[-2.0, 0.0], [10.0, 10.0]]])
    out = bilinear_sample(img, coords)
    np.testing.assert_allclose(out, 0.0)


def test_corr_pyramid_self_similarity():
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.normal(size=(1, 32, 6, 8)), jnp.float32)
    pyr = corr_pyramid(f, f)
    assert len(pyr) == 4
    assert pyr[0].shape == (48, 1, 6, 8)
    # self-correlation at matching position is the max for most pixels
    c0 = np.asarray(pyr[0]).reshape(48, 48)
    diag_best = (c0.argmax(axis=1) == np.arange(48)).mean()
    assert diag_best > 0.9


def test_corr_lookup_shape():
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.normal(size=(1, 32, 8, 8)), jnp.float32)
    pyr = corr_pyramid(f, f)
    coords = _coords_grid(8, 8)
    out = corr_lookup(pyr, coords)
    assert out.shape == (1, 4 * 81, 8, 8)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_upsample_flow_constant():
    flow = jnp.ones((1, 2, 4, 5))
    mask = jnp.zeros((1, 64 * 9, 4, 5))  # uniform softmax
    up = _upsample_flow(flow, mask)
    assert up.shape == (1, 2, 32, 40)
    # interior pixels: convex combo of 8*flow = 8
    np.testing.assert_allclose(np.asarray(up[0, :, 8:-8, 8:-8]), 8.0, atol=1e-5)


def test_raft_forward_shapes_and_zero_motion():
    params = make_params(jax.random.key(0))
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 255, (1, 3, 32, 40)), jnp.float32)
    flow = raft_forward(params, img, img, iters=2)
    assert flow.shape == (1, 2, 32, 40)
    assert bool(jnp.all(jnp.isfinite(flow)))


def test_encoder_downsamples_8x():
    params = make_params(jax.random.key(1))
    x = jnp.zeros((1, 3, 64, 80))
    f = encoder_forward(params["fnet"], x)
    assert f.shape == (1, 256, 8, 10)


def test_gma_forward_shapes():
    from fourdgs.perception.gma import make_gma_params, gma_forward, global_attention, aggregate

    params = make_gma_params(jax.random.key(0))
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 255, (1, 3, 32, 40)), jnp.float32)
    flow = gma_forward(params, img, img, iters=2)
    assert flow.shape == (1, 2, 32, 40)
    assert bool(jnp.all(jnp.isfinite(flow)))


def test_gma_attention_rows_normalized():
    from fourdgs.perception.gma import make_gma_params, global_attention

    params = make_gma_params(jax.random.key(1))
    ctx = jnp.asarray(np.random.default_rng(4).normal(size=(1, 128, 4, 5)), jnp.float32)
    attn = global_attention(params["att"], ctx)
    assert attn.shape == (20, 20)
    np.testing.assert_allclose(np.asarray(attn.sum(axis=-1)), 1.0, atol=1e-5)
