"""LPIPS(alex) tests: JAX implementation vs an independent torch
re-implementation of the published formula (Zhang et al. 2018) with the
SAME random weights — validating conv arithmetic, taps, normalization
and the linear heads. The real alex weights can't be downloaded in this
container; load_weights activates them the moment a file exists
(reference metric: torchmetrics LPIPS in utils/eval_utils.py:300-428)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs.eval.lpips import (
    LpipsWeights,
    convert_lpips_torch,
    load_weights,
    lpips_pair,
    random_weights,
    save_weights,
)

torch = pytest.importorskip("torch")


def _torch_lpips(w: LpipsWeights, a: np.ndarray, b: np.ndarray) -> float:
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    convs = [(4, 2, False), (1, 2, True), (1, 1, True), (1, 1, False), (1, 1, False)]

    def feats(img):
        x = torch.from_numpy(img[None]).float() * 2 - 1
        x = (x - shift) / scale
        taps = []
        for i, (s, p, pool) in enumerate(convs):
            if pool:
                x = F.max_pool2d(x, 3, 2)
            x = F.conv2d(
                x, torch.from_numpy(np.asarray(w.conv_w[i])),
                torch.from_numpy(np.asarray(w.conv_b[i])), stride=s, padding=p,
            )
            x = F.relu(x)
            taps.append(x)
        return taps

    fa, fb = feats(a), feats(b)
    total = 0.0
    for x, y, lin in zip(fa, fb, w.lin_w):
        xn = x / (x.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        yn = y / (y.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (xn - yn) ** 2
        val = (d * torch.from_numpy(np.asarray(lin))).sum(1, keepdim=True)
        total = total + val.mean(dim=(2, 3))
    return float(total)


def test_lpips_matches_torch_reference():
    w = random_weights(jax.random.key(0))
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (3, 96, 128)).astype(np.float32)
    b = rng.uniform(0, 1, (3, 96, 128)).astype(np.float32)
    got = float(lpips_pair(w, jnp.asarray(a), jnp.asarray(b)))
    want = _torch_lpips(w, a, b)
    np.testing.assert_allclose(got, want, rtol=2e-4)
    assert got > 0


def test_lpips_identical_images_zero():
    w = random_weights(jax.random.key(2))
    img = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (3, 64, 64)), jnp.float32)
    assert abs(float(lpips_pair(w, img, img))) < 1e-6


def test_lpips_weights_roundtrip_and_discovery(tmp_path, monkeypatch):
    w = random_weights(jax.random.key(4))
    p = str(tmp_path / "lpips_alex.npz")
    save_weights(p, w)
    monkeypatch.setenv("FOURDGS_LPIPS_WEIGHTS", p)
    w2 = load_weights()
    assert w2 is not None
    for a, b in zip(jax.tree.leaves(w), jax.tree.leaves(w2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_lpips_torch_state_dict_converter():
    """A state_dict in the public `lpips` package layout converts."""
    w = random_weights(jax.random.key(5))
    conv_idx = [0, 3, 6, 8, 10]
    sd = {}
    for i, fi in enumerate(conv_idx):
        sd[f"net.features.{fi}.weight"] = np.asarray(w.conv_w[i])
        sd[f"net.features.{fi}.bias"] = np.asarray(w.conv_b[i])
        sd[f"lin{i}.model.1.weight"] = np.asarray(w.lin_w[i])
    w2 = convert_lpips_torch(sd)
    for a, b in zip(jax.tree.leaves(w), jax.tree.leaves(w2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
