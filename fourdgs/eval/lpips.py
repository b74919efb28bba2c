"""LPIPS (alex) in JAX.

Counterpart of the reference's torchmetrics LPIPS(net_type='alex')
usage (utils/eval_utils.py:300-428, `cal_lpips` calls with normalized
RGB). The metric is implemented natively — AlexNet feature trunk with
the 5 relu taps, per-channel unit normalization, learned 1x1 linear
heads, spatial averaging, layer sum (Zhang et al. 2018) — so it
activates the moment a weights file is available; this zero-egress
container cannot download the checkpoint, but `convert_lpips_torch`
turns the public `lpips` / torchmetrics state_dict into the npz this
module loads.

Weight resolution order (see `load_weights`):
  1. explicit path argument,
  2. $FOURDGS_LPIPS_WEIGHTS,
  3. pretrained/lpips_alex.npz under the repo root or cwd.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet trunk config: (out_ch, kernel, stride, padding), pool before?
_ALEX_CONVS = [
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]
# input normalization (lpips.ScalingLayer constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LpipsWeights(NamedTuple):
    conv_w: tuple  # 5x (O, I, k, k)
    conv_b: tuple  # 5x (O,)
    lin_w: tuple   # 5x (1, C, 1, 1)


def random_weights(key: jax.Array) -> LpipsWeights:
    """Random-initialized weights (for tests; NOT a perceptual metric)."""
    ws, bs, ls = [], [], []
    in_ch = 3
    for i, (out, k, _, _, _) in enumerate(_ALEX_CONVS):
        key, k1, k2 = jax.random.split(key, 3)
        ws.append(jax.random.normal(k1, (out, in_ch, k, k)) * 0.05)
        bs.append(jnp.zeros((out,)))
        ls.append(jax.random.uniform(k2, (1, out, 1, 1)) * 0.1)
        in_ch = out
    return LpipsWeights(tuple(ws), tuple(bs), tuple(ls))


def _max_pool(x: jax.Array) -> jax.Array:
    """3x3/2 max pool, VALID (torch MaxPool2d(3, 2))."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, 3, 3), window_strides=(1, 1, 2, 2),
        padding="VALID",
    )


def _features(w: LpipsWeights, x: jax.Array) -> list[jax.Array]:
    """The 5 relu taps of the AlexNet trunk. x: (N, 3, H, W) scaled."""
    taps = []
    for i, (out, k, s, p, pool_before) in enumerate(_ALEX_CONVS):
        if pool_before:
            x = _max_pool(x)
        x = jax.lax.conv_general_dilated(
            x, w.conv_w[i], window_strides=(s, s),
            padding=[(p, p), (p, p)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + w.conv_b[i][None, :, None, None]
        x = jax.nn.relu(x)
        taps.append(x)
    return taps


def _unit_normalize(f: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True))
    return f / (norm + eps)


@jax.jit
def lpips_pair(w: LpipsWeights, img_a: jax.Array, img_b: jax.Array) -> jax.Array:
    """LPIPS distance between two (3, H, W) images in [0, 1] (the
    torchmetrics normalize=True convention: internally mapped to [-1, 1]
    then the LPIPS scaling layer)."""
    def prep(img):
        x = img[None] * 2.0 - 1.0
        return (x - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]

    fa = _features(w, prep(img_a))
    fb = _features(w, prep(img_b))
    total = 0.0
    for a, b, lin in zip(fa, fb, w.lin_w):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        # 1x1 conv == channel-weighted sum (NetLinLayer, no activation)
        val = jnp.sum(d * lin, axis=1, keepdims=True)
        total = total + jnp.mean(val, axis=(2, 3))
    return total[0, 0]


def convert_lpips_torch(state_dict) -> LpipsWeights:
    """Convert a torch LPIPS(alex) state_dict (the public `lpips` package
    or torchmetrics layout) to LpipsWeights. Accepts key styles:
      net.slice{1..5}.<idx>.weight / lin{0..4}.model.1.weight   (lpips)
      net.features.<idx>.weight / lins.<i>.model.1.weight       (tm)
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    conv_idx = [0, 3, 6, 8, 10]  # torchvision alexnet features indices

    def find(*cands):
        for c in cands:
            if c in sd:
                return sd[c]
        raise KeyError(f"none of {cands} in checkpoint ({list(sd)[:8]}...)")

    ws, bs, ls = [], [], []
    for i, fi in enumerate(conv_idx):
        ws.append(find(
            f"net.features.{fi}.weight",
            f"net.slice{i + 1}.{fi}.weight",
            f"features.{fi}.weight",
        ).astype(np.float32))
        bs.append(find(
            f"net.features.{fi}.bias",
            f"net.slice{i + 1}.{fi}.bias",
            f"features.{fi}.bias",
        ).astype(np.float32))
        ls.append(find(
            f"lin{i}.model.1.weight",
            f"lins.{i}.model.1.weight",
            f"lin.lins.{i}.model.1.weight",
        ).astype(np.float32))
    return LpipsWeights(
        tuple(jnp.asarray(w) for w in ws),
        tuple(jnp.asarray(b) for b in bs),
        tuple(jnp.asarray(l) for l in ls),
    )


def save_weights(path: str, w: LpipsWeights) -> None:
    arrays = {}
    for i in range(5):
        arrays[f"conv_w.{i}"] = np.asarray(w.conv_w[i])
        arrays[f"conv_b.{i}"] = np.asarray(w.conv_b[i])
        arrays[f"lin_w.{i}"] = np.asarray(w.lin_w[i])
    np.savez(path, **arrays)


def load_weights(path: str | None = None) -> LpipsWeights | None:
    """Load LPIPS weights from npz (native) or pth (torch state_dict).
    Returns None when nothing is available."""
    candidates = []
    if path:
        candidates.append(path)
    env = os.environ.get("FOURDGS_LPIPS_WEIGHTS")
    if env:
        candidates.append(env)
    candidates += [
        "pretrained/lpips_alex.npz",
        "pretrained/lpips_alex.pth",
        os.path.join(os.path.dirname(__file__), "../../pretrained/lpips_alex.npz"),
    ]
    for c in candidates:
        if not os.path.exists(c):
            continue
        if c.endswith(".npz"):
            data = np.load(c)
            return LpipsWeights(
                tuple(jnp.asarray(data[f"conv_w.{i}"]) for i in range(5)),
                tuple(jnp.asarray(data[f"conv_b.{i}"]) for i in range(5)),
                tuple(jnp.asarray(data[f"lin_w.{i}"]) for i in range(5)),
            )
        try:
            import torch

            sd = torch.load(c, map_location="cpu")
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            return convert_lpips_torch(sd)
        except Exception:
            continue
    return None
