"""Image-space ops: Scharr gradients, gradient masks, SSIM, dilation.

Matches the reference Scharr filters and validity masks
(utils/slam_utils.py:5-39) and the 11x11-Gaussian SSIM
(gaussian_splatting/utils/loss_utils.py:65-108), implemented with
`lax.conv_general_dilated` so XLA lowers them to the MXU/VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# Scharr kernels; the reference names its vertical-edge response (conv with
# the x-kernel) `img_grad_v` — we preserve that naming quirk so thresholds
# behave identically (utils/slam_utils.py:8-23).
_SCHARR_X = jnp.array([[3.0, 10.0, 3.0], [0.0, 0.0, 0.0], [-3.0, -10.0, -3.0]])
_SCHARR_Y = jnp.array([[3.0, 0.0, -3.0], [10.0, 0.0, -10.0], [3.0, 0.0, -3.0]])
_NORMALIZER = 1.0 / 32.0


def _conv3x3(img: jax.Array, kernel: jax.Array, pad_mode: str = "reflect") -> jax.Array:
    """Depthwise 3x3 convolution on (C, H, W) with reflect padding.

    Note: matches torch.nn.functional.conv2d, which is cross-correlation —
    the kernel is applied unflipped."""
    c = img.shape[0]
    p = jnp.pad(img, ((0, 0), (1, 1), (1, 1)), mode=pad_mode)[None]
    k = jnp.broadcast_to(kernel[None, None], (c, 1, 3, 3))
    out = lax.conv_general_dilated(
        p,
        k,
        window_strides=(1, 1),
        padding="VALID",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0]


def image_gradient(image: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(C, H, W) -> (grad_v, grad_h), Scharr filtered, reflect padded."""
    grad_v = _NORMALIZER * _conv3x3(image, _SCHARR_X)
    grad_h = _NORMALIZER * _conv3x3(image, _SCHARR_Y)
    return grad_v, grad_h


def image_gradient_mask(image: jax.Array, eps: float = 0.01) -> tuple[jax.Array, jax.Array]:
    """Valid-gradient masks: True where the full 3x3 window has |pix|>eps."""
    ind = (jnp.abs(image) > eps).astype(jnp.float32)
    box = jnp.ones((3, 3), dtype=jnp.float32)
    s = _conv3x3(ind, box)
    mask = s == 9.0
    return mask, mask


def grad_intensity_mask(image: jax.Array, edge_threshold: float) -> jax.Array:
    """Median-thresholded Scharr edge mask used for tracking-pixel selection
    (reference utils/camera_utils.py:205-234, non-replica branch).

    image: (C, H, W) in [0,1]. Returns bool (1, H, W)."""
    gray = jnp.mean(image, axis=0, keepdims=True)
    gv, gh = image_gradient(gray)
    mv, mh = image_gradient_mask(gray)
    gv = gv * mv
    gh = gh * mh
    intensity = jnp.sqrt(gv**2 + gh**2)
    med = jnp.median(intensity)
    return intensity > med * edge_threshold


def dilate3x3(mask: jax.Array, iterations: int = 1) -> jax.Array:
    """Binary dilation with a 3x3 structuring element on (H, W) bool
    (reference utils/camera_utils.py:303-308 uses 3 conv passes)."""
    m = mask.astype(jnp.float32)[None]
    box = jnp.ones((3, 3), dtype=jnp.float32)
    for _ in range(iterations):
        m = jnp.clip(_conv3x3(m, box, pad_mode="constant"), 0.0, 1.0)
    return m[0] > 0.0


@functools.lru_cache(maxsize=4)
def _gaussian_window(window_size: int, sigma: float) -> jax.Array:
    x = jnp.arange(window_size, dtype=jnp.float32) - window_size // 2
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(
    img1: jax.Array,
    img2: jax.Array,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jax.Array:
    """Mean SSIM over a (C, H, W) pair, 11x11 Gaussian window, SAME padding
    (reference gaussian_splatting/utils/loss_utils.py:65-108)."""
    c = img1.shape[0]
    win = _gaussian_window(window_size, sigma)
    k = jnp.broadcast_to(win[None, None], (c, 1, window_size, window_size))

    def filt(x):
        return lax.conv_general_dilated(
            x[None],
            k,
            window_strides=(1, 1),
            padding="SAME",
            feature_group_count=c,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[0]

    mu1 = filt(img1)
    mu2 = filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu12
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.mean(ssim_map)


def psnr(img1: jax.Array, img2: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """PSNR over (C, H, W); with a bool pixel mask (H, W) it averages MSE
    over masked pixels only (reference utils/eval_utils.py psnr with mask)."""
    se = (img1 - img2) ** 2
    if mask is not None:
        m = mask.astype(se.dtype)[None]
        mse = jnp.sum(se * m) / jnp.maximum(jnp.sum(m) * img1.shape[0], 1.0)
    else:
        mse = jnp.mean(se)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))
