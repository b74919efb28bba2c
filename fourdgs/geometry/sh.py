"""Degree-0 spherical harmonics (the SLAM pipeline runs sh_degree=0, see
reference slam.py GaussianModel(sh_degree=0) and
configs/rgbd/tum/base_config.yaml model_params.sh_degree). The
SH->RGB clamp-at-zero matches cuda_rasterizer/forward.cu:50-72."""

from __future__ import annotations

import jax
import jax.numpy as jnp

SH_C0 = 0.28209479177387814


def sh0_to_rgb(f_dc: jax.Array) -> jax.Array:
    """(..., 3) DC SH coefficients -> RGB in [0, inf), clamped >= 0."""
    return jnp.maximum(SH_C0 * f_dc + 0.5, 0.0)


def rgb_to_sh0(rgb: jax.Array) -> jax.Array:
    return (rgb - 0.5) / SH_C0
