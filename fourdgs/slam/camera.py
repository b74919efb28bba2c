"""Camera intrinsics and per-frame data.

Functional counterpart of the reference `Camera(nn.Module)`
(utils/camera_utils.py:21-203): intrinsics are a hashable static struct
(so they can parameterize jit), per-frame observations are a pytree, and
the mutable pieces (estimated pose, exposure) live in the SLAM state
rather than on the camera object.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fourdgs.geometry.projection import focal2fov, projection_matrix
from fourdgs.ops.image import grad_intensity_mask


class Intrinsics(NamedTuple):
    """Pinhole intrinsics (hashable — safe as a jit static arg)."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    @property
    def tan_fovx(self) -> float:
        return math.tan(focal2fov(self.fx, self.width) / 2.0)

    @property
    def tan_fovy(self) -> float:
        return math.tan(focal2fov(self.fy, self.height) / 2.0)

    def proj(self, znear: float = 0.01, zfar: float = 100.0) -> jax.Array:
        return projection_matrix(
            self.fx, self.fy, self.cx, self.cy, self.width, self.height, znear, zfar
        )

    @classmethod
    def from_config(cls, config) -> "Intrinsics":
        c = config["Dataset"]["Calibration"]
        return cls(
            fx=float(c["fx"]), fy=float(c["fy"]),
            cx=float(c["cx"]), cy=float(c["cy"]),
            width=int(c["width"]), height=int(c["height"]),
        )


class Frame(NamedTuple):
    """One RGB-D observation. `motion_mask` is True on static pixels
    (potentially all-True when no segmentation is active); `time` is the
    normalized timestamp idx/(N-1) feeding the deformation field
    (reference camera_utils.py:91)."""

    uid: jax.Array          # () int32
    image: jax.Array        # (3, H, W) float32 in [0,1]
    depth: jax.Array        # (H, W) float32, metres; 0 = invalid
    motion_mask: jax.Array  # (H, W) bool, True = static
    grad_mask: jax.Array    # (H, W) bool — Scharr edge mask for tracking
    T_gt: jax.Array         # (4, 4) ground-truth world-to-camera (eval only)
    time: jax.Array         # () float32 in [0, 1]


def make_frame(
    uid: int,
    image,
    depth,
    T_gt,
    time: float,
    motion_mask=None,
    edge_threshold: float = 1.1,
) -> Frame:
    image = jnp.asarray(image, jnp.float32)
    depth = jnp.asarray(depth, jnp.float32)
    if motion_mask is None:
        motion_mask = jnp.ones(depth.shape, bool)
    else:
        motion_mask = jnp.asarray(motion_mask, bool)
    grad_mask = grad_intensity_mask(image, edge_threshold)[0]
    return Frame(
        uid=jnp.asarray(uid, jnp.int32),
        image=image,
        depth=depth,
        motion_mask=motion_mask,
        grad_mask=grad_mask,
        T_gt=jnp.asarray(T_gt, jnp.float32),
        time=jnp.asarray(time, jnp.float32),
    )
