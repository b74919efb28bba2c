#!/usr/bin/env python3
"""Offline map viewer: load a saved PLY (reference-compatible, incl. the
dygs channel) and render an orbit PNG sequence with the same renderer
(reference load_ply offline viewing, gaussian_model.py:637-731).

    python scripts/view_ply.py results/.../point_cloud/final/point_cloud.ply \
        --out /tmp/orbit --frames 24
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ply")
    ap.add_argument("--out", default="/tmp/fourdgs_orbit")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--fx", type=float, default=535.4)
    args = ap.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    from fourdgs.geometry import projection_matrix, se3_exp
    from fourdgs.io.ply import load_gaussians_ply
    from fourdgs.ops.rasterize import RasterConfig, rasterize

    data = load_gaussians_ply(args.ply)
    n = data["xyz"].shape[0]
    print(f"loaded {n} gaussians ({int(data['dygs'].sum())} dynamic)")
    w, h = args.width, args.height
    fx = fy = args.fx
    cx, cy = (w - 1) / 2, (h - 1) / 2
    proj = projection_matrix(fx, fy, cx, cy, w, h)
    os.makedirs(args.out, exist_ok=True)

    center = data["xyz"].mean(0)
    import jax

    for i in range(args.frames):
        ang = 2 * np.pi * i / args.frames * 0.1 - 0.05 * np.pi
        tau = jnp.asarray([0.3 * np.sin(ang), 0, 0, 0, ang, 0], jnp.float32)
        T = np.asarray(se3_exp(tau))
        out = rasterize(
            jnp.asarray(data["xyz"]),
            jnp.exp(jnp.asarray(data["scaling"])),
            jnp.asarray(data["rotation"]),
            jax.nn.sigmoid(jnp.asarray(data["opacity"]))[:, 0],
            jnp.maximum(0.28209479177387814 * jnp.asarray(data["f_dc"]) + 0.5, 0),
            jnp.ones(n, bool),
            jnp.asarray(T), proj, jnp.zeros(3),
            fx=fx, fy=fy, width=w, height=h,
            tan_fovx=w / (2 * fx), tan_fovy=h / (2 * fy),
            config=RasterConfig(with_n_touched=False),
        )
        img = np.clip(np.asarray(out.color), 0, 1).transpose(1, 2, 0)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(args.out, f"orbit_{i:03d}.png")
        )
    print(f"wrote {args.frames} frames to {args.out}")


if __name__ == "__main__":
    main()
