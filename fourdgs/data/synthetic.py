"""Synthetic RGB-D sequences rendered from a ground-truth Gaussian scene.

The container has no network egress, so TUM/Bonn/CoFusion archives can't
be fetched; this dataset provides a self-consistent substitute for
integration tests and benchmarks: a procedurally textured room built from
Gaussians, an orbiting camera trajectory, and (optionally) a moving
dynamic object with exact motion masks. Frames are rendered by this
repo's own rasterizer at ground-truth poses, so SLAM on the output has a
well-defined optimum.

Also provides `write_tum_format` to materialize a sequence in TUM layout
(rgb/, depth/, rgb.txt, depth.txt, groundtruth.txt) for exercising the
TUM parser and the full CLI path.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from fourdgs.data.base import BaseDataset
from fourdgs.geometry import projection_matrix
from fourdgs.geometry.quaternion import rotmat_to_quat
from fourdgs.ops.rasterize import RasterConfig, rasterize


def _plane(rng, n, origin, u_axis, v_axis, color_fn, scale=0.04):
    uu = rng.uniform(0, 1, n)
    vv = rng.uniform(0, 1, n)
    pts = (
        np.asarray(origin)[None]
        + uu[:, None] * np.asarray(u_axis)[None]
        + vv[:, None] * np.asarray(v_axis)[None]
    )
    colors = color_fn(uu, vv)
    scales = np.full((n, 3), scale) * rng.uniform(0.6, 1.6, (n, 1))
    return pts.astype(np.float32), colors.astype(np.float32), scales.astype(np.float32)


def make_room_scene(seed: int = 0, points_per_wall: int = 3000):
    """Gaussian 'room': floor, back wall, two side walls, textured."""
    rng = np.random.default_rng(seed)
    walls = []

    def tex(a, b, ph):
        def fn(u, v):
            return np.stack(
                [
                    0.5 + 0.45 * np.sin(a * u * 6.28 + ph),
                    0.5 + 0.45 * np.cos(b * v * 6.28 + ph * 2),
                    0.5 + 0.45 * np.sin((a * u + b * v) * 6.28),
                ],
                axis=-1,
            )
        return fn

    n = points_per_wall
    walls.append(_plane(rng, n, [-2, 1.2, 1], [4, 0, 0], [0, 0, 4], tex(3, 2, 0.0)))   # floor
    walls.append(_plane(rng, n, [-2, -1.2, 1], [4, 0, 0], [0, 0, 4], tex(2, 3, 1.0)))  # ceiling
    walls.append(_plane(rng, n, [-2, -1.2, 5], [4, 0, 0], [0, 2.4, 0], tex(4, 4, 2.0)))  # back
    walls.append(_plane(rng, n, [-2, -1.2, 1], [0, 2.4, 0], [0, 0, 4], tex(5, 2, 0.5)))  # left
    walls.append(_plane(rng, n, [2, -1.2, 1], [0, 2.4, 0], [0, 0, 4], tex(2, 5, 1.5)))   # right
    pts = np.concatenate([w[0] for w in walls])
    col = np.concatenate([w[1] for w in walls])
    scl = np.concatenate([w[2] for w in walls])
    quats = np.zeros((pts.shape[0], 4), np.float32)
    quats[:, 0] = 1.0
    opac = np.full(pts.shape[0], 0.95, np.float32)
    return pts, col, np.log(scl), quats, opac


def make_dynamic_blob(seed: int = 1, n: int = 400):
    """A compact cluster that translates along x over normalized time."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0, 0.12, (n, 3)).astype(np.float32) + np.array(
        [0.0, 0.2, 2.5], np.float32
    )
    col = np.tile(np.array([[0.9, 0.15, 0.1]], np.float32), (n, 1))
    col += rng.uniform(-0.05, 0.05, (n, 3)).astype(np.float32)
    scl = np.log(np.full((n, 3), 0.05, np.float32))
    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1.0
    opac = np.full(n, 0.95, np.float32)
    return pts, col, scl, quats, opac


def blob_offset(time: float) -> np.ndarray:
    """GT trajectory of the dynamic blob (x sweep + slight bob)."""
    return np.array(
        [1.2 * (time - 0.5), 0.15 * np.sin(time * 6.28), 0.0], np.float32
    )


def orbit_pose(t: float, radius: float = 0.12) -> np.ndarray:
    """World-to-camera pose looking at the room center from a small orbit.
    Amplitudes are tuned so inter-frame motion matches handheld RGB-D
    footage (~centimetres/frame) — trackable at the reference's pose LRs."""
    ang = 0.6 * np.sin(t * 2 * np.pi)
    cx = radius * np.sin(ang)
    cz = 0.08 * (1 - np.cos(ang))
    yaw = 0.06 * np.sin(ang)
    cy_, sy = np.cos(yaw), np.sin(yaw)
    R_wc = np.array([[cy_, 0, sy], [0, 1, 0], [-sy, 0, cy_]])
    c = np.array([cx, 0.0, cz])
    T = np.eye(4)
    T[:3, :3] = R_wc.T
    T[:3, 3] = -R_wc.T @ c
    return T


class SyntheticDataset(BaseDataset):
    """config["Dataset"] extras: num_frames, dynamic (bool), seed."""

    def __init__(self, args, path: str, config):
        super().__init__(args, path, config)
        ds = config["Dataset"]
        self.num_imgs = int(ds.get("num_frames", 60))
        self.dynamic = bool(ds.get("dynamic", False))
        seed = int(ds.get("seed", 0))
        ppw = int(ds.get("points_per_wall", 3000))

        self.static_scene = make_room_scene(seed, ppw)
        self.blob = make_dynamic_blob(seed + 1) if self.dynamic else None
        self.poses = [orbit_pose(i / max(self.num_imgs - 1, 1)) for i in range(self.num_imgs)]
        self._proj = projection_matrix(self.fx, self.fy, self.cx, self.cy, self.width, self.height)
        self._raster_cfg = RasterConfig(
            use_oracle=(self.width * self.height <= 96 * 96),
            max_pairs=1 << 18,
        )
        self._cache: dict[int, tuple] = {}

    def _render(self, idx: int):
        t = idx / max(self.num_imgs - 1, 1)
        pts, col, lscl, quats, opac = self.static_scene
        if self.blob is not None:
            bpts, bcol, bscl, bq, bop = self.blob
            bpts = bpts + blob_offset(t)[None]
            pts = np.concatenate([pts, bpts])
            col = np.concatenate([col, bcol])
            lscl = np.concatenate([lscl, bscl])
            quats = np.concatenate([quats, bq])
            opac = np.concatenate([opac, bop])
        n = pts.shape[0]
        out = rasterize(
            jnp.asarray(pts), jnp.exp(jnp.asarray(lscl)), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(col), jnp.ones(n, bool),
            jnp.asarray(self.poses[idx], jnp.float32), self._proj, jnp.zeros(3),
            fx=self.fx, fy=self.fy, width=self.width, height=self.height,
            tan_fovx=float(np.tan(self.fovx / 2)), tan_fovy=float(np.tan(self.fovy / 2)),
            config=self._raster_cfg,
        )
        alpha = np.asarray(out.alpha)
        image = np.clip(np.asarray(out.color), 0, 1)
        depth = np.where(alpha > 0.5, np.asarray(out.depth) / np.maximum(alpha, 1e-6), 0.0)
        return image.astype(np.float32), depth.astype(np.float32)

    def motion_mask_gt(self, idx: int) -> np.ndarray:
        """Exact dynamic mask by projecting the blob footprint."""
        if self.blob is None:
            return np.ones((self.height, self.width), bool)
        t = idx / max(self.num_imgs - 1, 1)
        bpts = self.blob[0] + blob_offset(t)[None]
        T = self.poses[idx]
        pc = bpts @ T[:3, :3].T + T[:3, 3]
        z = np.maximum(pc[:, 2], 1e-4)
        u = (self.fx * pc[:, 0] / z + self.cx).astype(int)
        v = (self.fy * pc[:, 1] / z + self.cy).astype(int)
        mask = np.zeros((self.height, self.width), bool)
        r = 4
        for uu, vv in zip(u, v):
            if 0 <= uu < self.width and 0 <= vv < self.height:
                mask[max(0, vv - r):vv + r, max(0, uu - r):uu + r] = True
        return ~mask  # True = static

    def __getitem__(self, idx: int):
        if idx not in self._cache:
            self._cache[idx] = self._render(idx)
        image, depth = self._cache[idx]
        return image, depth, self.poses[idx], self.motion_mask_gt(idx)


def write_tum_format(dataset: SyntheticDataset, out_dir: str, depth_scale: float = 5000.0):
    """Materialize a synthetic sequence in TUM RGB-D layout."""
    from PIL import Image

    os.makedirs(os.path.join(out_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
    rgb_lines, depth_lines, gt_lines = [], ["# depth"], ["# ground truth trajectory"]
    rgb_lines = ["# color images"]
    for i in range(len(dataset)):
        img, depth, T_cw, _ = dataset[i]
        ts = f"{i / 30.0 + 1000.0:.6f}"
        rgb_rel = f"rgb/{i:05d}.png"
        depth_rel = f"depth/{i:05d}.png"
        Image.fromarray(
            (np.transpose(img, (1, 2, 0)) * 255).astype(np.uint8)
        ).save(os.path.join(out_dir, rgb_rel))
        d16 = np.clip(depth * depth_scale, 0, 65535).astype(np.uint16)
        Image.fromarray(d16).save(os.path.join(out_dir, depth_rel))
        rgb_lines.append(f"{ts} {rgb_rel}")
        depth_lines.append(f"{ts} {depth_rel}")
        T_wc = np.linalg.inv(T_cw)
        q = np.asarray(rotmat_to_quat(jnp.asarray(T_wc[:3, :3], jnp.float32)))
        tx, ty, tz = T_wc[:3, 3]
        # TUM order: tx ty tz qx qy qz qw
        gt_lines.append(
            f"{ts} {tx:.6f} {ty:.6f} {tz:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}"
        )
    open(os.path.join(out_dir, "rgb.txt"), "w").write("\n".join(rgb_lines) + "\n")
    open(os.path.join(out_dir, "depth.txt"), "w").write("\n".join(depth_lines) + "\n")
    open(os.path.join(out_dir, "groundtruth.txt"), "w").write("\n".join(gt_lines) + "\n")
