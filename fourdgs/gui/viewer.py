"""Headless live viewer.

The reference GUI is an Open3D/OpenGL desktop process fed GaussianPacket
snapshots over a queue (gui/slam_gui.py, gui/gui_utils.py:77-141); this
container has no display or OpenGL, so the TPU build's viewer is
headless-first: every `interval` frames it renders (a) the current
tracked view and (b) a novel orbit view with the SAME differentiable
renderer the optimizer uses (exactly like the reference GUI reusing the
CUDA `render`, slam_gui.py:540-571), plus a depth visualization, writes
them under <save_dir>/gui/ with an auto-refreshing index.html, and can
serve the directory over HTTP for live remote viewing.

Snapshots are plain pytrees (GaussianSnapshot) — the functional map makes
the reference's deep-copy (clone_obj) unnecessary.
"""

from __future__ import annotations

import http.server
import os
import threading
from typing import NamedTuple

import numpy as np


class GaussianSnapshot(NamedTuple):
    """Host-side snapshot of the map + camera state (the GaussianPacket
    analogue)."""

    n_gaussians: int
    n_dynamic: int
    frame_idx: int
    T_cw: np.ndarray


_INDEX_HTML = """<!doctype html>
<html><head><title>4DGS-SLAM (TPU) live</title>
<meta http-equiv="refresh" content="2">
<style>body{background:#111;color:#eee;font-family:monospace}
img{image-rendering:pixelated;max-width:32%%}</style></head>
<body><h3>4DGS-SLAM (TPU) — frame %(frame)d, %(n)d gaussians
(%(ndy)d dynamic)</h3>
<img src="current.png"><img src="novel.png"><img src="depth.png">
</body></html>
"""


def _save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    arr = np.clip(img, 0, 1)
    if arr.ndim == 3 and arr.shape[0] in (1, 3):
        arr = arr.transpose(1, 2, 0)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, -1)
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)


def _colorize_depth(depth: np.ndarray) -> np.ndarray:
    d = depth.copy()
    valid = d > 0
    if valid.any():
        lo, hi = np.percentile(d[valid], [2, 98])
        d = np.clip((d - lo) / max(hi - lo, 1e-6), 0, 1)
    # simple turbo-ish ramp
    r = np.clip(1.5 - np.abs(2.0 * d - 1.5), 0, 1)
    g = np.clip(1.5 - np.abs(2.0 * d - 1.0), 0, 1)
    b = np.clip(1.5 - np.abs(2.0 * d - 0.5), 0, 1)
    out = np.stack([r, g, b], -1)
    out[~valid] = 0
    return out


class LiveViewer:
    def __init__(self, save_dir: str, interval: int = 50, serve_port: int | None = None):
        self.dir = os.path.join(save_dir, "gui")
        os.makedirs(self.dir, exist_ok=True)
        self.interval = max(1, interval)
        self._httpd = None
        if serve_port is not None:
            self._serve(serve_port)

    def _serve(self, port: int):
        handler = type(
            "H",
            (http.server.SimpleHTTPRequestHandler,),
            {"directory": self.dir, "log_message": lambda *a, **k: None},
        )
        directory = self.dir

        class Handler(http.server.SimpleHTTPRequestHandler):
            def __init__(self, *a, **k):
                super().__init__(*a, directory=directory, **k)

            def log_message(self, *a):
                pass

        self._httpd = http.server.ThreadingHTTPServer(("0.0.0.0", port), Handler)
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()

    def maybe_update(self, slam, frame_idx: int) -> GaussianSnapshot | None:
        """Called by the runner each frame; renders on the interval."""
        if frame_idx % self.interval != 0:
            return None
        import jax.numpy as jnp

        from fourdgs.geometry.se3 import se3_exp
        from fourdgs.slam.mapping import _render_view

        T = jnp.asarray(slam.poses_est[frame_idx], jnp.float32)
        cur = _render_view(slam.gmap, T, slam.intr.proj(), slam.intr, slam.map_cfg)
        # novel view: small orbit offset from the current pose
        tau = jnp.asarray([0.15, -0.05, 0.0, 0.0, 0.25, 0.0], jnp.float32)
        T_novel = se3_exp(tau) @ T
        novel = _render_view(slam.gmap, T_novel, slam.intr.proj(), slam.intr, slam.map_cfg)

        _save_png(os.path.join(self.dir, "current.png"), np.asarray(cur.color))
        _save_png(os.path.join(self.dir, "novel.png"), np.asarray(novel.color))
        _save_png(
            os.path.join(self.dir, "depth.png"),
            _colorize_depth(np.asarray(cur.depth)),
        )
        snap = GaussianSnapshot(
            n_gaussians=int(slam.gmap.num_alive),
            n_dynamic=int(np.asarray(slam.gmap.dygs & slam.gmap.alive).sum()),
            frame_idx=frame_idx,
            T_cw=np.asarray(T),
        )
        with open(os.path.join(self.dir, "index.html"), "w") as f:
            f.write(
                _INDEX_HTML
                % {"frame": frame_idx, "n": snap.n_gaussians, "ndy": snap.n_dynamic}
            )
        return snap

    def close(self):
        if self._httpd is not None:
            self._httpd.shutdown()
