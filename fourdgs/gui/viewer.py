"""Interactive headless viewer.

The reference GUI is an Open3D/OpenGL desktop process fed GaussianPacket
snapshots over a queue, with a reverse queue (`Packet_vis2main`) carrying
pause/unpause back into the SLAM loop (gui/slam_gui.py:34-699,
gui/gui_utils.py:16-74). This container has no display or OpenGL, so the
TPU build's viewer is web-first with the SAME control surface:

  * every `interval` frames it renders (a) the current tracked view,
    (b) a novel orbit view with the SAME differentiable renderer the
    optimizer uses (like the reference GUI reusing the CUDA `render`,
    slam_gui.py:540-571), (c) a depth visualization, and (d) a top-down
    trajectory/keyframe plot (the headless analogue of the reference's
    frustum + keyframe line sets, slam_gui.py:318-412);
  * an HTTP server exposes the images plus a CONTROL CHANNEL:
    `GET /ctl?cmd=pause|resume` and `GET /ctl?cmd=orbit&yaw=..&x=..`
    adjust the run and the novel-view camera live — the
    `Packet_vis2main(flag_pause=...)` equivalent (slam_gui.py:565-585);
    the runner polls `wait_if_paused()` once per frame;
  * everything also works file-only (no server) for artifact dumps.

Snapshots are plain pytrees (GaussianSnapshot) — the functional map makes
the reference's deep-copy (clone_obj) unnecessary.
"""

from __future__ import annotations

import http.server
import json
import os
import threading
import urllib.parse
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
<style>body{background:#111;color:#eee;font-family:monospace}
img{image-rendering:pixelated;max-width:24%%}
button{margin:2px;padding:4px 12px}</style></head>
<body><h3 id="hdr">4DGS-SLAM (TPU) — frame %(frame)d, %(n)d gaussians
(%(ndy)d dynamic)%(paused)s</h3>
<div>
<button onclick="fetch('/ctl?cmd=pause')">pause</button>
<button onclick="fetch('/ctl?cmd=resume')">resume</button>
yaw <input type="range" id="yaw" min="-90" max="90" value="15"
 onchange="orbit()">
x <input type="range" id="x" min="-100" max="100" value="15"
 onchange="orbit()">
</div>
<img src="current.png"><img src="novel.png"><img src="depth.png">
<img src="trajectory.png">
<script>
function orbit(){
  fetch('/ctl?cmd=orbit&yaw='+document.getElementById('yaw').value
        +'&x='+document.getElementById('x').value);}
setInterval(()=>{fetch('status.json').then(r=>r.json()).then(s=>{
  document.getElementById('hdr').textContent =
    `4DGS-SLAM (TPU) — frame ${s.frame}, ${s.n} gaussians `+
    `(${s.ndy} dynamic)`+(s.paused?' [PAUSED]':'');
  for (const im of document.images) {
    const u = new URL(im.src); u.searchParams.set('t', Date.now());
    im.src = u.href; }
}).catch(()=>{})}, 2000);
</script>
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


def _trajectory_plot(poses: dict, kf_indices, size: int = 256) -> np.ndarray:
    """Top-down (x, z) trajectory with keyframes highlighted — the
    headless stand-in for the reference GUI's camera-frustum and
    keyframe line sets."""
    img = np.zeros((size, size, 3), np.float32)
    if not poses:
        return img
    idxs = sorted(poses)
    # camera centers in world: inv(T_cw) translation
    centers = np.stack([np.linalg.inv(poses[i])[:3, 3] for i in idxs])
    xz = centers[:, [0, 2]]
    lo = xz.min(0) - 1e-3
    hi = xz.max(0) + 1e-3
    span = np.maximum(hi - lo, 1e-2).max()
    uv = ((xz - lo) / span * (size - 17) + 8).astype(int)
    uv = np.clip(uv, 0, size - 1)
    kfs = set(int(k) for k in kf_indices)
    for j, (u, v) in enumerate(uv):
        img[size - 1 - v, u] = (0.3, 0.9, 0.3)
        if idxs[j] in kfs:
            img[
                max(size - 3 - v, 0):size - v + 1,
                max(u - 1, 0):u + 2,
            ] = (0.9, 0.4, 0.1)
    # current camera = white cross
    u, v = uv[-1]
    img[size - 1 - v, max(u - 3, 0):u + 4] = 1.0
    img[max(size - 4 - v, 0):size + 2 - v, u] = 1.0
    return img


class LiveViewer:
    def __init__(self, save_dir: str, interval: int = 50, serve_port: int | None = None):
        self.dir = os.path.join(save_dir, "gui")
        os.makedirs(self.dir, exist_ok=True)
        self.interval = max(1, interval)
        self._httpd = None
        # control state (written by the HTTP thread, read by the runner —
        # the Packet_vis2main equivalent)
        self._unpaused = threading.Event()
        self._unpaused.set()
        self.orbit = np.asarray([0.15, -0.05, 0.0, 0.0, 0.25, 0.0], np.float32)
        self._last = {"frame": 0, "n": 0, "ndy": 0}
        if serve_port is not None:
            self._serve(serve_port)

    # ---- control channel -------------------------------------------------
    @property
    def paused(self) -> bool:
        return not self._unpaused.is_set()

    def pause(self):
        self._unpaused.clear()
        self._write_status()

    def resume(self):
        self._unpaused.set()
        self._write_status()

    def wait_if_paused(self, timeout: float | None = None):
        """Runner calls this once per frame; blocks while paused
        (reference: frontend spins on flag_pause, slam_frontend.py)."""
        self._unpaused.wait(timeout=timeout)

    def _ctl(self, query: str):
        q = urllib.parse.parse_qs(query)
        cmd = q.get("cmd", [""])[0]
        if cmd == "pause":
            self.pause()
        elif cmd == "resume":
            self.resume()
        elif cmd == "orbit":
            yaw = float(q.get("yaw", [15])[0]) * np.pi / 180.0
            x = float(q.get("x", [15])[0]) / 100.0
            self.orbit = np.asarray([x, -0.05, 0.0, 0.0, yaw, 0.0], np.float32)

    def _serve(self, port: int):
        directory = self.dir
        viewer = self

        class Handler(http.server.SimpleHTTPRequestHandler):
            def __init__(self, *a, **k):
                super().__init__(*a, directory=directory, **k)

            def do_GET(self):
                if self.path.startswith("/ctl"):
                    query = urllib.parse.urlsplit(self.path).query
                    viewer._ctl(query)
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(
                        json.dumps({"paused": viewer.paused}).encode()
                    )
                    return
                super().do_GET()

            def log_message(self, *a):
                pass

        self._httpd = http.server.ThreadingHTTPServer(("0.0.0.0", port), Handler)
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()

    # ---- snapshot rendering ---------------------------------------------
    def _write_status(self):
        status = dict(self._last, paused=self.paused)
        with open(os.path.join(self.dir, "status.json"), "w") as f:
            json.dump(status, f)

    def maybe_update(self, slam, frame_idx: int) -> GaussianSnapshot | None:
        """Called by the runner each frame; renders on the interval."""
        if frame_idx % self.interval != 0:
            return None
        import jax.numpy as jnp

        from fourdgs.geometry.se3 import se3_exp
        from fourdgs.slam.mapping import _render_view

        T = jnp.asarray(slam.poses_est[frame_idx], jnp.float32)
        cur = _render_view(slam.gmap, T, slam.intr.proj(), slam.intr, slam.map_cfg)
        # novel view: orbit offset (adjustable live over /ctl)
        tau = jnp.asarray(self.orbit, jnp.float32)
        T_novel = se3_exp(tau) @ T
        novel = _render_view(slam.gmap, T_novel, slam.intr.proj(), slam.intr, slam.map_cfg)

        _save_png(os.path.join(self.dir, "current.png"), np.asarray(cur.color))
        _save_png(os.path.join(self.dir, "novel.png"), np.asarray(novel.color))
        _save_png(
            os.path.join(self.dir, "depth.png"),
            _colorize_depth(np.asarray(cur.depth)),
        )
        _save_png(
            os.path.join(self.dir, "trajectory.png"),
            _trajectory_plot(
                slam.poses_est, getattr(slam, "kf_indices", ()),
            ),
        )
        snap = GaussianSnapshot(
            n_gaussians=int(slam.gmap.num_alive),
            n_dynamic=int(np.asarray(slam.gmap.dygs & slam.gmap.alive).sum()),
            frame_idx=frame_idx,
            T_cw=np.asarray(T),
        )
        self._last = {
            "frame": frame_idx, "n": snap.n_gaussians, "ndy": snap.n_dynamic,
        }
        self._write_status()
        with open(os.path.join(self.dir, "index.html"), "w") as f:
            f.write(
                _INDEX_HTML
                % {
                    "frame": frame_idx,
                    "n": snap.n_gaussians,
                    "ndy": snap.n_dynamic,
                    "paused": " [PAUSED]" if self.paused else "",
                }
            )
        return snap

    def close(self):
        if self._httpd is not None:
            self._httpd.shutdown()
