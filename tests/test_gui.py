"""Interactive viewer: HTTP control channel (pause/resume/orbit — the
reference's Packet_vis2main surface, gui/slam_gui.py:565-585) and the
trajectory/keyframe visualization."""

import json
import threading
import time
import urllib.request

import numpy as np

from fourdgs.gui.viewer import LiveViewer, _trajectory_plot


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_control_channel_pause_resume(tmp_path):
    port = _free_port()
    v = LiveViewer(str(tmp_path), interval=1, serve_port=port)
    try:
        assert not v.paused
        urllib.request.urlopen(f"http://127.0.0.1:{port}/ctl?cmd=pause", timeout=5)
        assert v.paused

        # wait_if_paused blocks until resume arrives
        released = threading.Event()

        def waiter():
            v.wait_if_paused()
            released.set()

        th = threading.Thread(target=waiter, daemon=True)
        th.start()
        time.sleep(0.1)
        assert not released.is_set()
        resp = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/ctl?cmd=resume", timeout=5
        )
        assert json.loads(resp.read())["paused"] is False
        th.join(timeout=5)
        assert released.is_set()

        # orbit control reshapes the novel-view offset
        urllib.request.urlopen(
            f"http://127.0.0.1:{port}/ctl?cmd=orbit&yaw=45&x=-50", timeout=5
        )
        np.testing.assert_allclose(v.orbit[4], np.pi / 4, atol=1e-6)
        np.testing.assert_allclose(v.orbit[0], -0.5, atol=1e-6)
    finally:
        v.close()


def test_trajectory_plot_marks_keyframes():
    poses = {}
    for i in range(10):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.1 * i
        T[2, 3] = 0.05 * i
        poses[i] = T
    img = _trajectory_plot(poses, kf_indices=[0, 5])
    assert img.shape == (256, 256, 3)
    # trajectory pixels present (green channel) and keyframe markers (red-ish)
    assert (img[:, :, 1] > 0.5).sum() >= 10
    assert ((img[:, :, 0] > 0.5) & (img[:, :, 1] < 0.5)).sum() >= 2


def test_write_scene_payload(tmp_path):
    """3D scene-view payload (reference GaussianPacket surface,
    gui/gui_utils.py:16-74): points.bin rows are [x y z r g b dyn],
    strided to <= max_points; scene.json carries row-major frustum
    poses for keyframes + the current camera."""
    from fourdgs.gui.viewer import write_scene

    rng = np.random.default_rng(3)
    n = 1000
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    rgb = rng.uniform(size=(n, 3)).astype(np.float32)
    dyn = rng.uniform(size=n) < 0.25
    T = np.eye(4)
    T[0, 3] = 1.5
    wrote = write_scene(
        str(tmp_path), xyz, rgb, dyn, [np.eye(4), T], T, max_points=256
    )
    buf = np.fromfile(tmp_path / "points.bin", np.float32).reshape(-1, 7)
    assert wrote == buf.shape[0] <= 256
    # strided sample: first row is the first splat
    np.testing.assert_allclose(buf[0, :3], xyz[0], atol=1e-6)
    np.testing.assert_allclose(buf[0, 3:6], rgb[0], atol=1e-6)
    assert set(np.unique(buf[:, 6])) <= {0.0, 1.0}
    scene = json.loads((tmp_path / "scene.json").read_text())
    assert scene["n_points"] == wrote
    assert len(scene["kf"]) == 2 and len(scene["kf"][0]) == 16
    np.testing.assert_allclose(np.asarray(scene["cur"]).reshape(4, 4), T)


def test_index_page_has_scene_widget(tmp_path):
    """The page is written statically at init and carries the WebGL
    scene widget (canvas + points.bin/scene.json consumers)."""
    v = LiveViewer(str(tmp_path), interval=1)
    html = (tmp_path / "gui" / "index.html").read_text()
    for needle in ("canvas", "points.bin", "scene.json", "VERTEX_SHADER"):
        assert needle in html
    v.close()
