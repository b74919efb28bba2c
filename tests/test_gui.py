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
