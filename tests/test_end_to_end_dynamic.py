"""Integration: 4D SLAM (--dynamic) on a synthetic dynamic sequence.

Analogue of BASELINE config #3: deformation field + flow supervision
(exact synthetic flow stands in for RAFT in this zero-egress container).
"""

import numpy as np
import pytest

from tests.test_end_to_end import _synthetic_config

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dyn_slam(tmp_path_factory):
    from fourdgs.slam.runner import SLAM

    cfg = _synthetic_config(num_frames=15)
    cfg["Dataset"]["dynamic"] = True
    # dystart NOT on the kf_interval grid: exercises the forced keyframe
    # at dystart (reference slam_frontend.py:752)
    cfg["Training"]["dystart"] = 7
    cfg["Training"]["flow_loss"] = 3
    cfg["Training"]["flow_loss_fine"] = 2
    cfg["ModelHiddenParams"] = {"node_num": 64}
    slam = SLAM(
        cfg, save_dir=str(tmp_path_factory.mktemp("dyn_out")),
        dynamic=True, capacity=8192, max_keyframes=16,
    )
    slam.run()
    return slam


def test_dynamic_slam_completes(dyn_slam):
    assert len(dyn_slam.poses_est) == dyn_slam.n_frames
    assert dyn_slam.deform_init, "deformation field never initialized"
    assert int(np.sum(np.asarray(dyn_slam.gmap.dygs & dyn_slam.gmap.alive))) > 20


def test_dystart_frame_is_forced_keyframe(dyn_slam):
    """dystart=7 is off the kf_interval=5 grid; the forced keyframe at
    dystart (reference slam_frontend.py:752) must make frame 7 a KF and
    deform init must land exactly there."""
    assert 7 in dyn_slam.kf_indices, dyn_slam.kf_indices
    # no keyframe ON the dystart frame had a chance before it: deform
    # node init fires during its keyframe handling
    assert dyn_slam.deform_init


def test_dynamic_slam_ate(dyn_slam):
    stats = dyn_slam.eval_ate("dyn")
    assert stats["rmse"] < 0.08, stats


def test_dynamic_render_quality(dyn_slam):
    res = dyn_slam.eval_rendering("dyn", interval=5)
    assert res["mean_psnr"] is not None and res["mean_psnr"] > 14.0, res


def test_deform_field_produces_motion(dyn_slam):
    """The learned field should move dynamic Gaussians over time."""
    import jax.numpy as jnp

    from fourdgs.models.deform import warp

    xyz = dyn_slam.gmap.params.xyz
    d0, _, _ = warp(dyn_slam.deform, xyz, jnp.float32(0.3), motion_mask=dyn_slam.gmap.dygs)
    d1, _, _ = warp(dyn_slam.deform, xyz, jnp.float32(0.9), motion_mask=dyn_slam.gmap.dygs)
    dy = np.asarray(dyn_slam.gmap.dygs & dyn_slam.gmap.alive)
    motion = np.linalg.norm(np.asarray(d1 - d0)[dy], axis=-1)
    assert motion.size > 0
    # the blob sweeps ~1.2 units across t in [0,1]; expect visible motion
    assert float(np.median(motion)) > 0.02, float(np.median(motion))
