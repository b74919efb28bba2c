import numpy as np

from fourdgs.slam.camera import Intrinsics
from fourdgs.slam.keyframes import (
    add_to_window,
    is_keyframe,
    keyframe_selection_overlap,
)

INTR = Intrinsics(fx=60.0, fy=60.0, cx=31.5, cy=23.5, width=64, height=48)


def _pose(t):
    T = np.eye(4)
    T[:3, 3] = t
    return T


def test_is_keyframe_translation_trigger():
    vis = np.ones(100, bool)
    # big translation vs median depth -> keyframe regardless of overlap
    assert is_keyframe(
        _pose([0.5, 0, 0]), _pose([0, 0, 0]), 2.0, vis, vis,
        kf_translation=0.08, kf_min_translation=0.05, kf_overlap=0.9,
    )
    # tiny translation + full overlap -> no keyframe
    assert not is_keyframe(
        _pose([0.01, 0, 0]), _pose([0, 0, 0]), 2.0, vis, vis,
        kf_translation=0.08, kf_min_translation=0.05, kf_overlap=0.9,
    )


def test_is_keyframe_overlap_trigger():
    a = np.zeros(100, bool)
    a[:50] = True
    b = np.zeros(100, bool)
    b[40:90] = True  # IoU = 10/90 < 0.9
    assert is_keyframe(
        _pose([0.15, 0, 0]), _pose([0, 0, 0]), 2.0, a, b,
        kf_translation=1e9, kf_min_translation=0.05, kf_overlap=0.9,
    )


def test_add_to_window_evicts_low_overlap():
    vis_cur = np.zeros(100, bool)
    vis_cur[:50] = True
    occ = {
        1: vis_cur.copy(),           # high overlap
        2: ~vis_cur,                 # zero overlap -> eviction candidate
        3: vis_cur.copy(),
    }
    poses = {i: _pose([0.1 * i, 0, 0]) for i in range(5)}
    window, removed = add_to_window(
        4, vis_cur, occ, [3, 1, 2], poses, kf_cutoff=0.3, window_size=8,
    )
    assert removed == 2
    assert window[0] == 4 and 2 not in window


def test_add_to_window_size_eviction():
    vis = np.ones(50, bool)
    occ = {i: vis for i in range(10)}
    poses = {i: _pose([0.05 * i, 0, 0]) for i in range(10)}
    window = [8, 7, 6, 5, 4, 3, 2, 1]
    w2, removed = add_to_window(
        9, vis, occ, window, poses, kf_cutoff=0.0, window_size=8,
    )
    assert len(w2) == 8
    assert removed is not None and removed not in w2
    assert w2[0] == 9


def test_keyframe_selection_overlap_ranks_nearby():
    rng = np.random.default_rng(0)
    depth = np.full((48, 64), 2.0, np.float32)
    T0 = _pose([0, 0, 0])
    candidates = {
        1: _pose([0.05, 0, 0]),   # sees almost everything
        2: _pose([5.0, 0, 0]),    # sees nothing
    }
    picks = keyframe_selection_overlap(
        depth, T0, INTR, candidates, before_uid=10, max_selected=2, rng=rng,
    )
    assert 1 in picks
    assert 2 not in picks


def test_reproject_mask_identity_covers_valid_depth():
    """Same pose: every valid static pixel reprojects onto itself, so the
    returned keep-mask is False there (covered) and True on the
    invalid-depth region beyond the 7x7 dilation halo."""
    import jax.numpy as jnp
    from fourdgs.slam.keyframes import reproject_mask

    H, W = 48, 64
    depth = np.zeros((H, W), np.float32)
    depth[8:32, 8:40] = 2.0
    static = np.ones((H, W), bool)
    m = np.asarray(reproject_mask(
        jnp.asarray(depth), jnp.asarray(static),
        jnp.eye(4), jnp.eye(4), fx=50.0, fy=50.0, cx=31.5, cy=23.5,
    ))
    assert not m[8:32, 8:40].any()          # covered pixels removed
    assert m[0:4, :].all() and m[44:, :].all()  # far region kept
    # dilation halo: 3 passes of 3x3 -> 3 px beyond the block is covered
    assert not m[7, 20] and not m[5, 20]
    assert m[4, 20]


def test_reproject_mask_dynamic_pixels_not_projected():
    """Anchor pixels marked dynamic (static=False) must not mark
    coverage: with an all-dynamic anchor the mask is all-True (reference
    early exit, camera_utils.py:275-276)."""
    import jax.numpy as jnp
    from fourdgs.slam.keyframes import reproject_mask

    H, W = 32, 32
    depth = np.full((H, W), 2.0, np.float32)
    m = np.asarray(reproject_mask(
        jnp.asarray(depth), jnp.zeros((H, W), bool),
        jnp.eye(4), jnp.eye(4), fx=40.0, fy=40.0, cx=15.5, cy=15.5,
    ))
    assert m.all()


def test_reproject_mask_translation_shifts_coverage():
    """Translating the current camera along +x shifts the reprojection
    footprint left in the image; pixels that fell out of the footprint
    become True (uncovered)."""
    import jax.numpy as jnp
    from fourdgs.slam.keyframes import reproject_mask

    H, W = 48, 64
    fx = fy = 50.0
    depth = np.full((H, W), 2.0, np.float32)
    T_curr = np.eye(4, dtype=np.float32)
    T_curr[0, 3] = 0.4  # camera frame shifts points +x -> pixels shift right
    m = np.asarray(reproject_mask(
        jnp.asarray(depth), jnp.ones((H, W), bool),
        jnp.eye(4), jnp.asarray(T_curr), fx=fx, fy=fy, cx=31.5, cy=23.5,
    ))
    # points shift +x by 0.4*50/2 = 10 px: left columns uncovered
    assert m[:, 0:6].all()
    assert not m[20:30, 20:40].any()


def test_kf_store_wraparound_evicts_stale_ids():
    """Past store capacity, slot reuse must evict the old keyframe id
    from every id-keyed structure (kf_slot / kf_indices / window /
    occ_visibility) so the replay pool can never resolve an evicted KF
    to a slot now holding a different frame's image."""
    from fourdgs.slam.keyframes import empty_store
    from fourdgs.slam.runner import SLAM

    s = SLAM.__new__(SLAM)
    s.store = empty_store(4, 8, 8)
    s.kf_slot = {}
    s.kf_indices = []
    s.occ_visibility = {}
    s.window = []
    s.kf_total = 0

    for kf in range(8):  # 8 keyframes through a 4-slot store
        slot = s._assign_kf_slot(kf)
        s.occ_visibility[kf] = np.zeros(4, bool)
        s.window = s.kf_indices[-2:][::-1]
        assert slot == kf % 4
        # every resident id maps to a unique live slot
        assert len(set(s.kf_slot.values())) == len(s.kf_slot)
        assert set(s.kf_slot) == set(s.kf_indices)
        # evicted ids are gone everywhere the mapping replay pool reads
        for old in range(kf - 3):
            assert old not in s.kf_slot
            assert old not in s.kf_indices
            assert old not in s.window
            assert old not in s.occ_visibility
        # the replay pool (kf_indices -> kf_slot) points only at slots
        # whose CURRENT occupant is that keyframe
        for k in s.kf_indices:
            assert s.kf_slot[k] == k % 4

    assert s.kf_total == 8
    assert s.kf_indices == [4, 5, 6, 7]


def test_pair_bucket_ladder():
    """{2^k, 3*2^k} pair-budget ladder with additive margin: the
    640x480 aligned-layout floor (~154K slots) must land on 196608, not
    overshoot to 262144; overflow advances one ladder step (1.5x)."""
    from fourdgs.ops.rasterize import RasterConfig
    from fourdgs.slam.runner import SLAM

    s = SLAM.__new__(SLAM)
    s._raster_base = RasterConfig(max_pairs=1 << 18)
    s._pairs_floor = 0

    def bucket(hwm):
        s._pairs_hwm = hwm
        return s._raster_for_capacity(1 << 15).max_pairs

    assert bucket(0) == 1 << 18          # no measurement: worst case
    assert bucket(1000) == 49_152        # floor + margin -> first 3*2^k
    assert bucket(40_000) == 98_304      # 40K + 32K margin -> 3*2^15
    assert bucket(153_600) == 196_608    # the aligned floor fits 3*2^16
    assert bucket(250_000) == 262_144    # ceiling
    # every bucket is a CHUNK*SUBS multiple (CSR grid granularity)
    from fourdgs.ops.rasterize.tile_kernel import CHUNK, SUBS

    for h in (0, 1000, 40_000, 153_600, 250_000):
        assert bucket(h) % (CHUNK * SUBS) == 0
