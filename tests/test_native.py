import numpy as np

from fourdgs.native import has_native, knn_mean_sq_dist, voxel_downsample_mask


def _brute_knn(pts, k=3):
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    return np.sort(d2, axis=1)[:, :k].mean(1)


def test_native_builds():
    assert has_native(), "g++ build of host_ops.cc failed"


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    got = knn_mean_sq_dist(pts, k=3)
    want = _brute_knn(pts, k=3)
    # Morton-window scan is approximate for adversarial layouts; on
    # uniform clouds it is near-exact
    rel = np.abs(got - want) / np.maximum(want, 1e-9)
    assert np.median(rel) < 1e-5
    assert np.mean(rel < 0.05) > 0.98


def test_voxel_downsample():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, (2000, 3)).astype(np.float32)
    keep = voxel_downsample_mask(pts, 0.2)
    kept = pts[keep]
    assert 50 <= kept.shape[0] <= 130  # ~5^3 voxels occupied
    # no two kept points share a voxel
    key = np.floor(kept / 0.2).astype(int)
    assert len(np.unique(key, axis=0)) == kept.shape[0]


def test_region_filter_native_and_fallback():
    import numpy as np
    from fourdgs.native import region_filter

    m = np.zeros((20, 30), bool)
    m[2:4, 2:4] = True        # 4 px region — dropped at min_region=5
    m[8:14, 10:20] = True     # 60 px region — kept
    m[18, 0] = True           # isolated — dropped
    out = region_filter(m, 5)
    assert out[8:14, 10:20].all()
    assert not out[2:4, 2:4].any()
    assert not out[18, 0]
    # diagonal-only touch is NOT 4-connected
    m2 = np.zeros((6, 6), bool)
    m2[0:2, 0:2] = True
    m2[2:4, 2:4] = True
    out2 = region_filter(m2, 5)
    assert not out2.any()
