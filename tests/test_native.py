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
