"""Test config: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware. Must run before jax is imported
anywhere."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The container boots with the axon TPU platform pre-registered and
# JAX_PLATFORMS=axon pinned in the env; env overrides don't stick, but the
# config API does. Tests run on a virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compilation cache: XLA CPU compiles of the big jitted steps
# (map_chunk, track_frame) run minutes each; caching them across test
# runs keeps the suite's wall time dominated by actual compute. A COLD
# run (fresh container/CI) is seeded from the checked-in cache tarball
# (regenerate with scripts/seed_test_cache.py after compile-relevant
# changes) — entries are keyed by program hash, so stale entries are
# ignored, never wrong.
_cache_dir = os.environ.get("FOURDGS_TEST_CACHE", "/tmp/jax_test_cache")
_seed = os.path.join(os.path.dirname(__file__), "compile_cache.tar.gz")
if not os.path.isdir(_cache_dir) and os.path.exists(_seed):
    import tarfile

    os.makedirs(_cache_dir, exist_ok=True)
    with tarfile.open(_seed) as _tf:
        _tf.extractall(_cache_dir, filter="data")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
