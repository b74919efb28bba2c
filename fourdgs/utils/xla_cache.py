"""Persistent XLA compilation cache.

The jitted SLAM programs (track_frame, map_chunk and their Pallas
kernels) compile in minutes on a cold start; caching them on disk makes
every run after the first start in seconds. Opt-out with
FOURDGS_NO_COMPILE_CACHE=1."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    if os.environ.get("FOURDGS_NO_COMPILE_CACHE"):
        return
    import jax

    path = path or os.environ.get(
        "FOURDGS_COMPILE_CACHE",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "fourdgs_xla",
        ),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
