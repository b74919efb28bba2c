#!/usr/bin/env python3
"""Regenerate tests/compile_cache.tar.gz — the cold-start seed for the
fast gate's persistent XLA compile cache.

The fast gate (`pytest -m "not slow"`) is dominated by XLA CPU compiles
of the big jitted programs (map_chunk, track_frame, map_chunk_dynamic
run minutes each, cold). tests/conftest.py extracts this tarball into
the cache dir when it is absent, so a fresh container pays compute time
only. Cache entries are keyed by program hash: stale entries (from code
since changed) are ignored, never wrong — but rerun this script after
compile-relevant changes or the seed stops helping.

Usage: python scripts/seed_test_cache.py [pytest args...]
Runs the fast gate against a FRESH cache dir, then tars exactly the
entries that run produced.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tarfile
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "tests", "compile_cache.tar.gz")


def main() -> int:
    workdir = tempfile.mkdtemp(prefix="fourdgs_cache_seed_")
    env = dict(os.environ, FOURDGS_TEST_CACHE=workdir)
    args = sys.argv[1:] or ["-m", "not slow", "-q"]
    ret = subprocess.call(
        [sys.executable, "-m", "pytest", "tests/", *args], cwd=ROOT, env=env
    )
    if ret != 0:
        print(f"fast gate failed (exit {ret}); NOT refreshing the seed")
        return ret
    with tarfile.open(OUT, "w:gz") as tf:
        for name in sorted(os.listdir(workdir)):
            tf.add(os.path.join(workdir, name), arcname=name)
    size = os.path.getsize(OUT) / 1e6
    n = len(os.listdir(workdir))
    shutil.rmtree(workdir)
    print(f"wrote {OUT}: {n} entries, {size:.1f} MB")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
