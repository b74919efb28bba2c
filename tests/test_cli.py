"""CLI smoke test: the reference-compatible slam.py entry point end to
end on the synthetic smoke config (eval artifacts included)."""

import json
import os
import sys

import pytest


pytestmark = pytest.mark.slow


def test_slam_cli_smoke(tmp_path, monkeypatch):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import slam as slam_cli

    monkeypatch.chdir(tmp_path)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = os.path.join(here, "configs", "synthetic", "smoke.yaml")
    metrics = slam_cli.main(
        ["--config", cfg, "--eval", "--interval", "5", "--capacity", "4096"]
    )
    assert metrics["n_frames"] == 12
    assert "ate_rmse" in metrics and metrics["ate_rmse"] < 0.1
    assert metrics["psnr_after"] is not None
    # artifacts in the reference layout
    runs = [d for d in (tmp_path / "results").iterdir() if d.is_dir()]
    assert runs, "no run directory created"
    run = runs[0]
    assert (run / "config.yml").exists()
    assert (run / "pose.txt").exists()
    assert (run / "final_result.json").exists()
    assert any((run / "point_cloud").rglob("point_cloud.ply"))
    assert any((run / "psnr").rglob("final_result.json"))
