#!/usr/bin/env python3
"""Multi-sequence batch evaluation (BASELINE config #5).

Runs SLAM over several configs and aggregates a results table; within
each run multi-view evaluation renders can shard across the device mesh
(fourdgs/parallel). With no datasets available, --synthetic runs a batch
of differently-seeded synthetic sequences.

    python scripts/batch_eval.py --configs configs/rgbd/tum/*.yaml
    python scripts/batch_eval.py --synthetic 3 --frames 20
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(config, name, args):
    from fourdgs.slam.runner import SLAM
    from fourdgs.utils.logging import Log

    save_dir = os.path.join(args.out, name)
    os.makedirs(save_dir, exist_ok=True)
    slam = SLAM(
        config, save_dir=save_dir, save_interval=args.interval,
        dynamic=args.dynamic, max_frames=args.frames,
    )
    metrics = slam.run(warmup_frames=0)
    ate = slam.eval_ate("batch")
    rend = slam.eval_rendering("batch", interval=max(args.interval, 1))
    row = {
        "sequence": name,
        "fps": round(metrics["fps"], 4),
        "ate_rmse": round(ate["rmse"], 5),
        "psnr": rend["mean_psnr"],
        "ssim": rend["mean_ssim"],
        "l1_depth": rend["mean_l1_depth"],
        "n_gaussians": metrics["n_gaussians"],
    }
    Log(f"{name}: {row}", tag="Eval")
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="*", default=[])
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--interval", type=int, default=5)
    ap.add_argument("--dynamic", action="store_true")
    ap.add_argument("--out", default="results/batch_eval")
    args = ap.parse_args()

    from fourdgs.utils.config import ConfigDict, load_config

    rows = []
    for path in args.configs:
        cfg = load_config(path)
        cfg["Results"]["save_results"] = True
        name = os.path.splitext(os.path.basename(path))[0]
        rows.append(run_one(cfg, name, args))

    for i in range(args.synthetic):
        from tests.test_end_to_end import _synthetic_config

        cfg = _synthetic_config(num_frames=args.frames or 15)
        cfg["Dataset"]["seed"] = i
        rows.append(run_one(cfg, f"synthetic_{i}", args))

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(rows, f, indent=2)
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
