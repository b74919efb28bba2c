#!/usr/bin/env python3
"""4DGS-SLAM (TPU) command-line entry point.

CLI-compatible with the reference slam.py:252-312:

    python slam.py --config configs/rgbd/tum/fr3_sitting_static.yaml \
        [--eval] [--dynamic] [--interval N] [--max-frames N]

--eval forces save_results + rendering evaluation and disables the GUI
(reference slam.py:268-278); results land in
<save_dir>/<config-name>_<timestamp>/.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

import yaml


def main(argv=None):
    parser = argparse.ArgumentParser(description="4DGS-SLAM (TPU-native)")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--dynamic", action="store_true")
    parser.add_argument("--interval", type=int, default=50)
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--capacity", type=int, default=1 << 14)
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="save full state here after the run")
    parser.add_argument("--resume", type=str, default=None,
                        help="load full state from a checkpoint before running")
    args = parser.parse_args(argv)

    from fourdgs.utils.config import load_config
    from fourdgs.utils.logging import Log
    from fourdgs.utils.xla_cache import enable_compile_cache

    enable_compile_cache()

    config = load_config(args.config)
    if args.eval:
        Log("Running MonoGS-style evaluation mode")
        config["Results"]["save_results"] = True
        config["Results"]["use_gui"] = False
        config["Results"]["eval_rendering"] = True

    save_dir = None
    if config["Results"].get("save_results", False):
        stamp = time.strftime("%Y-%m-%d-%H-%M-%S")
        name = os.path.splitext(os.path.basename(args.config))[0]
        save_dir = os.path.join(config["Results"]["save_dir"], f"{name}_{stamp}")
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, "config.yml"), "w") as f:
            yaml.safe_dump(config.to_plain(), f)

    from fourdgs.slam.runner import SLAM

    slam = SLAM(
        config,
        save_dir=save_dir,
        save_interval=args.interval,
        dynamic=args.dynamic,
        max_frames=args.max_frames,
        capacity=args.capacity,
    )
    if args.resume:
        slam.load_checkpoint(args.resume)
        Log(f"Resumed from {args.resume} (iteration {slam.iteration_count})")
    metrics = slam.run()
    if args.checkpoint:
        slam.save_checkpoint(args.checkpoint)
        Log(f"Checkpoint saved to {args.checkpoint}")

    if config["Results"].get("eval_rendering", False):
        ate = slam.eval_ate("final")
        Log(f"ATE RMSE: {ate['rmse']:.4f} m", tag="Eval")
        # metrics over EVERY frame (reference eval_utils.py:320);
        # --interval only gates image/novel dumps (save_interval)
        before = slam.eval_rendering("before_opt", dump_interval=args.interval)
        Log(f"before_opt: {before}", tag="Eval")
        slam.save("final_before_opt")
        slam.color_refinement(
            iterations=int(
                config["Training"].get("refinement_iters", 1500)
            )
        )
        after = slam.eval_rendering("after_opt", dump_interval=args.interval)
        Log(f"after_opt: {after}", tag="Eval")
        metrics.update(
            {"ate_rmse": ate["rmse"], "psnr_before": before["mean_psnr"],
             "psnr_after": after["mean_psnr"], "ssim_after": after["mean_ssim"],
             "l1_depth_after": after["mean_l1_depth"]}
        )
        # final wandb metrics table (reference slam.py:184-233: one
        # Before/After row each of psnr/ssim/lpips/ATE/FPS)
        if slam._wandb is not None:
            try:
                table = slam._wandb.Table(
                    columns=["tag", "psnr", "ssim", "lpips", "RMSE ATE", "FPS"]
                )
                fps = metrics.get("fps_steady", metrics.get("fps"))
                for tag, r in (("Before", before), ("After", after)):
                    table.add_data(
                        tag, r["mean_psnr"], r["mean_ssim"],
                        r["mean_lpips"], ate["rmse"], fps,
                    )
                slam._wandb.log({"Metrics": table})
            except Exception as e:  # wandb offline/broken must not kill the run
                Log(f"wandb metrics table failed: {e}")
    slam.save("final")
    Log(f"Done. metrics={metrics}")
    return metrics


if __name__ == "__main__":
    main()
