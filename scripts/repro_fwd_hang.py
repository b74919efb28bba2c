"""Minimal repro: one synthetic-dataset frame render (forward only)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

if "--nocache" not in sys.argv:
    from fourdgs.utils.xla_cache import enable_compile_cache
    enable_compile_cache()

import numpy as np
import jax

from fourdgs.data.synthetic import SyntheticDataset
from fourdgs.utils.config import ConfigDict

w, h = 640, 480
config = ConfigDict.wrap({
    "Dataset": {
        "type": "synthetic", "sensor_type": "depth", "dataset_path": "",
        "num_frames": 4, "points_per_wall": 6000,
        "Calibration": {
            "fx": 535.4, "fy": 539.2, "cx": 320.1, "cy": 247.6,
            "width": w, "height": h, "depth_scale": 1.0, "distorted": False,
        },
    },
})
ds = SyntheticDataset(None, "", config)
print("[fwd] dataset built, dispatching frame 0 render", flush=True)
t0 = time.time()
img, depth, pose, mask = ds[0]
print(f"[fwd] frame 0 done in {time.time()-t0:.1f}s "
      f"mean={img.mean():.4f} depth_mean={depth.mean():.3f}", flush=True)
t0 = time.time()
img, depth, pose, mask = ds[1]
print(f"[fwd] frame 1 done in {time.time()-t0:.1f}s", flush=True)
