"""Device-mesh construction for multi-chip runs.

The reference's only parallelism is torch.multiprocessing pipelining
(SURVEY §2.3) — it cannot use more than one GPU. The TPU build scales
through `jax.sharding`: a 1-D "data" mesh shards mapping views /
evaluation batches across chips (gradients psum over ICI), and the
Gaussian state can additionally be sharded along the capacity axis for a
ZeRO-style distributed optimizer (see fourdgs/parallel/sharded.py).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))
