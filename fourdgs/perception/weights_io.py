"""Native .npz serialization for converted perception weights.

The torch checkpoints (raft-things.pth, gma-things.pth, yolov9e-seg.pt —
reference loads them at utils/camera_utils.py:368-407 and slam.py:80)
need torch only ONCE, at conversion time (scripts/convert_weights.py).
The artifacts here are flat .npz files keyed by '/'-joined pytree paths;
runtime loading is numpy-only, so the SLAM process never imports torch.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

_META_KEY = "__meta_json__"


def _flatten(prefix: str, obj, out: dict) -> None:
    if isinstance(obj, dict):
        for k, v in obj.items():
            _flatten(f"{prefix}/{k}" if prefix else str(k), v, out)
    elif isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            _flatten(f"{prefix}/#{i}", v, out)
    else:
        out[prefix] = np.asarray(obj)


def save_pytree_npz(path: str, params, meta: dict | None = None) -> None:
    """Save a nested dict/list/tuple-of-arrays pytree as a flat npz."""
    flat: dict[str, np.ndarray] = {}
    _flatten("", params, flat)
    if meta is not None:
        flat[_META_KEY] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
    np.savez(path, **flat)


def load_pytree_npz(path: str):
    """Inverse of save_pytree_npz. Returns (params, meta|None).

    List nodes ('#i' segments) come back as lists ordered by index."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    meta = None
    if _META_KEY in flat:
        meta = json.loads(bytes(flat.pop(_META_KEY).tobytes()).decode())

    root: dict = {}
    for key, arr in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)

    def _delistify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.startswith("#") for k in node):
            return [
                _delistify(node[f"#{i}"]) for i in range(len(node))
            ]
        return {k: _delistify(v) for k, v in node.items()}

    return _delistify(root), meta
