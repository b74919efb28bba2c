"""Mid-run checkpoint/resume for the full SLAM state.

The reference only saves final artifacts (PLY + deform .pth) with no
resume path (SURVEY §5); here the whole device state (Gaussian map, Adam
moments, keyframe store) round-trips through a single npz so runs can be
suspended and resumed."""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten(prefix: str, tree) -> dict:
    leaves = {}
    flat, treedef = jax.tree.flatten(tree)
    for i, leaf in enumerate(flat):
        leaves[f"{prefix}.{i}"] = np.asarray(leaf)
    return leaves


def save_state(path: str, gmap, adam, store, host_state: dict) -> None:
    arrays = {}
    arrays.update(_flatten("gmap", gmap))
    arrays.update(_flatten("adam", adam))
    arrays.update(_flatten("store", store))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **arrays)
    with open(path + ".meta.json", "w") as f:
        json.dump(host_state, f)


def load_state(path: str, gmap_template, adam_template, store_template):
    data = np.load(path)

    def unflatten(prefix, template):
        flat, treedef = jax.tree.flatten(template)
        leaves = [data[f"{prefix}.{i}"] for i in range(len(flat))]
        return jax.tree.unflatten(treedef, leaves)

    gmap = unflatten("gmap", gmap_template)
    adam = unflatten("adam", adam_template)
    store = unflatten("store", store_template)
    with open(path + ".meta.json") as f:
        host_state = json.load(f)
    return gmap, adam, store, host_state
