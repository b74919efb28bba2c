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


# ---------------------------------------------------------------------------
# Named pytree serialization (deform artifacts + checkpoint sections)
# ---------------------------------------------------------------------------


def _path_str(path) -> str:
    """'.mlp.weights[0]' style key from a tree path."""
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(f".{p.name}")
        elif hasattr(p, "idx"):
            parts.append(f"[{p.idx}]")
        elif hasattr(p, "key"):
            parts.append(f"[{p.key!r}]")
        else:
            parts.append(f".{p}")
    return "".join(parts) or "."


def tree_to_named_arrays(tree) -> dict:
    """Flatten a pytree to {named_path: np.ndarray} — self-describing
    artifacts (vs positional leaf.N), like the reference's named
    state_dict entries (deform_model.py:54-57)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {_path_str(path): np.asarray(leaf) for path, leaf in flat}


def tree_from_named_arrays(data, template, shape_adaptive: bool = True):
    """Rebuild a pytree from named arrays. With shape_adaptive (the
    reference's load semantics, time_utils.py:863-883), a saved leaf
    whose shape differs from the template is copied into the template's
    buffer over the overlapping region — so checkpoints written at a
    different node count / capacity still load."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, tmpl in flat:
        key = _path_str(path)
        if key not in data:
            leaves.append(tmpl)  # new field since the save: keep template
            continue
        saved = np.asarray(data[key])
        tmpl_np = np.asarray(tmpl)
        if saved.shape == tmpl_np.shape:
            leaves.append(saved.astype(tmpl_np.dtype, copy=False))
        elif shape_adaptive and saved.ndim == tmpl_np.ndim:
            out = tmpl_np.copy()
            region = tuple(
                slice(0, min(a, b)) for a, b in zip(saved.shape, out.shape)
            )
            out[region] = saved[region]
            leaves.append(out)
        else:
            raise ValueError(
                f"checkpoint leaf {key}: shape {saved.shape} incompatible "
                f"with template {tmpl_np.shape}"
            )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_deform(path: str, deform, deform_adam=None) -> None:
    """Named deform artifact (reference deform/iteration_*/deform.pth,
    deform_model.py:54-57): control nodes + MLP under 'deform', optional
    Adam moments under 'adam'."""
    arrays = {f"deform{k}": v for k, v in tree_to_named_arrays(deform).items()}
    if deform_adam is not None:
        arrays.update(
            {f"adam{k}": v for k, v in tree_to_named_arrays(deform_adam).items()}
        )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)


def load_deform(path: str, deform_template, adam_template=None):
    """Shape-adaptive load of a named deform artifact (reference
    load_state_dict with node-count adaptation, time_utils.py:863-883)."""
    data = np.load(path)
    dd = {k[len("deform"):]: data[k] for k in data.files if k.startswith("deform")}
    deform = tree_from_named_arrays(dd, deform_template)
    adam = None
    if adam_template is not None:
        ad = {k[len("adam"):]: data[k] for k in data.files if k.startswith("adam")}
        if ad:
            adam = tree_from_named_arrays(ad, adam_template)
    return deform, adam
