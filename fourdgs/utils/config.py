"""Config system: recursive-inheritance YAML loader + deformation
hyperparameter defaults.

Behavior-compatible with the reference's two-layer config
(utils/config_utils.py:4-50 `load_config`/`update_recursive`, and
arguments.py:74-149 `ModelHiddenParams` defaults merged from the YAML's
`ModelHiddenParams:` section by slam.py:30-37 `merge_hparams`). We keep
plain nested dicts with attribute access (no munch dependency).
"""

from __future__ import annotations

import os
from typing import Any

import yaml


class ConfigDict(dict):
    """dict with attribute access, recursively applied."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def to_plain(self) -> dict:
        return ConfigDict.unwrap(self)

    @staticmethod
    def unwrap(obj: Any) -> Any:
        if isinstance(obj, dict):
            return {k: ConfigDict.unwrap(v) for k, v in obj.items()}
        if isinstance(obj, list):
            return [ConfigDict.unwrap(v) for v in obj]
        return obj

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, dict):
            return ConfigDict({k: ConfigDict.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [ConfigDict.wrap(v) for v in obj]
        return obj


def update_recursive(dict1: dict, dict2: dict) -> None:
    """Deep-merge dict2 into dict1 (reference utils/config_utils.py:36-50)."""
    for k, v in dict2.items():
        if k not in dict1:
            dict1[k] = {} if isinstance(v, dict) else v
        if isinstance(v, dict):
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v


def load_config(path: str, default_path: str | None = None) -> ConfigDict:
    """Load a YAML config, recursively resolving the `inherit_from` key
    (child values win). Relative `inherit_from` paths are tried against
    the CWD first (reference behaviour) and then against the config file's
    own directory tree so configs work from any CWD."""
    with open(path, "r") as f:
        cfg_special = yaml.safe_load(f) or {}

    inherit_from = cfg_special.get("inherit_from")
    if inherit_from is not None:
        candidates = [inherit_from]
        here = os.path.dirname(os.path.abspath(path))
        candidates.append(os.path.join(here, os.path.basename(inherit_from)))
        # also try resolving against repo root (configs/... style paths)
        for up in range(1, 5):
            root = os.path.abspath(os.path.join(here, *[".."] * up))
            candidates.append(os.path.join(root, inherit_from))
        for cand in candidates:
            if os.path.exists(cand):
                inherit_from = cand
                break
        cfg = dict(load_config(inherit_from, default_path))
    elif default_path is not None:
        with open(default_path, "r") as f:
            cfg = yaml.safe_load(f) or {}
    else:
        cfg = {}

    update_recursive(cfg, cfg_special)
    return ConfigDict.wrap(cfg)


def hidden_params_defaults() -> ConfigDict:
    """Defaults of the deformation hyperparameter group
    (reference arguments.py:74-149). Only knobs the TPU pipeline consumes
    are kept live; the reference's explicitly-dead ones are preserved for
    config compatibility but unused."""
    return ConfigDict.wrap(
        {
            "net_width": 64,
            "defor_depth": 1,
            "timebase_pe": 4,
            "posebase_pe": 10,
            "bounds": 1.6,
            "plane_tv_weight": 0.0001,
            "time_smoothness_weight": 0.01,
            "l1_time_planes": 0.0001,
            "kplanes_config": {
                "grid_dimensions": 2,
                "input_coordinate_dim": 4,
                "output_coordinate_dim": 32,
                "resolution": [64, 64, 64, 25],
            },
            "multires": [1, 2, 4, 8],
            "no_dx": False,
            "no_grid": False,
            "no_ds": False,
            "no_dr": False,
            "no_do": True,
            "no_dshs": True,
            "K": 3,
            "deform_type": "node",
            "hyper_dim": 0,
            "node_num": 512,
            "pred_opacity": False,
            "pred_color": False,
            "use_hash": False,
            "d_rot_as_res": True,
            "local_frame": True,
            "node_enable_densify_prune": False,
            "no_arap_loss": False,
            "max_d_scale": -1.0,
            "is_scene_static": False,
            "position_lr_init": 0.00016,
            "position_lr_final": 0.0000016,
            "position_lr_delay_mult": 0.01,
            "position_lr_max_steps": 30_000,
            "deform_lr_max_steps": 40_000,
            "feature_lr": 0.0025,
            "opacity_lr": 0.05,
            "scaling_lr": 0.001,
            "rotation_lr": 0.001,
            "percent_dense": 0.01,
            "deform_lr_scale": 1.0,
            "node_max_num_ratio_during_init": 16,
        }
    )


def merge_hparams(config: dict) -> ConfigDict:
    """Overlay the YAML's ModelHiddenParams section onto the defaults
    (reference slam.py:30-37)."""
    hp = hidden_params_defaults()
    overrides = config.get("ModelHiddenParams", {}) or {}
    update_recursive(hp, overrides)
    return ConfigDict.wrap(hp)
