import os

import numpy as np

from fourdgs.utils.config import load_config, merge_hparams, hidden_params_defaults


def test_load_config_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(
        "Training:\n  alpha: 0.9\n  kf_interval: 5\nDataset:\n  type: tum\n"
    )
    child = tmp_path / "child.yaml"
    child.write_text(
        f"inherit_from: {base}\nTraining:\n  alpha: 0.95\nResults:\n  save_dir: x\n"
    )
    cfg = load_config(str(child))
    assert cfg["Training"]["alpha"] == 0.95  # child wins
    assert cfg["Training"]["kf_interval"] == 5  # inherited
    assert cfg["Results"]["save_dir"] == "x"
    assert cfg.Dataset.type == "tum"  # attribute access


def test_load_repo_configs():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(here, "configs/rgbd/tum/fr3_sitting_static.yaml"))
    assert cfg["Dataset"]["Calibration"]["fx"] == 535.4
    assert cfg["Training"]["single_thread"] is True
    assert cfg["Training"]["window_size"] == 8
    assert cfg["opt_params"]["densify_grad_threshold"] == 0.0002


def test_merge_hparams():
    cfg = {
        "ModelHiddenParams": {
            "net_width": 128,
            "kplanes_config": {"resolution": [64, 64, 64, 345]},
        }
    }
    hp = merge_hparams(cfg)
    assert hp.net_width == 128
    assert hp.kplanes_config.resolution == [64, 64, 64, 345]
    assert hp.kplanes_config.output_coordinate_dim == 32  # default preserved
    assert hp.node_num == 512
    assert hp.K == 3


def test_hidden_defaults_stable():
    hp = hidden_params_defaults()
    assert hp.deform_type == "node"
    assert hp.no_do is True and hp.no_dshs is True
    np.testing.assert_allclose(hp.position_lr_init, 0.00016)
