#!/usr/bin/env python3
"""Generate the benchmark config tree (TUM / Bonn / CoFusion).

Key schema and hyperparameter values mirror the reference's YAML surface
(/root/reference/configs/rgbd/**) so runs are comparable; the files are
emitted by this generator rather than copied."""

import os

import yaml

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

TUM_CALIB = dict(
    fx=535.4, fy=539.2, cx=320.1, cy=247.6,
    k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0,
    distorted=False, width=640, height=480, depth_scale=5000.0,
)
BONN_CALIB = dict(
    fx=542.822841, fy=542.576870, cx=315.593520, cy=237.756098,
    k1=0.039903, k2=-0.099343, p1=-0.00073, p2=-0.000144, k3=0.0,
    distorted=True, width=640, height=480, depth_scale=5000.0,
)
BONN_BOUND = [[-8.0, -8.5, -7.0], [8.5, 8.5, 8.0]]


def base_config(dataset_type, save_dir="results", tracking_itr=100):
    return {
        "Results": {
            "save_results": True,
            "save_dir": save_dir,
            "save_trj": True,
            "save_trj_kf_intv": 5,
            "use_gui": False,  # TPU build: headless by default
            "eval_rendering": False,
            "use_wandb": False,
        },
        "Dataset": {
            "type": dataset_type,
            "sensor_type": "depth",
            "pcd_downsample": 128,
            "pcd_downsample_init": 32,
            "adaptive_pointsize": True,
            "point_size": 0.01,
        },
        "Training": {
            "init_itr_num": 1050,
            "init_gaussian_update": 100,
            "init_gaussian_reset": 500,
            "init_gaussian_th": 0.005,
            "init_gaussian_extent": 30,
            "tracking_itr_num": tracking_itr,
            "mapping_itr_num": 50,
            "gaussian_update_every": 150,
            "gaussian_update_offset": 50,
            "gaussian_th": 0.7,
            "gaussian_extent": 1.0,
            "gaussian_reset": 2001,
            "size_threshold": 20,
            "kf_interval": 5,
            "window_size": 8,
            "pose_window": 3,
            "edge_threshold": 1.1,
            "rgb_boundary_threshold": 0.01,
            "alpha": 0.9,
            "kf_translation": 0.08,
            "kf_min_translation": 0.05,
            "kf_overlap": 0.9,
            "kf_cutoff": 0.3,
            "prune_mode": "slam",
            "single_thread": False,
            "spherical_harmonics": False,
            "flow_loss": 3,
            "monocular": False,
            "lr": {"cam_rot_delta": 0.003, "cam_trans_delta": 0.001},
        },
        "opt_params": {
            "iterations": 30000,
            "position_lr_init": 0.00016,
            "position_lr_final": 0.0000016,
            "position_lr_delay_mult": 0.01,
            "position_lr_max_steps": 30000,
            "feature_lr": 0.0025,
            "opacity_lr": 0.05,
            "scaling_lr": 0.001,
            "rotation_lr": 0.001,
            "percent_dense": 0.01,
            "lambda_dssim": 0.2,
            "densification_interval": 100,
            "opacity_reset_interval": 3000,
            "densify_from_iter": 500,
            "densify_until_iter": 15000,
            "densify_grad_threshold": 0.0002,
            "deformation_lr_init": 0.00016,
            "deformation_lr_final": 0.000016,
            "deformation_lr_delay_mult": 0.01,
            "grid_lr_init": 0.0016,
            "grid_lr_final": 0.00016,
        },
        "model_params": {
            "sh_degree": 0,
            "white_background": False,
            "dynamic_model": True,
        },
        "pipeline_params": {
            "convert_SHs_python": False,
            "compute_cov3D_python": False,
        },
    }


def seq(inherit, dataset_path, calib, bound=None, training=None, dataset_extra=None,
        mhp=None):
    cfg = {
        "inherit_from": inherit,
        "Dataset": {"dataset_path": dataset_path, "Calibration": dict(calib)},
        "Training": dict({"single_thread": True}, **(training or {})),
    }
    if bound is not None:
        cfg["Dataset"]["bound"] = bound
    if dataset_extra:
        cfg["Dataset"].update(dataset_extra)
    if mhp:
        cfg["ModelHiddenParams"] = mhp
    return cfg


def write(path, cfg):
    full = os.path.join(ROOT, path)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)


def main():
    # ---- TUM ----
    write("configs/rgbd/tum/base_config.yaml", base_config("tum"))
    tum_inherit = "configs/rgbd/tum/base_config.yaml"
    tum_bound = [[-8.0, -2.5, -5.0], [7.0, 8.5, 5.0]]
    write(
        "configs/rgbd/tum/fr3_sitting_static.yaml",
        seq(
            tum_inherit,
            "datasets/tum/rgbd_dataset_freiburg3_sitting_static",
            TUM_CALIB,
            bound=tum_bound,
            training={
                "plane_tv_weight": 0.0002,
                "time_smoothness_weight": 0.001,
                "l1_time_planes": 0.0001,
            },
            mhp={
                "net_width": 64,
                "multires": [1, 2, 4, 8],
                "kplanes_config": {
                    "grid_dimensions": 2,
                    "input_coordinate_dim": 4,
                    "output_coordinate_dim": 32,
                    "resolution": [64, 64, 64, 345],
                },
            },
        ),
    )
    for name in ["fr3_sitting_xyz", "fr3_sitting_rpy"]:
        write(
            f"configs/rgbd/tum/{name}.yaml",
            seq(tum_inherit, f"datasets/tum/rgbd_dataset_freiburg3_{name[4:]}".replace("sitting_", "sitting_"), TUM_CALIB),
        )
    for name in ["fr3_walking_static", "fr3_walking_xyz", "fr3_walking_rpy"]:
        write(
            f"configs/rgbd/tum/{name}.yaml",
            seq(
                tum_inherit,
                f"datasets/tum/rgbd_dataset_freiburg3_{name[4:]}",
                TUM_CALIB,
                dataset_extra={"seg_chair": True},
            ),
        )

    # ---- Bonn ----
    write("configs/rgbd/bonn/base_config.yaml", base_config("tum", save_dir="results_bonn", tracking_itr=200))
    bonn_inherit = "configs/rgbd/bonn/base_config.yaml"
    bonn_seqs = {
        "ballon": ("rgbd_bonn_balloon", {"dystart": 32}),
        "ballon2": ("rgbd_bonn_balloon2", {"dystart": 43}),
        "bonn_ps_trk": ("rgbd_bonn_person_tracking", {"flow_loss": 3, "flow_loss_fine": 2}),
        "bonn_ps_trk1": ("rgbd_bonn_person_tracking2", {"delta": 4, "flow_loss": 3, "flow_loss_fine": 1}),
        "placing_box": ("rgbd_bonn_placing_nonobstructing_box", {"dystart": 241}),
        "placing_box2": ("rgbd_bonn_placing_nonobstructing_box2", {"dystart": 262}),
        "placing_box3": ("rgbd_bonn_placing_nonobstructing_box3", {"dystart": 348}),
        "remove_box": ("rgbd_bonn_removing_nonobstructing_box", {"dystart": 170}),
        "synchronous": ("rgbd_bonn_synchronous", {"delta": 4, "flow_loss": 3, "flow_loss_fine": 1}),
        "synchronous2": ("rgbd_bonn_synchronous2", {"dystart": 120}),
    }
    for name, (path, training) in bonn_seqs.items():
        mhp = None
        if name.startswith("synchronous"):
            mhp = {"position_lr_init": 0.00016, "position_lr_final": 0.00016}
        write(
            f"configs/rgbd/bonn/{name}.yaml",
            seq(bonn_inherit, f"datasets/tum/{path}", BONN_CALIB, bound=BONN_BOUND, training=training, mhp=mhp),
        )

    # ---- CoFusion ----
    write("configs/rgbd/cofusion/base_config.yaml", base_config("CoFusion"))
    cf_inherit = "configs/rgbd/cofusion/base_config.yaml"
    cf_car = dict(fx=564.3, fy=564.3, cx=480, cy=270, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0, distorted=False, width=960, height=540, depth_scale=1.0)
    cf_528 = dict(fx=528, fy=528, cx=320, cy=240, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0, distorted=False, width=640, height=480, depth_scale=1000.0)
    cf_room = dict(fx=360, fy=360, cx=320, cy=240, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0, distorted=False, width=640, height=480, depth_scale=1.0)
    write("configs/rgbd/cofusion/car.yaml", seq(cf_inherit, "datasets/cofusion/car4-full", cf_car, training={"mapping_itr_num": 100}))
    write("configs/rgbd/cofusion/car_1.yaml", seq(cf_inherit, "datasets/cofusion/car4-full", dict(cf_car, start=0, end=-1), training={"dystart": 73, "flow_loss": 5, "flow_loss_fine": 3, "delta": 4}))
    write("configs/rgbd/cofusion/clock.yaml", seq(cf_inherit, "datasets/cofusion/sliding-clock", cf_528, dataset_extra={"seg_clock": True}))
    write("configs/rgbd/cofusion/room4.yaml", seq(cf_inherit, "datasets/cofusion/room4-full", cf_room, training={"mapping_itr_num": 150}))
    write("configs/rgbd/cofusion/room4_1.yaml", seq(cf_inherit, "datasets/cofusion/room4-full", dict(cf_room, start=562, end=636), training={"flow_loss": 1}))
    write("configs/rgbd/cofusion/room4_2.yaml", seq(cf_inherit, "datasets/cofusion/room4-full", dict(cf_room, start=771, end=-1), training={"flow_loss": 1}))
    write("configs/rgbd/cofusion/teddy.yaml", seq(cf_inherit, "datasets/cofusion/teddy", dict(cf_528, depth_scale=5000), training={"dystart": 90}, dataset_extra={"seg_teddy": True}))

    print("configs written")


if __name__ == "__main__":
    main()
