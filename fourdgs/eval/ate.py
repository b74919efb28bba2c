"""Absolute trajectory error: Horn alignment + RMSE.

Matches the reference evaluation (utils/eval_utils.py:164-218 `align` /
`evaluate_ate`, and the evo-APE wrapper :112-152): estimated and GT
camera centers are aligned with the closed-form Horn/umeyama rotation
(no scale) and the RMSE of aligned translation errors is reported.
Artifacts mirror the reference layout (pose.txt, ATE json, plots when
matplotlib is available).
"""

from __future__ import annotations

import json
import os

import numpy as np


def align_horn(model: np.ndarray, data: np.ndarray):
    """Align two (3, N) trajectories: finds rot, trans minimizing
    ||rot @ model + trans - data||^2 (Horn's method — reference
    eval_utils.py:164-198)."""
    model_zero = model - model.mean(1, keepdims=True)
    data_zero = data - data.mean(1, keepdims=True)
    W = model_zero @ data_zero.T
    U, _, Vt = np.linalg.svd(W.T)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    rot = U @ S @ Vt
    trans = data.mean(1, keepdims=True) - rot @ model.mean(1, keepdims=True)
    aligned = rot @ model + trans
    err = aligned - data
    trans_error = np.sqrt(np.sum(err * err, axis=0))
    return rot, trans, trans_error


def evaluate_ate(poses_est: list[np.ndarray], poses_gt: list[np.ndarray]) -> dict:
    """poses are world-to-camera 4x4; compares camera centers."""
    def centers(poses):
        return np.stack([-T[:3, :3].T @ T[:3, 3] for T in poses], axis=1)

    c_est = centers(poses_est)
    c_gt = centers(poses_gt)
    _, _, trans_error = align_horn(c_est, c_gt)
    return {
        "compared_pose_pairs": int(trans_error.shape[0]),
        "rmse": float(np.sqrt(np.mean(trans_error**2))),
        "mean": float(np.mean(trans_error)),
        "median": float(np.median(trans_error)),
        "std": float(np.std(trans_error)),
        "min": float(np.min(trans_error)),
        "max": float(np.max(trans_error)),
    }


def umeyama_alignment(model: np.ndarray, data: np.ndarray, with_scale: bool = False):
    """Umeyama alignment of (3, N) point sets: returns (rot, trans, scale)
    minimizing ||s * rot @ model + trans - data||^2 — the algorithm behind
    evo's align_trajectory (reference eval_utils.py:116-118 with
    correct_scale=monocular)."""
    mu_m = model.mean(1, keepdims=True)
    mu_d = data.mean(1, keepdims=True)
    model_zero = model - mu_m
    data_zero = data - mu_d
    n = model.shape[1]
    cov = data_zero @ model_zero.T / n
    U, d, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    rot = U @ S @ Vt
    if with_scale:
        var_m = (model_zero**2).sum() / n
        scale = float(np.trace(np.diag(d) @ S) / var_m)
    else:
        scale = 1.0
    trans = mu_d - scale * rot @ mu_m
    return rot, trans, scale


def evaluate_evo(
    poses_gt: list[np.ndarray],
    poses_est: list[np.ndarray],
    plot_dir: str,
    label: str = "final",
    monocular: bool = False,
) -> float:
    """evo-style APE (reference evaluate_evo, utils/eval_utils.py:112-152):
    Umeyama-align the estimated camera-to-world trajectory to GT
    (scale-corrected when monocular), take the translation-part APE, and
    write the full statistics json + 2D plot. Poses are camera-to-world
    4x4. Returns the RMSE."""
    t_gt = np.stack([T[:3, 3] for T in poses_gt], axis=1)   # (3, N)
    t_est = np.stack([T[:3, 3] for T in poses_est], axis=1)
    rot, trans, scale = umeyama_alignment(t_est, t_gt, with_scale=monocular)
    t_al = scale * rot @ t_est + trans
    err = np.linalg.norm(t_gt - t_al, axis=0)
    stats = {
        "rmse": float(np.sqrt(np.mean(err**2))),
        "mean": float(np.mean(err)),
        "median": float(np.median(err)),
        "std": float(np.std(err)),
        "min": float(np.min(err)),
        "max": float(np.max(err)),
        "sse": float(np.sum(err**2)),
    }
    os.makedirs(plot_dir, exist_ok=True)
    with open(os.path.join(plot_dir, f"stats_{label}.json"), "w") as f:
        json.dump(stats, f, indent=4)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 6))
        ax.set_title(f"ATE RMSE: {stats['rmse']:.5f}")
        ax.plot(t_gt[0], t_gt[1], "--", color="gray", label="gt")
        sc = ax.scatter(t_al[0], t_al[1], c=err, cmap="jet", s=4, label="est")
        fig.colorbar(sc, ax=ax, label="APE [m]")
        ax.legend()
        ax.set_aspect("equal", adjustable="datalim")
        fig.savefig(os.path.join(plot_dir, f"evo_2dplot_{label}.png"), dpi=90)
        plt.close(fig)
    except Exception:
        pass
    return stats["rmse"]


def write_trj_json(
    poses_est: list[np.ndarray],
    poses_gt: list[np.ndarray],
    frame_ids: list[int],
    plot_dir: str,
    label: str = "final",
) -> None:
    """Per-frame trajectory artifact trj_<label>.json with trj_id /
    trj_est / trj_gt camera-to-world matrices (reference eval_ate,
    utils/eval_utils.py:251-275)."""
    trj = {
        "trj_id": [int(i) for i in frame_ids],
        "trj_est": [np.linalg.inv(T).tolist() for T in poses_est],
        "trj_gt": [np.linalg.inv(T).tolist() for T in poses_gt],
    }
    os.makedirs(plot_dir, exist_ok=True)
    with open(os.path.join(plot_dir, f"trj_{label}.json"), "w") as f:
        json.dump(trj, f, indent=4)


def save_trajectory(
    poses_est: list[np.ndarray],
    poses_gt: list[np.ndarray],
    frame_ids: list[int],
    save_dir: str,
    label: str = "final",
    plot: bool = True,
) -> dict:
    """pose.txt (TUM format: id tx ty tz qx qy qz qw of camera-to-world),
    ATE json, and a trajectory plot (reference eval_utils.py:221-297)."""
    os.makedirs(os.path.join(save_dir, "plot"), exist_ok=True)
    from fourdgs.geometry.quaternion import rotmat_to_quat
    import jax.numpy as jnp

    lines = []
    for fid, T in zip(frame_ids, poses_est):
        T_wc = np.linalg.inv(T)
        q = np.asarray(rotmat_to_quat(jnp.asarray(T_wc[:3, :3], jnp.float32)))
        t = T_wc[:3, 3]
        lines.append(
            f"{fid} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
            f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}"
        )
    with open(os.path.join(save_dir, "pose.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")

    stats = evaluate_ate(poses_est, poses_gt)
    plot_dir = os.path.join(save_dir, "plot")
    with open(os.path.join(plot_dir, f"ATE_{label}.json"), "w") as f:
        json.dump(stats, f, indent=4)
    # evo-style APE stats (stats_<label>.json) + per-frame trajectories
    # (trj_<label>.json) — reference eval_ate, eval_utils.py:221-299
    poses_est_c2w = [np.linalg.inv(T) for T in poses_est]
    poses_gt_c2w = [np.linalg.inv(T) for T in poses_gt]
    ape_rmse = evaluate_evo(poses_gt_c2w, poses_est_c2w, plot_dir, label)
    stats = dict(stats, ape_rmse=ape_rmse)
    write_trj_json(poses_est, poses_gt, frame_ids, plot_dir, label)

    if plot:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            def centers(poses):
                return np.stack([-T[:3, :3].T @ T[:3, 3] for T in poses])

            ce, cg = centers(poses_est), centers(poses_gt)
            rot, trans, _ = align_horn(ce.T, cg.T)
            ce_al = (rot @ ce.T + trans).T
            fig, ax = plt.subplots(figsize=(6, 6))
            ax.plot(cg[:, 0], cg[:, 2], "k--", label="gt")
            ax.plot(ce_al[:, 0], ce_al[:, 2], "b-", label="est (aligned)")
            ax.legend()
            ax.set_title(f"ATE RMSE {stats['rmse']:.4f} m")
            fig.savefig(os.path.join(save_dir, "plot", f"ATE_{label}.png"), dpi=90)
            plt.close(fig)
        except Exception:
            pass
    return stats
