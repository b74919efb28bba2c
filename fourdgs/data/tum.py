"""TUM RGB-D sequence parser (also used for Bonn, same layout).

Association of rgb/depth/groundtruth timestamp lists and the 32 Hz frame
thinning match the reference TUMParser (utils/dataset.py:85-180).
"""

from __future__ import annotations

import os

import numpy as np

from fourdgs.data.base import BaseDataset


def quat_to_mat(qxyzw: np.ndarray) -> np.ndarray:
    """xyzw quaternion -> 4x4 homogeneous rotation."""
    x, y, z, w = qxyzw
    n = x * x + y * y + z * z + w * w
    s = 0.0 if n == 0 else 2.0 / n
    T = np.eye(4)
    T[:3, :3] = np.array(
        [
            [1 - s * (y * y + z * z), s * (x * y - w * z), s * (x * z + w * y)],
            [s * (x * y + w * z), 1 - s * (x * x + z * z), s * (y * z - w * x)],
            [s * (x * z - w * y), s * (y * z + w * x), 1 - s * (x * x + y * y)],
        ]
    )
    return T


class TUMParser:
    def __init__(self, input_folder: str, frame_rate: int = 32):
        self.input_folder = input_folder
        self.load_poses(input_folder, frame_rate)
        self.n_img = len(self.color_paths)

    @staticmethod
    def parse_list(filepath: str, skiprows: int = 0) -> np.ndarray:
        return np.loadtxt(filepath, delimiter=" ", dtype=str, skiprows=skiprows)

    @staticmethod
    def associate_frames(t_img, t_depth, t_pose, max_dt: float = 0.08):
        assoc = []
        for i, t in enumerate(t_img):
            j = int(np.argmin(np.abs(t_depth - t)))
            k = int(np.argmin(np.abs(t_pose - t)))
            if abs(t_depth[j] - t) < max_dt and abs(t_pose[k] - t) < max_dt:
                assoc.append((i, j, k))
        return assoc

    def load_poses(self, datapath: str, frame_rate: int):
        if os.path.isfile(os.path.join(datapath, "groundtruth.txt")):
            pose_list = os.path.join(datapath, "groundtruth.txt")
        else:
            pose_list = os.path.join(datapath, "pose.txt")
        image_list = os.path.join(datapath, "rgb.txt")
        depth_list = os.path.join(datapath, "depth.txt")

        image_data = self.parse_list(image_list)
        depth_data = self.parse_list(depth_list)
        pose_data = self.parse_list(pose_list, skiprows=1)
        pose_vecs = pose_data.astype(np.float64)

        t_img = image_data[:, 0].astype(np.float64)
        t_depth = depth_data[:, 0].astype(np.float64)
        t_pose = pose_vecs[:, 0]
        assoc = self.associate_frames(t_img, t_depth, t_pose)

        # thin to frame_rate (reference :148-153)
        indices = [0]
        for i in range(1, len(assoc)):
            t0 = t_img[assoc[indices[-1]][0]]
            t1 = t_img[assoc[i][0]]
            if t1 - t0 > 1.0 / frame_rate:
                indices.append(i)

        self.color_paths, self.depth_paths, self.poses, self.tstamps = [], [], [], []
        for ix in indices:
            i, j, k = assoc[ix]
            self.color_paths.append(os.path.join(datapath, image_data[i, 1]))
            self.depth_paths.append(os.path.join(datapath, depth_data[j, 1]))
            trans = pose_vecs[k][1:4]
            quat = pose_vecs[k][4:8]  # qx qy qz qw
            T = quat_to_mat(quat)     # camera-to-world
            T[:3, 3] = trans
            self.poses.append(np.linalg.inv(T))  # world-to-camera
            self.tstamps.append(t_img[i])


class TUMDataset(BaseDataset):
    def __init__(self, args, path: str, config):
        super().__init__(args, path, config)
        parser = TUMParser(path)
        self.num_imgs = parser.n_img
        self.color_paths = parser.color_paths
        self.depth_paths = parser.depth_paths
        self.poses = parser.poses
        self.tstamps = parser.tstamps
