"""Live Intel Realsense RGB-D capture.

TPU-native counterpart of the reference's RealsenseDataset
(utils/dataset.py:721-811): the camera runs on the host (USB) and only
the per-frame arrays enter the device pipeline, so capture behaves like
any other dataset to the SLAM runner — including the double-buffered
prefetch wrapper (fourdgs/data/prefetch.py), which hides the 30 Hz
`wait_for_frames` latency behind device compute.

Differences from the reference, by design:
  * intrinsics/undistortion maps come from the device's calibration at
    stream start and OVERRIDE the YAML calibration block (the reference
    does the same silently; here it's logged),
  * frames are returned in this repo's (image_chw, depth, pose_w2c,
    motion_mask) protocol; live capture has no GT pose, so pose is
    identity and ATE evaluation is meaningless (matches the reference,
    which returns torch.eye(4), dataset.py:784).

Requires pyrealsense2 + a physical camera; neither exists in the CI
container, where construction raises a clear RuntimeError (covered by
tests/test_datasets.py).
"""

from __future__ import annotations

import numpy as np

from fourdgs.data.base import BaseDataset

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class RealsenseDataset(BaseDataset):
    def __init__(self, args, path, config):
        try:
            import pyrealsense2 as rs
        except ImportError as e:
            raise RuntimeError(
                "Realsense live capture needs pyrealsense2 and a camera; "
                "neither is available in this environment"
            ) from e

        super().__init__(args, path, config)
        self._rs = rs
        self.pipeline = rs.pipeline()
        # reference streams 1280x720 color at 30 Hz (dataset.py:725,734)
        self.w, self.h = 1280, 720

        self.rs_config = rs.config()
        self.rs_config.enable_stream(
            rs.stream.color, self.w, self.h, rs.format.bgr8, 30
        )
        if self.has_depth:
            self.rs_config.enable_stream(rs.stream.depth)

        self.profile = self.pipeline.start(self.rs_config)
        if self.has_depth:
            # depth aligned into the color frame (dataset.py:740-742)
            self.align = rs.align(rs.stream.color)

        # fixed exposure / white balance for photometric consistency —
        # the exposure-compensation variables the tracker optimizes
        # assume the sensor isn't ALSO auto-adapting (dataset.py:744-748)
        rgb_sensor = self.profile.get_device().query_sensors()[1]
        rgb_sensor.set_option(rs.option.enable_auto_exposure, False)
        rgb_sensor.set_option(rs.option.enable_auto_white_balance, False)
        rgb_sensor.set_option(rs.option.exposure, 200)

        # calibration FROM the device, overriding the YAML block
        rgb_profile = rs.video_stream_profile(
            self.profile.get_stream(rs.stream.color)
        )
        intr = rgb_profile.get_intrinsics()
        self.fx, self.fy = intr.fx, intr.fy
        self.cx, self.cy = intr.ppx, intr.ppy
        self.width, self.height = intr.width, intr.height
        self.K = np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]]
        )
        self.dist_coeffs = np.asarray(intr.coeffs)
        self.distorted = True
        if cv2 is not None:
            self.map1x, self.map1y = cv2.initUndistortRectifyMap(
                self.K, self.dist_coeffs, np.eye(3), self.K,
                (self.w, self.h), cv2.CV_32FC1,
            )
        else:
            self.map1x = self.map1y = None

        if self.has_depth:
            depth_sensor = self.profile.get_device().first_depth_sensor()
            # device units -> meters (reference multiplies the raw frame
            # by get_depth_scale(), dataset.py:774)
            self.depth_scale = float(depth_sensor.get_depth_scale())

        # live stream: "length" is the run's frame budget
        self.num_imgs = int(config["Dataset"].get("num_frames", 10_000))

    def stop(self):
        self.pipeline.stop()

    def __getitem__(self, idx: int):
        frameset = self.pipeline.wait_for_frames()
        depth = None
        if self.has_depth:
            aligned = self.align.process(frameset)
            rgb_frame = aligned.get_color_frame()
            depth_frame = aligned.get_depth_frame()
            depth = (
                np.asarray(depth_frame.get_data(), np.float32)
                * self.depth_scale
            )
            depth[depth < 0] = 0
            np.nan_to_num(depth, nan=1000, copy=False)
        else:
            rgb_frame = frameset.get_color_frame()

        img = np.asanyarray(rgb_frame.get_data())[..., ::-1]  # BGR -> RGB
        if self.map1x is not None:
            img = cv2.remap(img, self.map1x, self.map1y, cv2.INTER_LINEAR)

        image = np.clip(
            img.astype(np.float32) / 255.0, 0.0, 1.0
        ).transpose(2, 0, 1)
        pose = np.eye(4)  # no GT pose on a live stream

        h, w = image.shape[1], image.shape[2]
        dynamic = np.zeros((h, w), bool)
        if self.mask_fn is not None:
            try:
                dynamic = self.mask_fn(img, depth)
            except TypeError:
                dynamic = self.mask_fn(img)
        return image, depth, pose, ~dynamic
