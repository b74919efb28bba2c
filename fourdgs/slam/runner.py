"""SLAM orchestrator: one process, jitted tracking/mapping programs.

Replaces the reference's frontend/backend/GUI process triple + mp.Queue
protocol (slam.py:100-150, utils/slam_frontend.py:610-833,
utils/slam_backend.py:874-1007). The shipped configs all run
`single_thread: True` — strict frontend/backend alternation — so a
single host loop alternating jitted `track_frame` and `map_chunk`
programs is behavior-preserving and removes every serialization/deep-copy
(clone_obj) from the pipeline: the map lives in HBM and both programs
read/write it functionally.

Per-frame flow (mirroring the reference's frontend run loop):
  frame 0: pose <- GT, spawn Gaussians from RGB-D, 1050-iteration map
           init with densify-every-100 + opacity reset at 500
           (initialize_map, slam_backend.py:238-297),
  else:    track -> keyframe test (translation/covisibility + forced
           every kf_interval) -> on keyframe: spawn Gaussians on
           uncovered pixels, window update, mapping chunks with
           densify/reset cadence + prune pass, pose resync.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs.models import gaussian_map as gm
from fourdgs.ops.rasterize import RasterConfig
from fourdgs.slam import keyframes as kfs
from fourdgs.slam.camera import Frame, Intrinsics
from fourdgs.slam.losses import median_depth
from fourdgs.slam.mapping import (
    MappingConfig,
    init_pose_adam,
    map_chunk,
    render_keyframe,
    window_visibility,
)
from fourdgs.slam.tracking import TrackingConfig, track_frame
from fourdgs.utils.logging import Log


class SLAM:
    def __init__(
        self,
        config,
        save_dir: str | None = None,
        save_interval: int = 50,
        dynamic: bool = False,
        max_frames: int | None = None,
        capacity: int = 1 << 14,
        max_capacity: int = 1 << 18,
        max_keyframes: int = 512,
        raster: RasterConfig | None = None,
    ):
        from fourdgs.data import load_dataset

        self.config = config
        self.save_dir = save_dir
        self.save_interval = save_interval
        self.dynamic = dynamic
        tr = config["Training"]
        self.kf_interval = int(tr.get("kf_interval", 5))
        self.window_size = int(tr.get("window_size", 8))
        self.pose_window = int(tr.get("pose_window", 3))
        self.kf_translation = float(tr.get("kf_translation", 0.08))
        self.kf_min_translation = float(tr.get("kf_min_translation", 0.05))
        self.kf_overlap = float(tr.get("kf_overlap", 0.9))
        self.kf_cutoff = float(tr.get("kf_cutoff", 0.3))
        self.alpha = float(tr.get("alpha", 0.95))
        self.mapping_itr_num = int(tr.get("mapping_itr_num", 50))
        self.init_itr_num = int(tr.get("init_itr_num", 1050))
        self.init_gaussian_update = int(tr.get("init_gaussian_update", 100))
        self.init_gaussian_reset = int(tr.get("init_gaussian_reset", 500))
        self.init_gaussian_th = float(tr.get("init_gaussian_th", 0.005))
        self.init_gaussian_extent = float(tr.get("init_gaussian_extent", 30))
        self.gaussian_update_every = int(tr.get("gaussian_update_every", 150))
        self.gaussian_update_offset = int(tr.get("gaussian_update_offset", 50))
        self.gaussian_th = float(tr.get("gaussian_th", 0.7))
        self.gaussian_extent = float(tr.get("gaussian_extent", 1.0))
        self.gaussian_reset = int(tr.get("gaussian_reset", 2001))
        self.size_threshold = float(tr.get("size_threshold", 20))
        self.tracking_itr_num = int(tr.get("tracking_itr_num", 100))
        self.kf_iters = int(tr.get("keyframe_mapping_iters", 200))
        self.dystart = int(tr.get("dystart", 0))
        # rm_initdy: depth-reprojection consistency masking vs frame 0
        # (reference map(..., rm_initdy), slam_backend.py:306,465-469;
        # never enabled at the shipped call sites :887-999, so default off)
        self.rm_initdy = bool(tr.get("rm_initdy", False))
        op = config.get("opt_params", {})
        self.densify_grad_threshold = float(op.get("densify_grad_threshold", 2e-4))
        ds = config["Dataset"]

        self.intr = Intrinsics.from_config(config)
        self.dataset = load_dataset(None, ds.get("dataset_path", ""), config)
        if ds.get("type") in ("tum", "CoFusion") and config.get(
            "model_params", {}
        ).get("dynamic_model", True):
            from fourdgs.perception.segmentation import make_segmenter

            seg = make_segmenter(config, self.intr)
            if getattr(seg, "pose_provider", False) is None:
                # geometric fallback segmenter: feed it the runner's
                # constant-velocity prediction from TRACKED poses (never
                # the dataset's GT — that would GT-assist segmentation)
                seg.pose_provider = self._predict_pose
            self.dataset.mask_fn = seg
        n_frames = len(self.dataset)
        if max_frames is not None:
            n_frames = min(n_frames, max_frames)
        self.n_frames = n_frames

        self.monocular = bool(tr.get("monocular", False))
        # multi-chip mapping: shard the mapping view set over a device mesh
        # (Training.mesh_devices > 1). Views are data-parallel, the map is
        # replicated, param-grads psum over ICI — see map_chunk(mesh=...).
        self.mesh = None
        mesh_devices = int(tr.get("mesh_devices", 0))
        if mesh_devices > 1:
            import jax as _jax

            avail = len(_jax.devices())
            if avail >= mesh_devices:
                from fourdgs.parallel import make_mesh

                self.mesh = make_mesh(mesh_devices)
            else:
                print(
                    f"[runner] mesh_devices={mesh_devices} requested but only "
                    f"{avail} devices available — running single-device"
                )
        self.max_capacity = max_capacity
        if raster is None:
            import jax as _jax

            # on CPU the Pallas tile kernel only runs in interpret mode
            # (a debug path, ~100x slow); default to the numerically
            # equivalent pure-jnp oracle compositor there. Kernel parity
            # vs the oracle is pinned by tests/test_rasterizer.py.
            raster = RasterConfig(use_oracle=_jax.default_backend() == "cpu")
        self._raster_base = raster
        # occupancy-adaptive pair budget: measured high-water mark of real
        # (tile, gaussian) pairs per view and an overflow-driven floor;
        # 0 = no measurement yet (fall back to the capacity heuristic)
        self._pairs_hwm = 0
        self._pairs_floor = 0
        self.raster = self._raster_for_capacity(capacity)
        self.track_cfg = TrackingConfig(
            max_iters=self.tracking_itr_num,
            monocular=self.monocular,
            lr_rot=float(tr["lr"]["cam_rot_delta"]),
            lr_trans=float(tr["lr"]["cam_trans_delta"]),
            alpha=self.alpha,
            raster=self.raster._replace(with_n_touched=False),
        )
        pl_init = float(op.get("position_lr_init", 0.00016))
        pl_final = float(op.get("position_lr_final", 1.6e-6))
        self.map_cfg = MappingConfig(
            num_window_views=self.window_size,
            pose_window=self.pose_window,
            alpha=self.alpha,
            monocular=self.monocular,
            lr_rot=float(tr["lr"]["cam_rot_delta"]) * 0.5,
            lr_trans=float(tr["lr"]["cam_trans_delta"]) * 0.5,
            rm_dynamic=True,
            raster=self.raster._replace(with_n_touched=False),
            xyz_lr_ratio=pl_final / max(pl_init, 1e-30),
            xyz_lr_max_steps=int(op.get("position_lr_max_steps", 30000)),
        )

        self.gmap = gm.empty_map(capacity)
        self.adam = gm.init_adam(capacity)
        self.store = kfs.empty_store(max_keyframes, self.intr.height, self.intr.width)
        self.key = jax.random.key(0)

        # ---- 4D deformation state (lazy until dystart) ----
        from fourdgs.utils.config import merge_hparams

        self.hp = merge_hparams(config)
        self.deform = None
        self.deform_adam = None
        self.deform_init = False
        self.time_interval = 1.0 / max(self.n_frames, 1)
        self.flow_weight = float(tr.get("flow_loss", 3))
        # second-half mapping-phase flow weight (reference
        # slam_backend.py:352-356: flow_loss_fine if present else flow_loss)
        self.flow_weight_fine = float(
            tr.get("flow_loss_fine", tr.get("flow_loss", 3))
        )
        self.flow_cache = None
        if self.dynamic:
            from fourdgs.perception.flow import FlowCache, SyntheticFlowProvider

            if ds.get("type") == "synthetic":
                self.flow_cache = FlowCache(SyntheticFlowProvider(self.dataset))
            else:
                # flow network selection (the reference's generate_flow
                # swap point, utils/camera_utils.py:368-407: RAFT default,
                # GMA as the commented alternative — here a config knob)
                flow_model = str(tr.get("flow_model", "raft")).lower()
                try:
                    if flow_model == "gma":
                        from fourdgs.perception.gma import GmaFlowProvider

                        self.flow_cache = FlowCache(GmaFlowProvider())
                    else:
                        from fourdgs.perception.raft import RaftFlowProvider

                        self.flow_cache = FlowCache(RaftFlowProvider())
                except Exception as e:
                    Log(f"{flow_model.upper()} unavailable ({e}); flow loss disabled")
                    self.flow_weight = 0.0

        # host bookkeeping
        self.poses_est: dict[int, np.ndarray] = {}
        self.exposures: dict[int, np.ndarray] = {}
        self.kf_slot: dict[int, int] = {}
        self.occ_visibility: dict[int, np.ndarray] = {}
        self.window: list[int] = []
        self.kf_indices: list[int] = []
        # monotone count of keyframes EVER stored: slot assignment and
        # the forced-KF cadence key off this, not len(kf_indices), so
        # store wraparound (capacity exceeded on long sequences) evicts
        # deterministically instead of silently remapping old KF ids
        self.kf_total = 0
        self.iteration_count = 0
        self.median_depth = 2.0
        self.rng = np.random.default_rng(0)
        # RGB-D starts initialized (reference slam_backend.py:78,151
        # `self.initialized = not self.monocular`): the 300-iteration
        # "initial BA" at window-fill is a MONOCULAR-only recovery path —
        # in RGB-D mode every keyframe runs the standard 200-iteration
        # mapping phase from the start (slam_backend.py:996-998 hardcodes
        # map(iters=200); the iter_per_kf=300 branch at :943-951 is dead
        # when initialized is True)
        self.initialized = not self.monocular
        self.metrics: dict = {}
        self._wandb = None
        if config.get("Results", {}).get("use_wandb", False):
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project="fourdgs-slam", config=dict(config))
            except Exception:
                Log("wandb unavailable; logging disabled")

    def _wandb_log(self, data: dict):
        if self._wandb is not None:
            try:
                self._wandb.log(data)
            except Exception:
                pass

    def _raster_for_capacity(self, capacity: int) -> RasterConfig:
        """Size the pair budget (max_pairs): every downstream shape — the
        binning sorts, the pair gathers, the Pallas chunk grid, the
        backward reduction — scales with it, so right-sizing it is worth
        3-5x on a mapping iteration at typical occupancy. Sized from the
        MEASURED per-view high-water mark of NEEDED SLOTS — the
        CHUNK-aligned layout's total (every non-empty tile rounds up to a
        CHUNK multiple; at 640x480 full coverage that floor is ~154K
        slots regardless of pair count) — with 2x headroom and
        power-of-two buckets from the floor; the worst-case capacity*8
        heuristic until a measurement exists. Overflow is tracked per render
        (TileBins.overflow -> TrackResult/MapChunkResult) and the runner
        bumps `_pairs_floor` and re-runs the affected program, so
        right-sizing never silently drops pairs (the CUDA reference
        reallocates its buffers on demand the same way,
        rasterizer_impl.cu resizeFunctional). The floor respects an
        explicitly smaller base config (interpret-mode tests run the
        production kernel path at tiny shapes)."""
        floor = min(1 << 15, self._raster_base.max_pairs)
        ceiling = int(min(1 << 18, max(floor, capacity * 8)))
        if self._pairs_hwm > 0:
            # ADDITIVE margin, not multiplicative: the hwm is dominated
            # by the CHUNK-aligned layout's near-constant floor (~154K
            # slots at full 640x480 tile coverage), so 2x headroom just
            # doubled every downstream sort/gather/kernel shape; the
            # margin (32K at production, ceiling/4 at the tiny test
            # shapes so CPU-interpret runs stay small) absorbs pair
            # growth between keyframes and any overflow still
            # re-buckets + re-runs (never silent)
            margin = min(1 << 15, max(ceiling // 4, 1024))
            need = max(floor, min(self._pairs_hwm + margin, ceiling))
        else:
            need = ceiling
        need = max(need, min(self._pairs_floor, 1 << 18))
        # {2^k, 3*2^k} bucket ladder: the 3*2^k steps matter because the
        # aligned floor sits just past 2^17 — 196608 fits it (measured
        # clean + fast on-chip, scripts/bisect_track.py) where the pure
        # power-of-two ladder jumps 33% past the need to 262144
        bucket = floor
        while bucket < need:
            b3 = bucket // 2 * 3
            bucket = b3 if b3 >= need else bucket * 2
        max_pairs = bucket
        # CSR grid granularity: round up to a CHUNK*SUBS multiple
        from fourdgs.ops.rasterize.tile_kernel import CHUNK, SUBS

        gran = CHUNK * SUBS
        max_pairs = -(-max_pairs // gran) * gran
        return self._raster_base._replace(max_pairs=max_pairs)

    def _rebucket_pairs(self) -> bool:
        """Re-size the pair budget to the current high-water mark; called
        at keyframe boundaries (and after overflows) so recompiles never
        land mid-tracking. Returns True if the bucket changed."""
        new = self._raster_for_capacity(self.gmap.capacity)
        if new.max_pairs == self.raster.max_pairs:
            return False
        Log(
            f"Pair budget {self.raster.max_pairs} -> {new.max_pairs} "
            f"(hwm {self._pairs_hwm}, floor {self._pairs_floor})",
            tag="Perf",
        )
        self.raster = new
        self._refresh_configs()
        return True

    def _note_pairs(self, num_pairs, overflow) -> bool:
        """Fold one finished program's pair stats into the high-water
        mark. On overflow, raise the floor and re-bucket immediately;
        returns True when the caller should RE-RUN the program (its
        output dropped pairs)."""
        self._pairs_hwm = max(self._pairs_hwm, int(num_pairs))
        if not bool(overflow):
            return False
        if self.raster.max_pairs >= (1 << 18):
            Log("pair buffer overflow at the 1<<18 ceiling; pairs dropped",
                tag="Perf")
            return False
        # next ladder step (1.5x covers the {2^k, 3*2^k} ladder)
        self._pairs_floor = self.raster.max_pairs * 3 // 2
        return self._rebucket_pairs()

    def _refresh_configs(self):
        self.track_cfg = self.track_cfg._replace(
            raster=self.raster._replace(with_n_touched=False)
        )
        self.map_cfg = self.map_cfg._replace(
            raster=self.raster._replace(with_n_touched=False)
        )

    def _maybe_grow(self):
        """Grow the capacity bucket when the map fills (power-of-two
        buckets; each growth recompiles the jitted programs once)."""
        n_alive = int(self.gmap.num_alive)
        cap = self.gmap.capacity
        if n_alive <= 0.7 * cap or cap >= self.max_capacity:
            return
        new_cap = min(self.max_capacity, cap * 2)
        self.gmap, self.adam = gm.resize_map(self.gmap, self.adam, new_cap)
        self.raster = self._raster_for_capacity(new_cap)
        self._refresh_configs()
        Log(f"Capacity bucket grown to {new_cap} ({n_alive} alive)")

    # ------------------------------------------------------------------
    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _spawn_gaussians(self, frame: Frame, T_cw, exposure, init: bool,
                         dygs: bool = False):
        """add_new_keyframe + extend_from_pcd_seq (reference
        slam_frontend.py:127-185, gaussian_model.py:354-362): back-project
        the keyframe depth (dynamic + invalid-RGB pixels zeroed) into new
        Gaussians. With dygs=True, only DYNAMIC pixels spawn (reference
        create_pcd_from_image add_dygs path, gaussian_model.py:176-180)."""
        ds = self.config["Dataset"]
        downs = int(ds.get("pcd_downsample_init" if init else "pcd_downsample", 32 if init else 128))
        valid_rgb = np.asarray(jnp.sum(frame.image, axis=0)) > 0.01
        if self.monocular:
            # monocular initialization: synthetic noisy depth around 2 m
            # (reference add_new_keyframe, slam_frontend.py:133-137)
            rng = np.random.default_rng(int(frame.uid) + 1234)
            depth = (2.0 + rng.standard_normal(valid_rgb.shape) * 0.3).astype(
                np.float32
            ) * valid_rgb
        else:
            depth = np.asarray(frame.depth) * valid_rgb
        if dygs:
            depth = depth * ~np.asarray(frame.motion_mask)
        else:
            depth = depth * np.asarray(frame.motion_mask)  # dynamic_model path
        cands = gm.candidates_from_rgbd(
            self._next_key(),
            frame.image,
            jnp.asarray(depth),
            T_cw,
            self.intr.fx, self.intr.fy, self.intr.cx, self.intr.cy,
            downsample=downs,
            point_size=float(ds.get("point_size", 0.01)),
            adaptive_pointsize=bool(ds.get("adaptive_pointsize", True)),
            exposure_a=exposure[0],
            exposure_b=exposure[1],
        )
        # grow BEFORE inserting so no candidates are dropped at capacity
        n_new = int(jnp.sum(cands.valid))
        while (
            int(self.gmap.num_alive) + n_new > 0.9 * self.gmap.capacity
            and self.gmap.capacity < self.max_capacity
        ):
            new_cap = min(self.max_capacity, self.gmap.capacity * 2)
            self.gmap, self.adam = gm.resize_map(self.gmap, self.adam, new_cap)
            self.raster = self._raster_for_capacity(new_cap)
            self._refresh_configs()
            Log(f"Capacity bucket grown to {new_cap}")
        self.gmap, self.adam, n = gm.insert(
            self.gmap, self.adam, cands, kf_id=int(frame.uid), dygs=dygs
        )
        return int(n)

    def _init_deform(self, idx: int, frame: Frame):
        """dystart: spawn dynamic Gaussians + control nodes from the
        dynamic-region depth and warm up the deform MLP (reference
        create_node_from_depth gaussian_model.py:257-317 +
        initialize_network slam_backend.py:160-236)."""
        from fourdgs.models.deform import init_nodes
        from fourdgs.slam.mapping_dynamic import init_deform_adam, warmup_network

        n_dy = self._spawn_gaussians(
            frame, jnp.asarray(self.poses_est[idx], jnp.float32),
            self.exposures[idx], init=False, dygs=True,
        )
        if n_dy == 0:
            Log("no dynamic object at dystart; deferring deform init")
            return False
        dy_mask = np.asarray(self.gmap.dygs & self.gmap.alive)
        pts = jnp.asarray(self.gmap.params.xyz)
        node_cap = int(self.hp.node_num)
        self.deform = init_nodes(
            self._next_key(), node_cap, pts, jnp.asarray(dy_mask),
            node_num=min(node_cap, max(int(dy_mask.sum()), 8)),
        )
        self.deform_adam = init_deform_adam(self.deform)
        slot = jnp.int32(self.kf_slot[idx])
        self.gmap, self.adam, self.deform, self.deform_adam, loss = warmup_network(
            self.gmap, self.adam, self.deform, self.deform_adam, self.store,
            slot, jnp.int32(100), self._next_key(), self.intr, self.map_cfg,
        )
        self.deform_init = True
        Log(
            f"Deform initialized at frame {idx}: {n_dy} dynamic gaussians, "
            f"warmup loss {float(loss):.4f}", tag="Backend",
        )
        return True

    def _flow_arrays(self, key_opt: list[int]):
        """Per-window-view flow targets vs the closest earlier keyframe
        (reference find_closest_keyframe + generate_flow)."""
        vw = self.map_cfg.num_window_views
        h, w = self.intr.height, self.intr.width
        pair_slots = np.full(vw, -1, np.int32)
        fwd = np.zeros((vw, 2, h, w), np.float32)
        bwd = np.zeros((vw, 2, h, w), np.float32)
        if self.flow_cache is None or self.flow_weight == 0.0:
            return jnp.asarray(pair_slots), jnp.asarray(fwd), jnp.asarray(bwd)
        for i, kf in enumerate(key_opt[:vw]):
            earlier = [k for k in self.kf_indices if k < kf]
            if not earlier:
                continue
            closest = max(earlier)
            f, b, _, _ = self.flow_cache.get(kf, closest)
            pair_slots[i] = self.kf_slot[closest]
            fwd[i] = f
            bwd[i] = b
        return jnp.asarray(pair_slots), jnp.asarray(fwd), jnp.asarray(bwd)

    def _run_mapping_dynamic(self, total_iters: int, step_after: int):
        from fourdgs.slam.mapping_dynamic import map_chunk_dynamic

        slots, valid, opt_pose, pool, pool_size, key_opt = self._window_arrays()
        pair_slots, fwd, bwd = self._flow_arrays(key_opt)
        pose_adam = init_pose_adam(self.map_cfg.num_window_views)
        res = map_chunk_dynamic(
            self.gmap, self.adam, self.store, self.deform, self.deform_adam,
            slots, valid, opt_pose, pair_slots, fwd, bwd,
            pool, pool_size, pose_adam, self._next_key(),
            jnp.int32(total_iters), jnp.int32(step_after),
            jnp.int32(self.iteration_count),
            self.intr, self.map_cfg,
            flow_weight=self.flow_weight,
            flow_weight_fine=self.flow_weight_fine,
            time_interval=self.time_interval,
            mesh=self.mesh,
        )
        self.gmap, self.adam, self.store = res.gmap, res.adam, res.store
        self.deform, self.deform_adam = res.deform, res.deform_adam
        self.iteration_count += max(0, total_iters - max(step_after, 0))
        # densify + visibility + pose resync (same host logic as static)
        if (self.iteration_count % self.gaussian_update_every) < total_iters:
            self.gmap, self.adam = gm.densify_and_prune(
                self.gmap, self.adam, self._next_key(),
                self.densify_grad_threshold, self.gaussian_th,
                self.gaussian_extent, self.size_threshold,
            )
            self._maybe_grow()
        vw_slots = np.zeros(self.map_cfg.num_window_views, np.int32)
        vw_valid = np.zeros(self.map_cfg.num_window_views, bool)
        for i, kf in enumerate(self.window[: self.map_cfg.num_window_views]):
            vw_slots[i] = self.kf_slot[kf]
            vw_valid[i] = True
        vis = np.asarray(
            window_visibility(
                self.gmap, self.store, jnp.asarray(vw_slots),
                jnp.asarray(vw_valid), self.intr, self.map_cfg,
            )
        )
        for i, kf in enumerate(self.window[: self.map_cfg.num_window_views]):
            self.occ_visibility[kf] = vis[i]
        for kf in key_opt:
            slot = self.kf_slot[kf]
            self.poses_est[kf] = np.asarray(self.store.T_cw[slot])
            self.exposures[kf] = np.asarray(self.store.exposure[slot])

    def _window_arrays(self):
        """Device arrays describing the current mapping view set:
        window[:3] + covisibility picks (key_opt, slam_backend.py:310-314)."""
        vw = self.map_cfg.num_window_views
        key_opt = list(self.window[:3])
        if len(self.window) > 3:
            anchor = self.window[0]
            picks = kfs.keyframe_selection_overlap(
                np.asarray(self.store.depths[self.kf_slot[anchor]]),
                self.poses_est[anchor],
                self.intr,
                {k: self.poses_est[k] for k in self.kf_indices},
                before_uid=self.window[2],
                max_selected=self.window_size - self.pose_window,
                rng=self.rng,
            )
            key_opt += [int(p) for p in picks if int(p) not in key_opt]
        key_opt = key_opt[:vw]

        slots = np.zeros(vw, np.int32)
        valid = np.zeros(vw, bool)
        opt_pose = np.zeros(vw, bool)
        for i, kf in enumerate(key_opt):
            slots[i] = self.kf_slot[kf]
            valid[i] = True
            opt_pose[i] = i < self.pose_window
        pool = [self.kf_slot[k] for k in self.kf_indices if k not in key_opt]
        pool_arr = np.zeros(max(len(pool), 1), np.int32)
        pool_arr[: len(pool)] = pool
        # pad pool to a stable power-of-two length to avoid recompiles
        padded = 1 << max(3, int(np.ceil(np.log2(max(len(pool), 1)))))
        pool_full = np.zeros(padded, np.int32)
        pool_full[: len(pool)] = pool
        return (
            jnp.asarray(slots), jnp.asarray(valid), jnp.asarray(opt_pose),
            jnp.asarray(pool_full), jnp.int32(len(pool)), key_opt,
        )

    def _reproject_masks(self, key_opt: list[int]):
        """Per-window-view depth-reprojection masks vs frame 0 (reference
        viewpoint.reproject_mask(dataset, self.viewpoints[0]),
        slam_backend.py:465-469). Computed once per chunk (the reference
        recomputes per iteration under no_grad; window poses move <1e-3
        within a chunk so this is equivalent)."""
        if not self.kf_indices:
            return None
        anchor = self.kf_slot[self.kf_indices[0]]
        vw = self.map_cfg.num_window_views
        h, w = self.intr.height, self.intr.width
        masks = np.ones((vw, h, w), bool)
        a_depth = self.store.depths[anchor]
        a_static = self.store.motion[anchor]
        T_a = self.store.T_cw[anchor]
        for i, kf in enumerate(key_opt[:vw]):
            masks[i] = np.asarray(
                kfs.reproject_mask(
                    a_depth, a_static, T_a, self.store.T_cw[self.kf_slot[kf]],
                    fx=self.intr.fx, fy=self.intr.fy,
                    cx=self.intr.cx, cy=self.intr.cy,
                )
            )
        return jnp.asarray(masks)

    def _run_mapping(self, total_iters: int, step_after: int, prune: bool,
                     densify: bool = True, min_opacity: float | None = None,
                     extent: float | None = None, size_th: float | None = None,
                     reset_cadence: bool = True):
        """Run `total_iters` mapping iterations, breaking at the
        densify/reset cadence boundaries the reference hits inside its
        loop (slam_backend.py:723-745)."""
        slots, valid, opt_pose, pool, pool_size, key_opt = self._window_arrays()
        extra_masks = self._reproject_masks(key_opt) if self.rm_initdy else None
        pose_adam = init_pose_adam(self.map_cfg.num_window_views)
        min_op = self.gaussian_th if min_opacity is None else min_opacity
        ext = self.gaussian_extent if extent is None else extent
        sth = self.size_threshold if size_th is None else size_th

        # chunk boundaries + events from the pure cadence generator,
        # pinned against the reference's per-iteration loop in
        # tests/test_cadence.py (slam_backend.py:336-338,723-745)
        from fourdgs.slam.cadence import mapping_cadence

        perf_detail = bool(os.environ.get("FOURDGS_PERF_DETAIL"))
        done = 0
        for chunk, new_it, fire in mapping_cadence(
            total_iters, step_after, self.iteration_count,
            self.gaussian_update_every, self.gaussian_update_offset,
            self.gaussian_reset, densify=densify, reset=reset_cadence,
        ):
            _ct = time.time()
            pre_state = (self.gmap, self.adam, self.store, pose_adam)
            for _ in range(4):
                res = map_chunk(
                    pre_state[0], pre_state[1], pre_state[2],
                    slots, valid, opt_pose, pool, pool_size, pre_state[3],
                    self._next_key(),
                    jnp.int32(chunk), jnp.int32(step_after - done),
                    jnp.int32(self.iteration_count),
                    self.intr, self.map_cfg,
                    extra_masks=extra_masks,
                    mesh=self.mesh,
                )
                # overflowed renders dropped pairs: bump the budget and
                # re-run the whole chunk from its pre-state (functional
                # state makes the redo exact and free to arrange)
                if not self._note_pairs(res.num_pairs, res.overflow):
                    break
            self.gmap, self.adam, self.store, pose_adam = (
                res.gmap, res.adam, res.store, res.pose_adam
            )
            done += chunk
            self.iteration_count = new_it
            if perf_detail:
                jax.block_until_ready(self.gmap.params.xyz)
                Log(
                    f"map_chunk {chunk} iters: {time.time() - _ct:.2f}s "
                    f"(fire={fire})", tag="Perf",
                )

            if fire == "densify":
                self.gmap, self.adam = gm.densify_and_prune(
                    self.gmap, self.adam, self._next_key(),
                    self.densify_grad_threshold, min_op, ext, sth,
                )
                self._maybe_grow()
            elif fire == "reset":
                vis = window_visibility(
                    self.gmap, self.store, slots, valid, self.intr, self.map_cfg
                )
                any_vis = jnp.any(vis, axis=0)
                self.gmap, self.adam = gm.reset_opacity_nonvisible(
                    self.gmap, self.adam, any_vis
                )

        # occ-aware visibility for the window (reference :665-668) + pose
        # resync for optimized keyframes
        vw_slots = np.zeros(self.map_cfg.num_window_views, np.int32)
        vw_valid = np.zeros(self.map_cfg.num_window_views, bool)
        for i, kf in enumerate(self.window[: self.map_cfg.num_window_views]):
            vw_slots[i] = self.kf_slot[kf]
            vw_valid[i] = True
        vis = np.asarray(
            window_visibility(
                self.gmap, self.store, jnp.asarray(vw_slots),
                jnp.asarray(vw_valid), self.intr, self.map_cfg,
            )
        )
        for i, kf in enumerate(self.window[: self.map_cfg.num_window_views]):
            self.occ_visibility[kf] = vis[i]
        # n_obs: per-Gaussian count of window views seeing it (reference
        # prune pass, slam_backend.py:709-712)
        self.gmap = self.gmap._replace(
            n_obs=jnp.asarray(vis.sum(axis=0), jnp.int32)
        )
        for kf in key_opt:
            slot = self.kf_slot[kf]
            self.poses_est[kf] = np.asarray(self.store.T_cw[slot])
            self.exposures[kf] = np.asarray(self.store.exposure[slot])

        if prune and len(self.window) == self.window_size:
            # prune pass (reference :700-721): RGB-D mode only marks
            # initialization complete; monocular would prune
            self.initialized = True

    def _reset(self, idx: int, frame: Frame):
        """Domain-level failure recovery: drop the map and rebuild from
        the current frame (monocular pre-init overlap loss)."""
        cap = self.gmap.capacity
        self.gmap = gm.empty_map(cap)
        self.adam = gm.init_adam(cap)
        self.store = kfs.empty_store(
            self.store.capacity, self.intr.height, self.intr.width
        )
        self.kf_slot.clear()
        self.occ_visibility.clear()
        self.kf_indices = []
        self.window = []
        self.iteration_count = 0
        self.initialized = False
        # re-init at the tracked pose estimate
        T = jnp.asarray(self.poses_est[idx], jnp.float32)
        self.store = kfs.store_keyframe(self.store, 0, frame, T, jnp.zeros(2))
        self.kf_slot[idx] = 0
        self.kf_indices = [idx]
        self.kf_total = 1
        self.window = [idx]
        self._spawn_gaussians(frame, T, np.zeros(2), init=True)
        out = render_keyframe(self.gmap, self.store, jnp.int32(0), self.intr, self.map_cfg)
        self.occ_visibility[idx] = np.asarray(out.n_touched > 0)

    def _initialize(self, frame: Frame):
        T_gt = np.asarray(frame.T_gt)
        self.poses_est[0] = T_gt
        self.exposures[0] = np.zeros(2)
        self.store = kfs.store_keyframe(
            self.store, 0, frame, jnp.asarray(T_gt), jnp.zeros(2)
        )
        self.kf_slot[0] = 0
        self.kf_indices = [0]
        self.kf_total = 1
        self.window = [0]
        n = self._spawn_gaussians(frame, jnp.asarray(T_gt, jnp.float32), np.zeros(2), init=True)
        Log(f"Init: spawned {n} Gaussians", tag="4DGS-SLAM")

        # initialize_map: init_itr_num iterations, densify every
        # init_gaussian_update, opacity reset at init_gaussian_reset
        done = 0
        slots = jnp.asarray(np.array([0] + [0] * (self.map_cfg.num_window_views - 1), np.int32))
        valid = jnp.asarray(np.array([True] + [False] * (self.map_cfg.num_window_views - 1)))
        opt_pose = jnp.zeros(self.map_cfg.num_window_views, bool)
        pool = jnp.zeros(8, jnp.int32)
        pose_adam = init_pose_adam(self.map_cfg.num_window_views)
        while done < self.init_itr_num:
            boundary = self.init_gaussian_update - (done % self.init_gaussian_update)
            to_reset = self.init_gaussian_reset - done
            chunk = int(min(self.init_itr_num - done, boundary, to_reset if to_reset > 0 else 1 << 30))
            pre_state = (self.gmap, self.adam, self.store, pose_adam)
            for _ in range(4):
                res = map_chunk(
                    pre_state[0], pre_state[1], pre_state[2], slots, valid,
                    opt_pose, pool, jnp.int32(0), pre_state[3],
                    self._next_key(),
                    jnp.int32(chunk), jnp.int32(-1),
                    jnp.int32(self.iteration_count),
                    self.intr, self.map_cfg,
                    mesh=self.mesh,
                )
                if not self._note_pairs(res.num_pairs, res.overflow):
                    break
            self.gmap, self.adam, self.store, pose_adam = (
                res.gmap, res.adam, res.store, res.pose_adam
            )
            done += chunk
            self.iteration_count += chunk
            if done % self.init_gaussian_update == 0 and done < self.init_itr_num:
                self.gmap, self.adam = gm.densify_and_prune(
                    self.gmap, self.adam, self._next_key(),
                    self.densify_grad_threshold, self.init_gaussian_th,
                    self.init_gaussian_extent, 0.0,
                )
                self._maybe_grow()
            if done == self.init_gaussian_reset:
                self.gmap, self.adam = gm.reset_opacity(self.gmap, self.adam)

        out = render_keyframe(self.gmap, self.store, jnp.int32(0), self.intr, self.map_cfg)
        self.occ_visibility[0] = np.asarray(out.n_touched > 0)
        self.median_depth = float(median_depth(out.depth, out.alpha)[0])
        # first measurement exists now: tracking starts on a right-sized
        # pair budget instead of the capacity worst case
        self._rebucket_pairs()
        Log(
            f"Initialized map: {int(self.gmap.num_alive)} Gaussians, "
            f"final loss {float(res.final_loss):.4f}", tag="4DGS-SLAM",
        )

    def _assign_kf_slot(self, idx: int) -> int:
        """Slot for a new keyframe, with wraparound eviction: any OLD
        keyframe still mapped to the reused slot must leave every
        id-keyed structure (replay pool, flow pairing, window,
        covisibility) before the slot's image is overwritten — otherwise
        replay would silently train against the wrong frame."""
        slot = self.kf_total % self.store.capacity
        self.kf_total += 1
        for old in [k for k, s in self.kf_slot.items() if s == slot]:
            del self.kf_slot[old]
            self.occ_visibility.pop(old, None)
            if old in self.kf_indices:
                self.kf_indices.remove(old)
            if old in self.window:
                self.window.remove(old)
        self.kf_slot[idx] = slot
        self.kf_indices.append(idx)
        return slot

    def _handle_keyframe(self, idx: int, frame: Frame, curr_visibility: np.ndarray):
        slot = self._assign_kf_slot(idx)
        self.store = kfs.store_keyframe(
            self.store, slot, frame,
            jnp.asarray(self.poses_est[idx], jnp.float32),
            jnp.asarray(self.exposures[idx], jnp.float32),
        )
        self.occ_visibility[idx] = curr_visibility
        self.window, removed = kfs.add_to_window(
            idx, curr_visibility, self.occ_visibility, self.window,
            self.poses_est, self.kf_cutoff, self.window_size,
            initialized=self.initialized,
        )
        if self.monocular and not self.initialized and removed is not None:
            # monocular recovery: the window lost overlap before the map
            # initialized — reset everything and re-init from this frame
            # (reference slam_frontend.py:771-776 + backend reset :146-158)
            Log("Keyframes lack sufficient overlap to initialize; resetting")
            self._reset(idx, frame)
            return
        self._spawn_gaussians(
            frame, jnp.asarray(self.poses_est[idx], jnp.float32),
            self.exposures[idx], init=False,
        )
        if self.dynamic and not self.deform_init and idx >= self.dystart:
            self._init_deform(idx, frame)
        iter_per_kf = self.kf_iters
        step_after = 100 if iter_per_kf > 100 else -1
        if self.dynamic and not self.deform_init and idx < self.dystart:
            # pre-dystart dynamic runs use the short static mapping
            # (reference map_static(iters=20), slam_backend.py:995-997)
            iter_per_kf = 20
            step_after = -1
        if not self.initialized:
            if len(self.window) == self.window_size:
                iter_per_kf = 300
                step_after = -1
                Log("Performing initial BA for initialization", tag="Backend")
            else:
                iter_per_kf = self.mapping_itr_num
                step_after = -1
        # keyframe boundary = the safe recompile point: re-size the pair
        # budget to the measured high-water mark before the mapping phase
        self._rebucket_pairs()
        if self.dynamic and self.deform_init:
            self._run_mapping_dynamic(iter_per_kf, step_after)
        else:
            self._run_mapping(iter_per_kf, step_after, prune=True)

    def _predict_pose(self) -> np.ndarray:
        """Constant-velocity w2c prediction for the incoming frame, from
        TRACKED poses only (segmentation pose source — reference seeds its
        flow/seg stack from estimates, never GT)."""
        if not self.poses_est:
            return np.eye(4, dtype=np.float32)
        ks = sorted(self.poses_est)
        T1 = self.poses_est[ks[-1]]
        if len(ks) == 1:
            return T1
        T0 = self.poses_est[ks[-2]]
        return (T1 @ np.linalg.inv(T0) @ T1).astype(np.float32)

    def run(self, warmup_frames: int = 0) -> dict:
        """Process the sequence. `warmup_frames` excludes the first N
        frames from the FPS clock (XLA compiles amortize to zero over a
        full sequence but dominate micro-runs; the reference's CUDA
        kernels are precompiled so this keeps the comparison fair)."""
        from fourdgs.data.prefetch import FramePrefetcher

        tr = self.config["Training"]
        viewer = None
        if self.config.get("Results", {}).get("use_gui", False) and self.save_dir:
            from fourdgs.gui.viewer import LiveViewer

            viewer = LiveViewer(
                self.save_dir, interval=self.save_interval,
                serve_port=self.config["Results"].get("gui_port"),
            )
        t0 = time.time()
        t_warm = t0
        self._phase = {"track": 0.0, "kf_check": 0.0, "keyframe": 0.0,
                       "prefetch_wait": 0.0, "track_iters": 0}
        prefetcher = FramePrefetcher(
            self.dataset, edge_threshold=float(tr.get("edge_threshold", 1.1)),
            end=self.n_frames,
        )
        last_kf = 0
        _pf = time.time()
        for idx, frame, pose_gt in prefetcher:
            self._phase["prefetch_wait"] += time.time() - _pf
            if idx == warmup_frames:
                jax.block_until_ready(self.gmap.params.xyz)
                t_warm = time.time()
                # steady-state phase attribution (compiles excluded)
                for k in self._phase:
                    self._phase[k] = 0 if k == "track_iters" else 0.0
            if idx == 0:
                self._initialize(frame)
                last_kf = 0
                continue

            self.initialized = self.initialized or len(self.window) == self.window_size
            T_init = jnp.asarray(self.poses_est[idx - 1], jnp.float32)
            exp_init = jnp.asarray(self.exposures.get(idx - 1, np.zeros(2)), jnp.float32)
            _pt = time.time()
            for _ in range(4):
                res = track_frame(
                    self.gmap, frame, T_init, exp_init, self.intr,
                    self.track_cfg,
                )
                # pair-buffer overflow: the pose came from renders that
                # dropped pairs — re-track at the bumped budget (every
                # attempt's flags are folded, incl. the last one)
                if not self._note_pairs(res.num_pairs, res.overflow):
                    break
            self.poses_est[idx] = np.asarray(res.T_cw)
            self._phase["track"] += time.time() - _pt
            self._phase["track_iters"] += int(res.n_iters)
            self.exposures[idx] = np.asarray(res.exposure)
            self.median_depth = float(res.median_depth)
            if viewer is not None:
                viewer.maybe_update(self, idx)
                # GUI pause control (reference Packet_vis2main flag_pause,
                # slam_gui.py:565-585): block between frames while paused
                viewer.wait_if_paused()

            # forced keyframe exactly at dystart (reference
            # slam_frontend.py:752 `... or cur_frame_idx == self.dystart`,
            # applied after the single_thread check_time gate) so
            # deform/node init happens on the dystart frame, not up to
            # kf_interval-1 frames later
            force_dystart = self.dynamic and idx == self.dystart and idx > 0
            check_time = (idx - last_kf) >= self.kf_interval
            if not (check_time or force_dystart):
                _pf = time.time()
                continue

            # visibility at the tracked pose (needs n_touched)
            _pt = time.time()
            out = render_keyframe(
                self.gmap,
                self.store._replace(
                    T_cw=self.store.T_cw.at[self.store.capacity - 1].set(res.T_cw)
                ),
                jnp.int32(self.store.capacity - 1),
                self.intr, self.map_cfg,
            )
            curr_visibility = np.asarray(out.n_touched > 0)
            create_kf = kfs.is_keyframe(
                self.poses_est[idx], self.poses_est[last_kf], self.median_depth,
                curr_visibility, self.occ_visibility[last_kf],
                self.kf_translation, self.kf_min_translation, self.kf_overlap,
            )
            if len(self.window) < self.window_size:
                union = np.count_nonzero(curr_visibility | self.occ_visibility[last_kf])
                inter = np.count_nonzero(curr_visibility & self.occ_visibility[last_kf])
                ratio = inter / union if union else 0.0
                create_kf = check_time and ratio < self.kf_overlap
            create_kf = (
                check_time and (create_kf or (idx - last_kf) >= 5)
            ) or force_dystart
            self._phase["kf_check"] += time.time() - _pt

            if create_kf:
                _pt = time.time()
                self._handle_keyframe(idx, frame, curr_visibility)
                _kf_dt = time.time() - _pt
                self._phase["keyframe"] += _kf_dt
                last_kf = idx
                Log(
                    f"KF {idx}: {int(self.gmap.num_alive)} gaussians, "
                    f"window {self.window} ({_kf_dt:.1f}s)", tag="Backend",
                )
                # periodic ATE evaluation (reference slam_frontend.py:798-811)
                intv = int(self.config.get("Results", {}).get("save_trj_kf_intv", 5))
                if (
                    self.config.get("Results", {}).get("save_trj", False)
                    and self.save_dir
                    and self.kf_total % intv == 0
                ):
                    stats = self.eval_ate(label=f"frame_{idx}")
                    Log(f"ATE RMSE @ frame {idx}: {stats['rmse']:.4f} m", tag="Eval")
                    self._wandb_log({"ate": stats["rmse"], "frame": idx})
            _pf = time.time()

        jax.block_until_ready(self.gmap.params.xyz)
        elapsed = time.time() - t0
        fps = self.n_frames / elapsed
        ph = dict(self._phase)
        known = ph["track"] + ph["kf_check"] + ph["keyframe"] + ph["prefetch_wait"]
        steady_elapsed = time.time() - t_warm
        Log(
            "Steady-state phase times: track {track:.1f}s ({track_iters} "
            "iters), kf_check {kf_check:.1f}s, keyframe(mapping) "
            "{keyframe:.1f}s, prefetch_wait {prefetch_wait:.1f}s, "
            "other {other:.1f}s".format(other=steady_elapsed - known, **ph),
            tag="Perf",
        )
        Log(f"Total FPS: {fps:.3f} ({self.n_frames} frames / {elapsed:.1f}s)")
        self.metrics["fps"] = fps
        if warmup_frames > 0 and self.n_frames > warmup_frames:
            steady = (self.n_frames - warmup_frames) / (time.time() - t_warm)
            self.metrics["fps_steady"] = steady
            Log(f"Steady-state FPS (after {warmup_frames} warmup frames): {steady:.3f}")
        self.metrics["n_frames"] = self.n_frames
        self.metrics["n_gaussians"] = int(self.gmap.num_alive)
        return self.metrics

    # ------------------------------------------------------------------
    def color_refinement(self, iterations: int = 1500):
        """Global refinement over random keyframes (reference
        slam_backend.py:777-858): every iteration draws
        `num_window_views + num_random_views` (= 10) DISTINCT random
        keyframes uniformly from the FULL history (refine_picks inside
        map_chunk) — late keyframes get the same refinement exposure as
        early ones."""
        vw = self.map_cfg.num_window_views
        slots = np.zeros(vw, np.int32)
        valid = np.zeros(vw, bool)     # ignored in refine mode
        pool = np.asarray([self.kf_slot[k] for k in self.kf_indices], np.int32)
        padded = 1 << max(3, int(np.ceil(np.log2(max(len(pool), 1)))))
        pool_full = np.zeros(padded, np.int32)
        pool_full[: len(pool)] = pool
        refine_cfg = self.map_cfg._replace(refine=True)
        res = map_chunk(
            self.gmap, self.adam, self.store,
            jnp.asarray(slots), jnp.asarray(valid), jnp.zeros(vw, bool),
            jnp.asarray(pool_full), jnp.int32(len(pool)),
            init_pose_adam(vw), self._next_key(),
            # reference color_refinement schedules from the LOCAL
            # iteration (update_learning_rate(iteration),
            # slam_backend.py:854), not the global count
            jnp.int32(iterations), jnp.int32(-1), jnp.int32(0),
            self.intr, refine_cfg, mesh=self.mesh,
        )
        self.gmap, self.adam, self.store = res.gmap, res.adam, res.store

    def eval_ate(self, label: str = "final") -> dict:
        from fourdgs.eval.ate import save_trajectory

        ids = sorted(self.poses_est.keys())
        est = [self.poses_est[i] for i in ids]
        gt = [np.asarray(self.dataset.poses[i]) for i in ids]
        if self.save_dir:
            return save_trajectory(est, gt, ids, self.save_dir, label)
        from fourdgs.eval.ate import evaluate_ate

        return evaluate_ate(est, gt)

    def eval_rendering(self, label: str = "final", interval: int | None = None,
                       dump_interval: int | None = None) -> dict:
        from fourdgs.eval.rendering import eval_rendering as _er
        from fourdgs.ops.rasterize import rasterize

        proj = self.intr.proj()

        def render_at(idx):
            T = jnp.asarray(self.poses_est[idx], jnp.float32)
            xyz, scales, quats = (
                self.gmap.params.xyz, self.gmap.get_scaling, self.gmap.get_rotation,
            )
            if self.dynamic and self.deform_init:
                from fourdgs.models.deform import warp

                t = jnp.float32(idx / max(self.n_frames - 1, 1))
                d_xyz, d_rot, d_scale = warp(
                    self.deform, xyz, t, motion_mask=self.gmap.dygs
                )
                xyz, scales, quats = xyz + d_xyz, scales + d_scale, quats + d_rot
            out = rasterize(
                xyz, scales, quats, self.gmap.get_opacity,
                self.gmap.get_color, self.gmap.alive, T, proj, jnp.zeros(3),
                fx=self.intr.fx, fy=self.intr.fy,
                width=self.intr.width, height=self.intr.height,
                tan_fovx=self.intr.tan_fovx, tan_fovy=self.intr.tan_fovy,
                config=self.raster._replace(with_n_touched=False),
            )
            return out.color, out.depth

        from fourdgs.geometry.se3 import se3_exp

        def novel_at(idx):
            # small orbit offset novel view (reference eval novel dumps)
            T = jnp.asarray(self.poses_est[idx], jnp.float32)
            tau = jnp.asarray([0.1, -0.05, 0.0, 0.0, 0.2, 0.0], jnp.float32)
            save_T = self.poses_est[idx]
            self.poses_est[idx] = np.asarray(se3_exp(tau) @ T)
            out = render_at(idx)
            self.poses_est[idx] = save_T
            return out

        ids = [i for i in sorted(self.poses_est.keys())]
        return _er(
            render_at, self.dataset, ids,
            self.save_dir or "/tmp/fourdgs_eval", label,
            mask_dynamic=not self.dynamic,
            # metric stride: every frame like the reference
            # (eval_utils.py:320); dump_interval gates image dumps only
            interval=interval or 1,
            dump_images=bool(self.save_dir),
            novel_render_fn=novel_at if self.save_dir else None,
            dump_interval=dump_interval,
        )

    def save_checkpoint(self, path: str):
        """Full mid-run state (map + Adam + keyframes + host bookkeeping) —
        resume support the reference lacks (SURVEY §5: save-only)."""
        from fourdgs.io.checkpoint import save_state

        host = {
            "iteration_count": self.iteration_count,
            "kf_total": self.kf_total,
            "kf_indices": self.kf_indices,
            "window": self.window,
            "kf_slot": {str(k): v for k, v in self.kf_slot.items()},
            "poses_est": {str(k): v.tolist() for k, v in self.poses_est.items()},
            "exposures": {str(k): v.tolist() for k, v in self.exposures.items()},
            "initialized": self.initialized,
            "median_depth": self.median_depth,
            "deform_init": self.deform_init,
        }
        save_state(path, self.gmap, self.adam, self.store, host)
        if self.deform is not None:
            from fourdgs.io.checkpoint import save_deform

            save_deform(path + ".deform.npz", self.deform, self.deform_adam)

    def load_checkpoint(self, path: str):
        from fourdgs.io.checkpoint import load_state

        self.gmap, self.adam, self.store, host = load_state(
            path, self.gmap, self.adam, self.store
        )
        self.iteration_count = host["iteration_count"]
        self.kf_indices = list(host["kf_indices"])
        self.kf_total = int(host.get("kf_total", len(self.kf_indices)))
        self.window = list(host["window"])
        self.kf_slot = {int(k): v for k, v in host["kf_slot"].items()}
        self.poses_est = {
            int(k): np.asarray(v) for k, v in host["poses_est"].items()
        }
        self.exposures = {
            int(k): np.asarray(v) for k, v in host["exposures"].items()
        }
        self.initialized = host["initialized"]
        self.median_depth = host["median_depth"]
        # 4D deformation state (named + shape-adaptive; a dynamic run can
        # now resume — reference deform.pth is save-only)
        if host.get("deform_init", False) and os.path.exists(path + ".deform.npz"):
            from fourdgs.io.checkpoint import load_deform
            from fourdgs.models.deform import init_nodes
            from fourdgs.slam.mapping_dynamic import init_deform_adam

            if self.deform is None:
                node_cap = int(self.hp.node_num)
                self.deform = init_nodes(
                    self._next_key(), node_cap, jnp.zeros((8, 3)),
                    jnp.zeros(8, bool), node_num=8,
                )
                self.deform_adam = init_deform_adam(self.deform)
            self.deform, adam = load_deform(
                path + ".deform.npz", self.deform, self.deform_adam
            )
            if adam is not None:
                self.deform_adam = adam
            self.deform_init = True
        # occ visibility is recomputable; refresh for the current window
        for kf in self.window:
            out = render_keyframe(
                self.gmap, self.store, jnp.int32(self.kf_slot[kf]),
                self.intr, self.map_cfg,
            )
            self.occ_visibility[kf] = np.asarray(out.n_touched > 0)

    def save(self, label: str = "final"):
        if not self.save_dir:
            return
        from fourdgs.io.ply import save_gaussians_ply

        os.makedirs(os.path.join(self.save_dir, "point_cloud", label), exist_ok=True)
        save_gaussians_ply(
            self.gmap,
            os.path.join(self.save_dir, "point_cloud", label, "point_cloud.ply"),
        )
        if self.deform is not None:
            # named deform weights artifact (reference
            # deform/iteration_*/deform.pth, deform_model.py:54-57) —
            # loadable via fourdgs.io.checkpoint.load_deform with
            # shape-adaptive node counts (time_utils.py:863-883)
            from fourdgs.io.checkpoint import save_deform

            ddir = os.path.join(self.save_dir, "deform", label)
            os.makedirs(ddir, exist_ok=True)
            save_deform(os.path.join(ddir, "deform.npz"), self.deform)
        with open(os.path.join(self.save_dir, "final_result.json"), "w") as f:
            json.dump(self.metrics, f, indent=2)
