"""Packed dataset: flat contiguous arrays + native window assembly.

The TPU-first training path (SURVEY.md §2.9 replacement plan): instead of
per-sample SQL + Python slicing in worker processes, all recordings are
packed ONCE into flat float32 row arrays (memory-mappable .npy shards plus a
JSON index), and training batches are assembled by the multithreaded C++
``framepack`` library directly into reusable pinned buffers — with a pure
numpy fallback when no toolchain is available.

Window/padding semantics are identical to ``WindowedDataset`` (and therefore
to the reference); ``tests/test_packed.py`` asserts batch-for-batch
equality. The five_dim IMU conversion and game-state forward-fill happen at
pack time so the per-batch work is pure memcpy.
"""

from __future__ import annotations

import ctypes
import json
from pathlib import Path

import numpy as np

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.data.dataset import IDENTITY_QUAT, WindowedDataset, np_quats_to_5d
from soccerdiffusion_tpu.data.schema import RobotState
from soccerdiffusion_tpu.native import load_framepack

_FIVE_DIM_IDENTITY = np.array([1.0, 0.0, 0.0, 0.0, 1.0], dtype=np.float32)


class PackedDataset:
    """Flat-array fast path with the WindowedDataset sample contract.

    Proprioceptive rows are float32 shards windowed by the C++ assembler;
    images are decoded + resized ONCE at pack time into a uint8 shard
    (mmap-able on load, so datasets larger than RAM stream from disk) and
    emitted as raw ``image_u8`` + ``image_valid`` — the [0,1]/ImageNet
    normalization and the zero-masking of padded frames moves into the
    jitted step (``device_normalize_images``), which also shrinks the
    host->device transfer 4x vs float32.
    """

    def __init__(
        self,
        cmds: np.ndarray,  # (total_rows, J) float32
        states: np.ndarray,
        rots: np.ndarray,  # (total_rows, R)
        gs: np.ndarray,  # (total_rows,) int32 forward-filled
        rec_row_starts: np.ndarray,  # (n_rec,) int64 first global row
        rec_lengths: np.ndarray,  # (n_rec,) int64
        config: ModelConfig,
        trajectory_stride: int = 1,
        num_threads: int = 8,
        image_source: WindowedDataset | None = None,
        images: np.ndarray | None = None,  # (total_imgs, res, res, 3) uint8
        img_stamps: np.ndarray | None = None,  # (total_imgs,) float32
        img_rec_starts: np.ndarray | None = None,  # (n_rec,) int64
        img_rec_counts: np.ndarray | None = None,  # (n_rec,) int64
        sampling_rate: int = 100,
        max_fps_video: int = 10,
    ):
        self.cmds = np.ascontiguousarray(cmds, dtype=np.float32)
        self.states = np.ascontiguousarray(states, dtype=np.float32)
        self.rots = np.ascontiguousarray(rots, dtype=np.float32)
        self.gs = np.ascontiguousarray(gs, dtype=np.int32)
        self.rec_row_starts = rec_row_starts.astype(np.int64)
        self.rec_lengths = rec_lengths.astype(np.int64)
        self.cfg = config
        self.stride = trajectory_stride
        self.num_threads = num_threads
        self.image_source = image_source
        self.images = images
        self.img_stamps = (
            None if img_stamps is None else np.asarray(img_stamps, dtype=np.float32)
        )
        self.img_rec_starts = (
            None if img_rec_starts is None else np.asarray(img_rec_starts, dtype=np.int64)
        )
        self.img_rec_counts = (
            None if img_rec_counts is None else np.asarray(img_rec_counts, dtype=np.int64)
        )
        self.sampling_rate = sampling_rate
        self.max_fps_video = max_fps_video
        self.rot_dim = self.rots.shape[1]
        self.rot_pad = (
            _FIVE_DIM_IDENTITY if self.rot_dim == 5 else IDENTITY_QUAT
        ).copy()

        future = config.trajectory_prediction_length
        counts = np.maximum(0, (self.rec_lengths - future) // trajectory_stride)
        self._cum = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self.num_samples = int(self._cum[-1])
        self._lib = load_framepack()

    # ------------------------------------------------------------- factories

    @classmethod
    def from_windowed(cls, ds: WindowedDataset, num_threads: int = 8) -> "PackedDataset":
        cfg = ds.cfg
        cmds, states, rots, gs = [], [], [], []
        starts, lengths = [], []
        row = 0
        lib = load_framepack()
        for rec in ds.recordings:
            n = len(rec.joint_commands)
            starts.append(row)
            lengths.append(n)
            row += n
            cmds.append(rec.joint_commands)
            states.append(rec.joint_states)
            quats = rec.rotations
            rots.append(np_quats_to_5d(quats) if cfg.imu_orientation_embedding_method == "five_dim" else quats)
            # Forward-fill game state onto the command row grid.
            filled = np.empty(n, dtype=np.int32)
            if lib is not None and len(rec.game_state_stamps):
                stamps = np.ascontiguousarray(rec.game_state_stamps, dtype=np.float32)
                vals = np.ascontiguousarray(rec.game_states, dtype=np.int32)
                lib.fp_forward_fill_gamestate(
                    stamps.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    len(stamps), float(ds.sampling_rate), n,
                    int(RobotState.UNKNOWN),
                    filled.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                )
            else:
                stamps_grid = np.arange(n) / ds.sampling_rate
                pos = np.searchsorted(rec.game_state_stamps, stamps_grid, side="right") - 1
                filled = np.where(
                    pos >= 0, rec.game_states[np.maximum(pos, 0)], int(RobotState.UNKNOWN)
                ).astype(np.int32)
            gs.append(filled)

        # Pack images: decode + resize once, keep uint8 (normalization is
        # deferred to the jitted step). Works with both the eager ndarray
        # and the lazy SqliteImageStore source.
        images = img_stamps = img_starts = img_counts = None
        if cfg.use_images:
            import cv2

            res = cfg.image_resolution
            frames, stamps_all, img_starts, img_counts = [], [], [], []
            n_imgs = 0
            for rec in ds.recordings:
                img_starts.append(n_imgs)
                count = 0 if rec.images is None else len(rec.image_stamps)
                img_counts.append(count)
                n_imgs += count
                for k in range(count):
                    raw = rec.images[k]
                    if raw.shape[0] != res or raw.shape[1] != res:
                        raw = cv2.resize(raw, (res, res), interpolation=cv2.INTER_AREA)
                    frames.append(raw)
                stamps_all.append(rec.image_stamps)
            images = (np.stack(frames) if frames
                      else np.zeros((0, res, res, 3), np.uint8))
            img_stamps = (np.concatenate(stamps_all) if stamps_all
                          else np.zeros((0,), np.float32))
            img_starts = np.asarray(img_starts, dtype=np.int64)
            img_counts = np.asarray(img_counts, dtype=np.int64)

        return cls(
            np.concatenate(cmds), np.concatenate(states), np.concatenate(rots),
            np.concatenate(gs), np.asarray(starts), np.asarray(lengths),
            cfg, ds.stride, num_threads,
            images=images, img_stamps=img_stamps,
            img_rec_starts=img_starts, img_rec_counts=img_counts,
            sampling_rate=ds.sampling_rate, max_fps_video=ds.max_fps_video,
        )

    # ------------------------------------------------------------ persistence

    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        np.save(path / "joint_commands.npy", self.cmds)
        np.save(path / "joint_states.npy", self.states)
        np.save(path / "rotations.npy", self.rots)
        np.save(path / "game_states.npy", self.gs)
        if self.images is not None:
            np.save(path / "images.npy", np.ascontiguousarray(self.images))
            np.save(path / "image_stamps.npy", self.img_stamps)
        (path / "index.json").write_text(json.dumps({
            "rec_row_starts": self.rec_row_starts.tolist(),
            "rec_lengths": self.rec_lengths.tolist(),
            "num_joints": self.cfg.num_joints,
            "rot_dim": int(self.rot_dim),
            "trajectory_stride": self.stride,
            "sampling_rate": self.sampling_rate,
            "max_fps_video": self.max_fps_video,
            "img_rec_starts": None if self.img_rec_starts is None else self.img_rec_starts.tolist(),
            "img_rec_counts": None if self.img_rec_counts is None else self.img_rec_counts.tolist(),
        }))

    @classmethod
    def load(cls, path: str | Path, config: ModelConfig, num_threads: int = 8) -> "PackedDataset":
        path = Path(path)
        meta = json.loads((path / "index.json").read_text())
        has_images = (path / "images.npy").exists()
        return cls(
            np.load(path / "joint_commands.npy", mmap_mode="r"),
            np.load(path / "joint_states.npy", mmap_mode="r"),
            np.load(path / "rotations.npy", mmap_mode="r"),
            np.load(path / "game_states.npy", mmap_mode="r"),
            np.asarray(meta["rec_row_starts"]),
            np.asarray(meta["rec_lengths"]),
            config,
            meta["trajectory_stride"],
            num_threads,
            # uint8 shard stays on disk; windows are gathered through the mmap
            images=np.load(path / "images.npy", mmap_mode="r") if has_images else None,
            img_stamps=np.load(path / "image_stamps.npy") if has_images else None,
            img_rec_starts=np.asarray(meta["img_rec_starts"]) if has_images else None,
            img_rec_counts=np.asarray(meta["img_rec_counts"]) if has_images else None,
            sampling_rate=meta.get("sampling_rate", 100),
            max_fps_video=meta.get("max_fps_video", 10),
        )

    # --------------------------------------------------------------- batching

    def __len__(self) -> int:
        return self.num_samples

    def _locate(self, idx: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        rec = np.searchsorted(self._cum, idx, side="right") - 1
        local = (idx - self._cum[rec]) * self.stride
        return self.rec_row_starts[rec], local.astype(np.int64), rec

    def assemble(self, indices: np.ndarray) -> dict[str, np.ndarray]:
        """Assemble a batch for global sample indices."""
        cfg = self.cfg
        b = len(indices)
        rec_starts, local_idx, rec_ids = self._locate(np.asarray(indices, dtype=np.int64))
        rec_starts = np.ascontiguousarray(rec_starts)
        local_idx = np.ascontiguousarray(local_idx)

        future = cfg.trajectory_prediction_length
        hist = cfg.action_context_length
        imu_len = cfg.imu_context_length
        out: dict[str, np.ndarray] = {
            "joint_command": np.empty((b, future, cfg.num_joints), dtype=np.float32)
        }
        if cfg.use_action_history:
            out["joint_command_history"] = np.empty((b, hist, cfg.num_joints), np.float32)
        if cfg.use_joint_states:
            out["joint_state"] = np.empty(
                (b, cfg.joint_state_context_length, cfg.num_joints), np.float32
            )
        if cfg.use_imu:
            out["rotation"] = np.empty((b, imu_len, self.rot_dim), np.float32)
        if cfg.use_gamestate:
            out["game_state"] = np.empty((b,), np.int32)

        if self._lib is not None:
            f32p = ctypes.POINTER(ctypes.c_float)
            i32p = ctypes.POINTER(ctypes.c_int32)
            i64p = ctypes.POINTER(ctypes.c_int64)

            def fp(a):
                return a.ctypes.data_as(f32p)

            self._lib.fp_assemble_batch(
                fp(self.cmds), fp(self.states), fp(self.rots),
                self.gs.ctypes.data_as(i32p),
                cfg.num_joints, self.rot_dim,
                rec_starts.ctypes.data_as(i64p), local_idx.ctypes.data_as(i64p),
                b, future,
                hist if cfg.use_action_history else 0,
                cfg.joint_state_context_length if cfg.use_joint_states else 0,
                imu_len if cfg.use_imu else 0,
                fp(self.rot_pad),
                fp(out["joint_command"]),
                fp(out["joint_command_history"]) if cfg.use_action_history else f32p(),
                fp(out["joint_state"]) if cfg.use_joint_states else f32p(),
                fp(out["rotation"]) if cfg.use_imu else f32p(),
                out["game_state"].ctypes.data_as(i32p) if cfg.use_gamestate else i32p(),
                self.num_threads,
            )
        else:
            self._assemble_numpy(rec_starts, local_idx, out)

        if cfg.use_images and self.images is not None:
            self._assemble_images(rec_ids, local_idx, out)
        elif self.image_source is not None and cfg.use_images:
            images, stamps = [], []
            for i in indices:
                item = self.image_source[int(i)]
                images.append(item["image_data"])
                stamps.append(item["image_stamps"])
            out["image_data"] = np.stack(images)
            out["image_stamps"] = np.stack(stamps)
        return out

    def _assemble_images(self, rec_ids, local_idx, out) -> None:
        """Gather uint8 image windows from the (possibly mmap'd) shard.

        Same selection as WindowedDataset._image_window: the last <=F frames
        within (stamp - (F+1)/max_fps, stamp], right-aligned; padded slots are
        zero with ``image_valid`` 0 so the device-side normalization can zero
        them exactly (reference pytorch.py:218-227 pads with zero images).
        """
        cfg = self.cfg
        F = cfg.image_context_length
        b = len(rec_ids)
        context_len = (F + 1) / self.max_fps_video
        # frame storage layout is whatever the shard holds: (res, res, 3)
        # whole frames, or (patches, P*P*C) pre-patchified for ViT configs
        # (prepatchify_images) — the gather below is layout-agnostic
        u8 = np.zeros((b, F) + self.images.shape[1:], dtype=np.uint8)
        valid = np.zeros((b, F), dtype=np.float32)
        stamps_out = np.empty((b, F), dtype=np.float32)
        for i, (ri, li) in enumerate(zip(rec_ids, local_idx)):
            stamp = float(li) / self.sampling_rate
            g0 = self.img_rec_starts[ri]
            cnt = self.img_rec_counts[ri]
            rec_stamps = self.img_stamps[g0 : g0 + cnt]
            lo = np.searchsorted(rec_stamps, stamp - context_len, side="left")
            hi = np.searchsorted(rec_stamps, stamp, side="right")
            sel = np.arange(lo, hi)[-F:]
            stamps_out[i] = stamp - context_len
            n_sel = len(sel)
            if n_sel:
                u8[i, F - n_sel :] = self.images[g0 + sel[0] : g0 + sel[-1] + 1]
                valid[i, F - n_sel :] = 1.0
                stamps_out[i, F - n_sel :] = rec_stamps[sel]
        out["image_u8"] = u8
        out["image_valid"] = valid
        out["image_stamps"] = stamps_out

    def prepatchify_images(self, patch: int) -> None:
        """Re-layout stored frames to the ViT patch layout
        (data/pipeline.patchify_frames): (N, res, res, 3) ->
        (N, (res//P)^2, P*P*3) uint8, once, on the host.

        Batches then carry ``image_u8`` pre-patchified and the device step
        is a straight patches @ kernel GEMM — no per-step patchify
        relayouts (~8-13 ms/step on the flagship geometry,
        docs/perf_notes.md round 3). Bit-identical to the on-device path.
        Materializes the shard in RAM (drops a read-only mmap view), so
        call it before training, not per batch."""
        if self.images is None or self.images.ndim == 3:
            return  # no images, or already patchified
        from soccerdiffusion_tpu.data.pipeline import patchify_frames

        self.images = np.ascontiguousarray(
            patchify_frames(np.asarray(self.images), patch))

    def _assemble_numpy(self, rec_starts, local_idx, out) -> None:
        cfg = self.cfg

        def hist_window(src, start, end, length, pad_row):
            lo = max(0, end - length)
            window = src[start + lo : start + end]
            if len(window) < length:
                window = np.concatenate(
                    [np.tile(pad_row, (length - len(window), 1)), window]
                )
            return window

        zero = np.zeros((1, cfg.num_joints), np.float32)
        for i, (rs, li) in enumerate(zip(rec_starts, local_idx)):
            rs, li = int(rs), int(li)
            out["joint_command"][i] = self.cmds[rs + li : rs + li + cfg.trajectory_prediction_length]
            if cfg.use_action_history:
                out["joint_command_history"][i] = hist_window(
                    self.cmds, rs, li, cfg.action_context_length, zero
                )
            if cfg.use_joint_states:
                out["joint_state"][i] = hist_window(
                    self.states, rs, li, cfg.joint_state_context_length, zero
                )
            if cfg.use_imu:
                out["rotation"][i] = hist_window(
                    self.rots, rs, li, cfg.imu_context_length, self.rot_pad[None]
                )
            if cfg.use_gamestate:
                out["game_state"][i] = self.gs[rs + li]

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                drop_remainder: bool = True, order: np.ndarray | None = None):
        if order is None:
            order = np.arange(len(self))
            if shuffle:
                np.random.default_rng(seed).shuffle(order)
        limit = len(order) - (len(order) % batch_size if drop_remainder else 0)
        for i in range(0, limit, batch_size):
            yield self.assemble(order[i : i + batch_size])

    def image_boundary_indices(self) -> np.ndarray:
        """Window indices whose stamp coincides with an image stamp — same
        contract as WindowedDataset.image_boundary_indices (the camera-
        credit windows; TrainConfig.boundary_oversample rides this)."""
        if not self.cfg.use_images or self.img_stamps is None:
            return np.asarray([], dtype=np.int64)
        out = []
        half_tick = 0.5 / self.sampling_rate
        for r in range(len(self.rec_lengths)):
            n_win = int(self._cum[r + 1] - self._cum[r])
            s0, cnt = int(self.img_rec_starts[r]), int(self.img_rec_counts[r])
            stamps = np.asarray(self.img_stamps[s0:s0 + cnt], dtype=np.float64)
            if not len(stamps):
                continue
            win_stamps = np.arange(n_win) * self.stride / self.sampling_rate
            k = np.searchsorted(stamps, win_stamps + half_tick) - 1
            hit = (k >= 0) & (np.abs(stamps[np.maximum(k, 0)] - win_stamps)
                              < half_tick)
            out.append(np.nonzero(hit)[0] + int(self._cum[r]))
        return (np.concatenate(out) if out
                else np.asarray([], dtype=np.int64))

    def sample_targets(self, num_samples: int, seed: int = 0) -> np.ndarray:
        rng = np.random.default_rng(seed)
        idx = rng.integers(0, len(self), size=num_samples)
        return self.assemble(idx)["joint_command"].reshape(-1, self.cfg.num_joints)
