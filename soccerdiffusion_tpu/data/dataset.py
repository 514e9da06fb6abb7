"""Windowed training dataset over in-memory recording arrays.

Counterpart of the reference's ``SoccerDiffusionDataset``
(reference dataset/pytorch.py:40-398), re-designed for TPU input pipelines:
instead of 4-6 SQL queries + cv2 work per sample in 32 worker processes, each
recording's time series are loaded once into contiguous numpy arrays and
windows are gathered with pure slicing. Padding semantics are behavioral API
and match the reference exactly:

  * history windows are left-padded with zeros     (pytorch.py:157-171)
  * IMU windows are left-padded with identity quat (pytorch.py:249-262)
  * image windows keep the last <=F frames at <=10 Hz, left-padded with
    zero images and stamp end-context            (pytorch.py:218-227)
  * game state is the last state at or before the stamp, UNKNOWN if none
                                                   (pytorch.py:276-293)

Index space: per-recording window count (n_commands - future_len) / stride,
concatenated (pytorch.py:110-121).
"""

from __future__ import annotations

import bisect
import sqlite3
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.data.schema import RobotState, connect

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)
IDENTITY_QUAT = np.array([0.0, 0.0, 0.0, 1.0], dtype=np.float32)


def np_quats_to_5d(quats_xyzw: np.ndarray) -> np.ndarray:
    """Vectorized numpy twin of utils.geometry.quats_to_5d (host pipeline)."""
    q = quats_xyzw.astype(np.float64)
    norm = np.linalg.norm(q, axis=-1, keepdims=True)
    q = q / np.maximum(norm, 1e-12)
    xyz, w = q[..., :3], q[..., 3]
    len_xyz = np.linalg.norm(xyz, axis=-1)
    axis = xyz / np.maximum(len_xyz, 1e-12)[..., None]
    default_axis = np.zeros_like(axis)
    default_axis[..., 0] = 1.0
    degenerate = (len_xyz < 1e-6)[..., None]
    axis = np.where(degenerate, default_axis, axis)
    angle = 2.0 * np.arctan2(len_xyz, w)
    angle = np.where(len_xyz < 1e-6, 0.0, angle)
    return np.concatenate(
        [axis, np.sin(angle)[..., None], np.cos(angle)[..., None]], axis=-1
    ).astype(np.float32)


def preprocess_image(raw_rgb8: np.ndarray, resolution: int) -> np.ndarray:
    """uint8 (H, W, 3) RGB -> float32 NHWC-normalized (reference
    pytorch.py:198-213: resize INTER_AREA, scale to [0,1], ImageNet stats)."""
    img = raw_rgb8
    if img.shape[0] != resolution or img.shape[1] != resolution:
        import cv2

        img = cv2.resize(img, (resolution, resolution), interpolation=cv2.INTER_AREA)
    img = img.astype(np.float32) / 255.0
    return (img - IMAGENET_MEAN) / IMAGENET_STD


class SqliteImageStore:
    """Lazy per-frame image access backed by SQLite blob reads.

    Presents the ``images[k] -> uint8 (H, W, 3)`` array interface of the
    eager path while keeping only rowids in memory, so multi-hour recordings
    (~25 GB/hour of RGB8 at 10 Hz) never materialize at once — the same
    out-of-core behavior as the reference's per-sample queries
    (reference dataset/pytorch.py:173-229).
    """

    def __init__(self, conn: sqlite3.Connection, rowids: np.ndarray, height: int, width: int):
        self._conn = conn
        self._rowids = np.asarray(rowids, dtype=np.int64)
        self._hw = (height, width)
        self.fetch_count = 0  # observability / tests

    def __len__(self) -> int:
        return len(self._rowids)

    def __getitem__(self, k: int) -> np.ndarray:
        row = self._conn.execute(
            "SELECT data FROM Image WHERE _id=?", (int(self._rowids[k]),)
        ).fetchone()
        self.fetch_count += 1
        h, w = self._hw
        return np.frombuffer(row[0], dtype=np.uint8).reshape(h, w, 3)


@dataclass
class RecordingArrays:
    """One recording's synchronized time series, in canonical joint order."""

    joint_commands: np.ndarray  # (n, J)
    joint_states: np.ndarray  # (n, J)
    rotations: np.ndarray  # (n, 4) xyzw
    game_states: np.ndarray  # (m,) int32 (already sorted by stamp)
    game_state_stamps: np.ndarray  # (m,) float32
    image_stamps: np.ndarray  # (k,) float32 sorted
    images: np.ndarray | SqliteImageStore | None  # (k, H, W, 3) uint8, lazy store, or None
    recording_id: int = 0
    # "vision" dummy-task cue latents (data/dummy.py), one per image — the
    # aux-cue-head training target (TrainConfig.aux_cue_weight); None for
    # real recordings and the decorative task
    vision_u: np.ndarray | None = None


class WindowedDataset:
    def __init__(
        self,
        recordings: list[RecordingArrays],
        config: ModelConfig,
        trajectory_stride: int = 1,
        sampling_rate: int = 100,
        max_fps_video: int = 10,
    ):
        if not recordings:
            raise ValueError("no recordings")
        self.recordings = recordings
        self.cfg = config
        self.stride = trajectory_stride
        self.sampling_rate = sampling_rate
        self.max_fps_video = max_fps_video

        future = config.trajectory_prediction_length
        self.sample_boundaries: list[tuple[int, int, int]] = []
        total = 0
        for ri, rec in enumerate(recordings):
            n = len(rec.joint_commands)
            count = int((n - future) / trajectory_stride)
            if count <= 0:
                continue
            self.sample_boundaries.append((total, total + count, ri))
            total += count
        self.num_samples = total
        self._starts = [b[0] for b in self.sample_boundaries]

    # ---------------------------------------------------------- construction

    @classmethod
    def from_sqlite(
        cls,
        db_path: str | Path | sqlite3.Connection,
        config: ModelConfig,
        trajectory_stride: int = 1,
        sampling_rate: int = 100,
        max_fps_video: int = 10,
        decode_images: bool | None = None,
        stream_images: bool = True,
    ) -> "WindowedDataset":
        """Load every recording's time series from a reference-schema SQLite DB.

        With ``stream_images`` (the default) image blobs stay in the database
        and are fetched lazily per window — proprioceptive arrays are the
        only thing resident, so datasets larger than RAM train fine
        (reference streams per sample the same way, pytorch.py:173-229).
        ``stream_images=False`` decodes everything up front (small DBs).
        """
        conn = db_path if isinstance(db_path, sqlite3.Connection) else connect(db_path, read_only=True)
        decode_images = config.use_images if decode_images is None else decode_images
        joint_cols = ", ".join(f'"{n}"' for n in config.joint_names)
        cur = conn.cursor()
        rec_ids = [r[0] for r in cur.execute("SELECT _id FROM Recording ORDER BY _id")]
        recordings = []
        state_to_int = {s: i for i, s in enumerate(RobotState.values())}
        for rid in rec_ids:
            cmds = np.asarray(
                cur.execute(
                    f"SELECT {joint_cols} FROM JointCommands WHERE recording_id=? ORDER BY stamp ASC",
                    (rid,),
                ).fetchall(),
                dtype=np.float32,
            )
            if cmds.size == 0:
                continue
            states = np.asarray(
                cur.execute(
                    f"SELECT {joint_cols} FROM JointStates WHERE recording_id=? ORDER BY stamp ASC",
                    (rid,),
                ).fetchall(),
                dtype=np.float32,
            )
            rots = np.asarray(
                cur.execute(
                    "SELECT x, y, z, w FROM Rotation WHERE recording_id=? ORDER BY stamp ASC",
                    (rid,),
                ).fetchall(),
                dtype=np.float32,
            )
            gs_rows = cur.execute(
                "SELECT stamp, state FROM GameState WHERE recording_id=? ORDER BY stamp ASC",
                (rid,),
            ).fetchall()
            gs_stamps = np.asarray([r[0] for r in gs_rows], dtype=np.float32)
            gs_vals = np.asarray(
                [state_to_int.get(r[1], int(RobotState.UNKNOWN)) for r in gs_rows],
                dtype=np.int32,
            )
            img_stamps = np.zeros((0,), dtype=np.float32)
            images = None
            if decode_images:
                img_index = cur.execute(
                    "SELECT _id, stamp FROM Image WHERE recording_id=? ORDER BY stamp ASC",
                    (rid,),
                ).fetchall()
                if img_index:
                    img_stamps = np.asarray([r[1] for r in img_index], dtype=np.float32)
                    rowids = np.asarray([r[0] for r in img_index], dtype=np.int64)
                    size = cur.execute(
                        "SELECT img_width, img_height FROM Recording WHERE _id=?", (rid,)
                    ).fetchone()
                    w, h = int(size[0]), int(size[1])
                    if stream_images:
                        images = SqliteImageStore(conn, rowids, h, w)
                    else:
                        images = np.stack([
                            np.frombuffer(
                                cur.execute("SELECT data FROM Image WHERE _id=?",
                                            (int(r),)).fetchone()[0],
                                dtype=np.uint8,
                            ).reshape(h, w, 3)
                            for r in rowids
                        ])
            recordings.append(
                RecordingArrays(
                    joint_commands=cmds, joint_states=states, rotations=rots,
                    game_states=gs_vals, game_state_stamps=gs_stamps,
                    image_stamps=img_stamps, images=images, recording_id=rid,
                )
            )
        return cls(recordings, config, trajectory_stride, sampling_rate, max_fps_video)

    @classmethod
    def from_dummy(cls, dummy_recordings, config: ModelConfig, **kwargs) -> "WindowedDataset":
        """Wrap ``generate_dummy_arrays`` output.

        The source :class:`~soccerdiffusion_tpu.data.dummy.DummyRecording`
        objects are kept on ``.dummy_recordings`` — for the "vision" task
        they carry the cue latents (``vision_u``/``vision_dirs``) that the
        Bayes-oracle calibration needs (evaluation/oracle.py)."""
        recs = []
        for i, d in enumerate(dummy_recordings):
            n = len(d.game_states)
            recs.append(
                RecordingArrays(
                    joint_commands=d.joint_commands[:, : config.num_joints],
                    joint_states=d.joint_states[:, : config.num_joints],
                    rotations=d.rotations,
                    game_states=d.game_states,
                    game_state_stamps=(np.arange(n) / 100).astype(np.float32),
                    image_stamps=d.image_stamps,
                    images=d.images,
                    recording_id=i,
                    vision_u=d.vision_u,
                )
            )
        ds = cls(recs, config, **kwargs)
        ds.dummy_recordings = list(dummy_recordings)
        return ds

    # ------------------------------------------------------------- retrieval

    def __len__(self) -> int:
        return self.num_samples

    @staticmethod
    def _pad_history(arr: np.ndarray, end: int, length: int, pad_row: np.ndarray) -> np.ndarray:
        start = max(0, end - length)
        window = arr[start:end]
        if len(window) < length:
            pad = np.tile(pad_row, (length - len(window), 1))
            window = np.concatenate([pad, window], axis=0)
        return window.astype(np.float32)

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        if not 0 <= idx < self.num_samples:
            raise IndexError(idx)
        b = bisect.bisect_right(self._starts, idx) - 1
        start_sample, _, ri = self.sample_boundaries[b]
        rec = self.recordings[ri]
        cfg = self.cfg

        cmd_idx = (idx - start_sample) * self.stride
        stamp = cmd_idx / self.sampling_rate

        out: dict[str, np.ndarray] = {}
        out["joint_command"] = rec.joint_commands[
            cmd_idx : cmd_idx + cfg.trajectory_prediction_length
        ].astype(np.float32)

        zero_row = np.zeros((1, cfg.num_joints), dtype=np.float32)
        if cfg.use_action_history:
            out["joint_command_history"] = self._pad_history(
                rec.joint_commands, cmd_idx, cfg.action_context_length, zero_row
            )
        if cfg.use_joint_states:
            out["joint_state"] = self._pad_history(
                rec.joint_states, cmd_idx, cfg.joint_state_context_length, zero_row
            )
        if cfg.use_imu:
            quats = self._pad_history(
                rec.rotations, cmd_idx, cfg.imu_context_length, IDENTITY_QUAT[None]
            )
            if cfg.imu_orientation_embedding_method == "five_dim":
                out["rotation"] = np_quats_to_5d(quats)
            else:
                out["rotation"] = quats
        if cfg.use_images:
            out["image_data"], out["image_stamps"] = self._image_window(rec, stamp)
            if rec.vision_u is not None:
                # aux-cue-head target: the latent drawn in the NEWEST
                # VISIBLE frame (same side="right" visibility rule as
                # _image_window, so label and frame agree at boundaries)
                hi = np.searchsorted(rec.image_stamps, stamp, side="right")
                out["vision_u"] = np.float32(
                    rec.vision_u[hi - 1] if hi > 0 else 0.0)
                out["vision_u_valid"] = np.float32(1.0 if hi > 0 else 0.0)
        if cfg.use_gamestate:
            gi = np.searchsorted(rec.game_state_stamps, stamp, side="right") - 1
            out["game_state"] = np.int32(
                rec.game_states[gi] if gi >= 0 else int(RobotState.UNKNOWN)
            )
        return out

    @staticmethod
    def oversampled_order(n: int, special: np.ndarray, frac: float,
                          rng: np.random.Generator) -> np.ndarray:
        """An epoch's window order with ``frac`` of the slots drawn (with
        replacement) from ``special`` and the rest a uniform permutation.

        The round-4 camera lever: on camera-cued data the learnable image
        signal concentrates in the ~1/image_step boundary windows
        (docs/quality_ledger_vision_oracle.md — achievable cued/blind
        ratio 59.5x there vs 1.3x on mixed windows), so uniform sampling
        starves the image pathway's gradient by ~10x. Epoch length and
        batch shapes are unchanged; evaluation always uses uniform
        held-out windows (evaluation/report.py)."""
        order = rng.permutation(n)
        if frac <= 0.0 or len(special) == 0:
            return order
        k = int(round(frac * n))
        slots = rng.choice(n, size=k, replace=False)
        order[slots] = rng.choice(special, size=k, replace=True)
        return order

    def image_boundary_indices(self) -> np.ndarray:
        """Window indices whose stamp coincides with an image stamp — the
        windows where a camera frame has JUST become visible.

        For camera-cued data (the "vision" dummy task, data/dummy.py) these
        are the windows whose future chunk is driven by a target the newest
        image alone encodes (proprioceptive history still shows the
        PREVIOUS target's convergence), so image-sensitivity probes
        restricted to this subset measure the camera's contribution
        undiluted by mid-interval windows, where history already reveals
        the cue (evaluation/report.py boundary probes).
        """
        out = []
        if not self.cfg.use_images:
            return np.asarray(out, dtype=np.int64)
        half_tick = 0.5 / self.sampling_rate
        for start_sample, end_sample, ri in self.sample_boundaries:
            rec = self.recordings[ri]
            if (rec.images is None or rec.image_stamps is None
                    or not len(rec.image_stamps)):
                continue
            for idx in range(start_sample, end_sample):
                stamp = (idx - start_sample) * self.stride / self.sampling_rate
                k = np.searchsorted(rec.image_stamps, stamp + half_tick) - 1
                if k >= 0 and abs(float(rec.image_stamps[k]) - stamp) < half_tick:
                    out.append(idx)
        return np.asarray(out, dtype=np.int64)

    def _image_window(self, rec: RecordingArrays, stamp: float) -> tuple[np.ndarray, np.ndarray]:
        cfg = self.cfg
        num_frames = cfg.image_context_length
        context_len = (num_frames + 1) / self.max_fps_video
        res = cfg.image_resolution
        lo = np.searchsorted(rec.image_stamps, stamp - context_len, side="left")
        hi = np.searchsorted(rec.image_stamps, stamp, side="right")
        sel = np.arange(lo, hi)[-num_frames:]
        frames = np.zeros((num_frames, res, res, 3), dtype=np.float32)
        stamps = np.full((num_frames,), stamp - context_len, dtype=np.float32)
        n_sel = len(sel)
        if n_sel and rec.images is not None:
            for j, k in enumerate(sel):
                frames[num_frames - n_sel + j] = preprocess_image(rec.images[k], res)
            stamps[num_frames - n_sel :] = rec.image_stamps[sel]
        return frames, stamps

    def describe(self) -> str:
        """Human-readable recording summary table (the reference logs a rich
        table of recording metadata; reference pytorch.py:97-101)."""
        header = f"{'rec':>4} {'rows':>8} {'rotations':>10} {'images':>7} {'game states':>12}"
        lines = [header, "-" * len(header)]
        for rec in self.recordings:
            lines.append(
                f"{rec.recording_id:>4} {len(rec.joint_commands):>8}"
                f" {len(rec.rotations):>10} {len(rec.image_stamps):>7}"
                f" {len(rec.game_states):>12}"
            )
        lines.append(f"total windows: {self.num_samples}")
        return "\n".join(lines)

    # --------------------------------------------------------------- batching

    def sample_targets(self, num_samples: int, seed: int = 0) -> np.ndarray:
        """Random target chunks stacked along time, for Normalizer.fit
        (reference train.py:106-110)."""
        rng = np.random.default_rng(seed)
        idx = rng.integers(0, len(self), size=num_samples)
        return np.concatenate([self[int(i)]["joint_command"] for i in idx], axis=0)

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                drop_remainder: bool = True, order: np.ndarray | None = None):
        """Yield stacked numpy batch dicts for one epoch.

        ``order``: explicit window-index sequence for the epoch (overrides
        ``shuffle``/``seed``) — the hook :func:`oversampled_order` rides
        for boundary-window oversampling (TrainConfig.boundary_oversample).
        """
        if order is None:
            order = np.arange(len(self))
            if shuffle:
                np.random.default_rng(seed).shuffle(order)
        limit = len(order) - (len(order) % batch_size if drop_remainder else 0)
        for i in range(0, limit, batch_size):
            chunk = [self[int(j)] for j in order[i : i + batch_size]]
            yield {
                k: np.stack([c[k] for c in chunk]) for k in chunk[0]
            }
