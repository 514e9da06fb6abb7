"""B-Human ``.log`` import strategy.

Counterpart of reference dataset/imports/strategies/b_human.py:16-687. The
proprietary log format needs the ``pybh`` C++ bindings (built from
BHumanCodeRelease; reference README.md:50-56) — that reader is an optional
plugin gated on import. Everything else — NAO->canonical joint mapping
(including the shared hipYawPitch actuator), euler->quaternion IMU
conversion, game-state routing, and the two-clock-domain repair — is plain
Python over an abstract frame stream and fully unit-testable.

Frame stream contract: an iterable of ``BHumanFrame`` where each frame holds
``time_ms`` (B-Human frame clock, milliseconds) and a subset of
representations as plain dicts / arrays.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from datetime import datetime
from pathlib import Path
from types import SimpleNamespace
from typing import Any, Iterable

import numpy as np

from soccerdiffusion_tpu import logger
from soccerdiffusion_tpu.ingest.converters import (
    BHumanGameStateConverter,
    BHumanImageConverter,
    Converter,
    SyncedDataConverter,
)
from soccerdiffusion_tpu.ingest.importer import ImportStrategy
from soccerdiffusion_tpu.ingest.rows import ImportMetadata, InputData, ModelData, Quaternion, RecordingRow

#: canonical snake name -> B-Human angle key (reference b_human.py:320-358).
#: NAO's single hipYawPitch actuator drives both hip yaw columns; rElbowRoll /
#: lElbowRoll map onto the Wolfgang-style elbow columns.
NAO_ANGLE_MAP = {
    "r_shoulder_pitch": "rShoulderPitch",
    "l_shoulder_pitch": "lShoulderPitch",
    "r_shoulder_roll": "rShoulderRoll",
    "l_shoulder_roll": "lShoulderRoll",
    "r_elbow": "rElbowRoll",
    "r_elbow_yaw": "rElbowYaw",
    "l_elbow": "lElbowRoll",
    "l_elbow_yaw": "lElbowYaw",
    "r_hip_yaw": "rHipYawPitch",
    "l_hip_yaw": "lHipYawPitch",
    "r_hip_roll": "rHipRoll",
    "l_hip_roll": "lHipRoll",
    "r_hip_pitch": "rHipPitch",
    "l_hip_pitch": "lHipPitch",
    "r_knee": "rKneePitch",
    "l_knee": "lKneePitch",
    "r_ankle_pitch": "rAnklePitch",
    "l_ankle_pitch": "lAnklePitch",
    "r_ankle_roll": "rAnkleRoll",
    "l_ankle_roll": "lAnkleRoll",
    "head_pan": "headYaw",
    "head_tilt": "headPitch",
}

#: Path-embedded datetime, e.g. bhumand_2024-04-07_14-30 (reference
#: b_human.py:442-485 parses the recording datetime from the file path).
_PATH_DATETIME_RE = re.compile(r"(\d{4})-(\d{2})-(\d{2})[_T ]?(\d{2})[-:](\d{2})")


def map_nao_angles(angles: dict[str, float]) -> dict[str, float]:
    """B-Human angles dict -> canonical snake-case joint dict."""
    return {canonical: angles[bh_key] for canonical, bh_key in NAO_ANGLE_MAP.items()}


def euler_sxyz_to_quat(ax: float, ay: float, az: float) -> tuple[float, float, float, float]:
    """Static-frame xyz Euler angles -> quaternion (w, x, y, z).

    Matches transforms3d's ``euler2quat(..., "sxyz")`` used by the reference
    for InertialSensorData (b_human.py:310-316).
    """
    ci, si = math.cos(ax / 2), math.sin(ax / 2)
    cj, sj = math.cos(ay / 2), math.sin(ay / 2)
    ck, sk = math.cos(az / 2), math.sin(az / 2)
    # sxyz composition: q = qz * qy * qx applied in static frame
    w = ci * cj * ck + si * sj * sk
    x = si * cj * ck - ci * sj * sk
    y = ci * sj * ck + si * cj * sk
    z = ci * cj * sk - si * sj * ck
    return w, x, y, z


def compute_jpeg_time_offset(frame_times_ms: list[int], image_times_ms: list[int]) -> float:
    """Mean difference between the JPEG timestamp clock and the frame clock.

    The reference observes the JPEG clock offset (~25 days) and removes it by
    mean-difference (b_human.py:542-622, ``JPEG_IMAGE_DATE_OFFSET``).
    """
    if not frame_times_ms or not image_times_ms:
        return 0.0
    n = min(len(frame_times_ms), len(image_times_ms))
    return float(np.mean(np.asarray(image_times_ms[:n], dtype=np.float64)
                         - np.asarray(frame_times_ms[:n], dtype=np.float64)))


def infer_missing_times(times_ms: list[int | None]) -> list[int]:
    """Fill None frame times by linear interpolation / extrapolation and sort
    monotonically (the reference infers missing frame times and sorts;
    b_human.py:597-611)."""
    arr = np.asarray([t if t is not None else np.nan for t in times_ms], dtype=np.float64)
    idx = np.arange(len(arr))
    known = ~np.isnan(arr)
    if known.sum() == 0:
        return list(range(len(arr)))
    arr = np.interp(idx, idx[known], arr[known])
    return np.maximum.accumulate(arr).astype(np.int64).tolist()


def datetime_from_path(path: str | Path) -> datetime | None:
    m = _PATH_DATETIME_RE.search(str(path))
    if not m:
        return None
    y, mo, d, h, mi = map(int, m.groups())
    return datetime(y, mo, d, h, mi)


@dataclass
class BHumanFrame:
    """One cognition/motion frame's worth of representations."""

    time_ms: int | None = None
    game_state: dict | None = None
    inertial_angles: dict | None = None  # {"x": rad, "y": rad, "z": rad}
    joint_request_angles: dict | None = None  # B-Human angle keys
    joint_sensor_angles: dict | None = None
    upper_image: np.ndarray | None = None  # BGR uint8
    lower_image: np.ndarray | None = None


class BHumanImportStrategy(ImportStrategy):
    def __init__(
        self,
        metadata: ImportMetadata,
        image_converter: BHumanImageConverter,
        game_state_converter: BHumanGameStateConverter,
        synced_data_converter: SyncedDataConverter,
        caching: bool = False,
        video: bool = False,
    ):
        self.metadata = metadata
        self.image_converter = image_converter
        self.game_state_converter = game_state_converter
        self.synced_data_converter = synced_data_converter
        self.caching = caching
        self.video = video
        self.model_data = ModelData()

    def convert_to_model_data(self, file_path: Path) -> ModelData:
        frames = read_bhuman_log(Path(file_path), caching=self.caching)
        return self.convert_frames(
            frames,
            original_file=Path(file_path).name,
            start_time=datetime_from_path(file_path),
        )

    def convert_frames(
        self,
        frames: Iterable[BHumanFrame],
        original_file: str = "<stream>",
        start_time: datetime | None = None,
    ) -> ModelData:
        frames = list(frames)
        times = infer_missing_times([f.time_ms for f in frames])

        self.model_data.recording = RecordingRow(
            allow_public=self.metadata.allow_public,
            original_file=original_file,
            team_name=self.metadata.team_name,
            robot_type=self.metadata.robot_type,
            start_time=start_time,
            location=self.metadata.location,
            simulated=self.metadata.simulated,
            img_width_scaling=0.0,
            img_height_scaling=0.0,
        )

        first_time: int | None = None
        latest = InputData()
        for frame, t_ms in zip(frames, times):
            converters: list[Converter] = []
            if frame.game_state is not None:
                latest.game_state = frame.game_state
                converters.append(self.game_state_converter)
            if frame.inertial_angles is not None:
                w, x, y, z = euler_sxyz_to_quat(
                    frame.inertial_angles["x"], frame.inertial_angles["y"],
                    frame.inertial_angles.get("z", 0.0),
                )
                latest.rotation = Quaternion(x=x, y=y, z=z, w=w)
                converters.append(self.synced_data_converter)
            if frame.joint_request_angles is not None:
                mapped = map_nao_angles(frame.joint_request_angles)
                latest.set_joint_command_msg(
                    SimpleNamespace(
                        joint_names=list(mapped), positions=list(mapped.values())
                    )
                )
                converters.append(self.synced_data_converter)
            if frame.joint_sensor_angles is not None:
                mapped = map_nao_angles(frame.joint_sensor_angles)
                latest.joint_state = mapped
                converters.append(self.synced_data_converter)
            if frame.upper_image is not None or frame.lower_image is not None:
                if frame.upper_image is not None:
                    latest.image = frame.upper_image
                if frame.lower_image is not None:
                    latest.lower_image = frame.lower_image
                converters.append(self.image_converter)

            if not self._is_all_synced_data_available(latest):
                continue
            if first_time is None:
                first_time = t_ms
                if latest.game_state is not None:
                    self._create_models(self.game_state_converter, latest, 0.0)
                self._create_models(self.synced_data_converter, latest, 0.0)
                continue
            rel_ts = (t_ms - first_time) / 1e3
            for converter in dict.fromkeys(converters):
                self._create_models(converter, latest, rel_ts)
        return self.model_data

    def _create_models(self, converter: Converter, data: InputData, rel_ts: float) -> None:
        assert self.model_data.recording is not None
        converter.populate_recording_metadata(data, self.model_data.recording)
        self.model_data.merge(
            converter.convert_to_model(data, rel_ts, self.model_data.recording)
        )

    @staticmethod
    def _is_all_synced_data_available(data: InputData) -> bool:
        commands_ready = all(c is not None for c in data.joint_command.values())
        return commands_ready and data.joint_state is not None and data.rotation is not None


def frame_statistics(frames: list[BHumanFrame]) -> str:
    """Per-representation frame counts and rates (the reference prints a rich
    statistics table; reference b_human.py:640-682)."""
    counts = {
        "GameState": sum(f.game_state is not None for f in frames),
        "InertialSensorData": sum(f.inertial_angles is not None for f in frames),
        "JointRequest": sum(f.joint_request_angles is not None for f in frames),
        "JointSensorData": sum(f.joint_sensor_angles is not None for f in frames),
        "Image(upper)": sum(f.upper_image is not None for f in frames),
        "Image(lower)": sum(f.lower_image is not None for f in frames),
    }
    times = [f.time_ms for f in frames if f.time_ms is not None]
    duration_s = (max(times) - min(times)) / 1e3 if len(times) > 1 else 0.0
    header = f"{'representation':<20} {'frames':>8} {'rate [Hz]':>10}"
    lines = [header, "-" * len(header)]
    for name, count in counts.items():
        rate = count / duration_s if duration_s > 0 else 0.0
        lines.append(f"{name:<20} {count:>8} {rate:>10.1f}")
    lines.append(f"total frames: {len(frames)}, duration: {duration_s:.1f}s")
    return "\n".join(lines)


def read_bhuman_log(path: Path, caching: bool = False) -> list[BHumanFrame]:
    """Read a proprietary ``.log`` via the optional pybh bindings."""
    try:
        import pybh.logs as bhlogs  # noqa: F401
    except ImportError as exc:  # pragma: no cover - optional native dependency
        raise ImportError(
            "B-Human log import requires the 'pybh' bindings built from "
            "BHumanCodeRelease (see the reference README for build steps)"
        ) from exc
    raise NotImplementedError(
        "pybh available but the adapter is not wired yet; feed BHumanFrame "
        "streams to BHumanImportStrategy.convert_frames instead"
    )
