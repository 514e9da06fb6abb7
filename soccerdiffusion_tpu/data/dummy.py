"""Synthetic data generation — the framework's fake backend.

Two tiers (reference dataset/dummy_data.py:23-197 is the model):

  * ``insert_dummy_data``: fills a SQLite DB with the same procedural
    content as the reference CLI's ``db dummy-data`` (sinusoid joints
    shifted by +pi, sinusoid pseudo-quaternions, random game states,
    procedurally drawn test images) so the whole SQLite -> dataset -> train
    path can run without real recordings.
  * ``generate_dummy_arrays``: the TPU-first shortcut — produces the same
    statistical content directly as contiguous numpy arrays, skipping
    SQLite entirely for tests/benchmarks.
"""

from __future__ import annotations

import math
import sqlite3
from dataclasses import dataclass

import numpy as np

from soccerdiffusion_tpu.config import CANONICAL_JOINT_NAMES_22
from soccerdiffusion_tpu.data.schema import RobotState, TeamColor


def _draw_test_image(width: int, height: int, timestamp: float) -> np.ndarray:
    """Procedural RGB8 test pattern (reference dummy_data.py:49-69 look-alike:
    colored quadrants, center circles, a time-varying dot). Uses pure numpy
    so the generator works without cv2."""
    img = np.zeros((height, width, 3), dtype=np.uint8)
    img[: height // 2, : width // 2] = (0, 0, 255)  # blue quadrant (RGB)
    img[height // 2 :, width // 2 :] = (255, 0, 0)  # red quadrant
    yy, xx = np.mgrid[0:height, 0:width]
    center = ((yy - height / 2) ** 2 + (xx - width / 2) ** 2) ** 0.5
    img[center < 50] = (255, 255, 255)
    dot_color = (
        int(255 * (1 + math.sin(timestamp)) / 2),
        int(255 * (1 + math.cos(timestamp)) / 2),
        0,
    )
    img[center < 25] = dot_color
    return img


def _sinusoid_joints(n: int, num_joints: int, rng: np.random.Generator, speed: float = 0.2) -> np.ndarray:
    """sin(speed * i + offset_j) + pi, per joint (reference dummy_data.py:107-137).

    The +pi shift keeps every angle inside the schema's [0, 2*pi) constraint.
    """
    offsets = rng.random(num_joints)
    i = np.arange(n, dtype=np.float64)[:, None]
    return (np.sin(speed * i + offsets[None, :]) + math.pi).astype(np.float32)


def _sinusoid_rotations(n: int, rng: np.random.Generator, speed: float = 0.1) -> np.ndarray:
    """Per-component sinusoids in [-1, 1] (reference dummy_data.py:86-104 —
    deliberately *not* unit quaternions, matching the reference's generator)."""
    shifts = rng.random(4)
    i = np.arange(n, dtype=np.float64)[:, None]
    return np.sin(i * speed + shifts[None, :]).astype(np.float32)


@dataclass
class DummyRecording:
    joint_commands: np.ndarray  # (n, J) float32, [0, 2pi)
    joint_states: np.ndarray  # (n, J) float32, [0, 2pi)
    rotations: np.ndarray  # (n, 4) float32 xyzw
    game_states: np.ndarray  # (n,) int32 in [0, 4)
    image_stamps: np.ndarray  # (n_img,) float32 seconds
    images: np.ndarray | None  # (n_img, H, W, 3) uint8, or None
    # "vision" task metadata (None for the decorative task): the latent
    # drawn in each image and the per-joint response direction, kept so
    # tests can verify the image->trajectory dependence structurally.
    vision_u: np.ndarray | None = None  # (n_img,) float32 in [-1, 1]
    vision_dirs: np.ndarray | None = None  # (J,) float32 in [-1, 1]


def _draw_cue_image(width: int, height: int, u: float) -> np.ndarray:
    """RGB8 cue frame for the "vision" task: a bright green vertical bar on
    a dim field whose horizontal position linearly encodes ``u in [-1, 1]``
    (u = -1 -> left edge, u = +1 -> right edge). The only task-relevant
    content is the bar position, so a correct policy must localize it."""
    img = np.full((height, width, 3), 40, dtype=np.uint8)
    img[height // 2 - 1 : height // 2 + 1] = 70  # faint horizon for texture
    bar_w = max(2, width // 12)
    cx = int(round((float(u) + 1.0) / 2.0 * (width - bar_w)))
    img[:, cx : cx + bar_w] = (0, 255, 0)
    return img


def _stamps_f32_floor(tick_indices: np.ndarray, sampling_rate: int) -> np.ndarray:
    """Largest float32 <= tick/rate — so an image stamped at tick k is
    visible to the window whose own (float64) stamp is exactly k/rate.

    A plain ``.astype(float32)`` rounds ~half of the exact stamps UP one
    ulp, and ``WindowedDataset._image_window``'s ``searchsorted(...,
    side="right")`` then excludes the image at its own boundary tick —
    for the "vision" task that would hand ~4% of windows a future chunk
    driven by a cue no visible image encodes.
    """
    exact = tick_indices / sampling_rate  # float64
    stamps = exact.astype(np.float32)
    return np.where(stamps.astype(np.float64) > exact,
                    np.nextafter(stamps, np.float32(-np.inf)), stamps)


#: first-order lag toward the cued target per tick (the "vision" task)
VISION_BETA = 0.35
#: per-joint target amplitude around pi (radians)
VISION_AMP = 0.9
#: per-tick process-noise std of the lag plant (radians)
VISION_NOISE_STD = 0.03


def _vision_recording(
    num_samples: int,
    num_joints: int,
    image_step: int,
    image_size: int,
    rng: np.random.Generator,
    sampling_rate: int,
    dirs: np.ndarray,
    noise_std: float = VISION_NOISE_STD,
) -> DummyRecording:
    """Camera-conditioned synthetic task: each image PREVIEWS the target.

    A latent ``u_k ~ U[-1, 1]`` is redrawn at every image stamp
    ``s_k = k * image_step / sampling_rate`` and drawn into that image as a
    bar position (:func:`_draw_cue_image`). Joint commands first-order-lag
    toward ``pi + VISION_AMP * u_k * dirs`` during ticks
    ``[k * image_step, (k+1) * image_step)`` — i.e. the interval *after*
    the image becomes visible. Because u is i.i.d. per interval, the future
    chunk is unpredictable from proprioceptive history alone at interval
    boundaries; the newest camera frame is the only source of the new
    target. This makes image-conditioning *necessary*, unlike the
    decorative task (and unlike the reference's dummy images,
    dataset/dummy_data.py:49-69, which carry no trajectory signal) — the
    basis for the recorded image-sensitivity quality evidence
    (evaluation/openloop.py image-shuffle probes).
    """
    n_img = -(-num_samples // image_step)
    u = rng.uniform(-1.0, 1.0, size=n_img).astype(np.float32)
    cmds = np.empty((num_samples, num_joints), dtype=np.float32)
    prev = np.full((num_joints,), math.pi, dtype=np.float32)
    noise = rng.normal(0.0, noise_std, size=(num_samples, num_joints)).astype(np.float32)
    for t in range(num_samples):
        target = math.pi + VISION_AMP * u[t // image_step] * dirs
        prev = prev + VISION_BETA * (target - prev) + noise[t]
        cmds[t] = prev
    cmds = np.clip(cmds, 0.0, 2.0 * math.pi - 1e-6)
    # joint states follow commands with one tick of plant latency
    states = np.vstack([cmds[:1], cmds[:-1]])
    stamps = _stamps_f32_floor(np.arange(n_img) * image_step, sampling_rate)
    images = np.stack([_draw_cue_image(image_size, image_size, float(v)) for v in u])
    return DummyRecording(
        joint_commands=cmds,
        joint_states=states,
        rotations=_sinusoid_rotations(num_samples, rng),
        game_states=np.zeros(num_samples, dtype=np.int32),
        image_stamps=stamps,
        images=images,
        vision_u=u,
        vision_dirs=dirs,
    )


def generate_dummy_arrays(
    num_recordings: int = 2,
    num_samples: int = 500,
    num_joints: int = 20,
    image_step: int = 10,
    image_size: int = 480,
    with_images: bool = False,
    seed: int = 0,
    sampling_rate: int = 100,
    task: str = "decorative",
) -> list[DummyRecording]:
    """Array-tier dummy data; one entry per recording.

    Timestamps follow the reference convention stamp = i / sampling_rate
    (reference dummy_data.py:79,114; pytorch.py:314 assumes rate 100).

    ``task`` selects the generator: "decorative" is the reference-style
    content (sinusoid joints, test-pattern images with no trajectory
    signal); "vision" is the camera-conditioned task where each image
    previews the next target interval (:func:`_vision_recording`) —
    images are always generated for it.
    """
    rng = np.random.default_rng(seed)
    if task == "vision":
        # one image->target mapping SHARED by all recordings: the cue
        # semantics are a property of the task, not of the session, so a
        # policy can learn them from the newest frame alone (per-recording
        # dirs would make the mapping ambiguous without inferring the
        # session from proprioceptive history)
        dirs = rng.uniform(-1.0, 1.0, size=num_joints).astype(np.float32)
        dirs = np.sign(dirs) * np.maximum(np.abs(dirs), 0.25)
        return [
            _vision_recording(num_samples, num_joints, image_step,
                              image_size, rng, sampling_rate, dirs=dirs)
            for _ in range(num_recordings)
        ]
    if task != "decorative":
        raise ValueError(f"unknown dummy task: {task!r}")
    recordings = []
    for _ in range(num_recordings):
        n_img = len(range(0, num_samples, image_step))
        stamps = _stamps_f32_floor(np.arange(0, num_samples, image_step),
                                   sampling_rate)
        images = None
        if with_images:
            images = np.stack(
                [_draw_test_image(image_size, image_size, float(s)) for s in stamps]
            )
        recordings.append(
            DummyRecording(
                joint_commands=_sinusoid_joints(num_samples, num_joints, rng),
                joint_states=_sinusoid_joints(num_samples, num_joints, rng),
                rotations=_sinusoid_rotations(num_samples, rng),
                game_states=rng.integers(0, 4, size=num_samples).astype(np.int32),
                image_stamps=stamps,
                images=images,
            )
        )
    return recordings


def insert_dummy_data(
    conn: sqlite3.Connection,
    num_recordings: int,
    num_samples_per_rec: int,
    image_step: int,
    seed: int = 0,
    image_size: int = 480,
) -> list[int]:
    """SQLite-tier dummy data (reference dummy_data.py:186-197 CLI behavior)."""
    rng = np.random.default_rng(seed)
    cur = conn.cursor()
    recording_ids = []
    colors = TeamColor.values()
    for i in range(num_recordings):
        cur.execute(
            "INSERT INTO Recording (allow_public, original_file, team_name, team_color,"
            " robot_type, location, simulated, img_width, img_height,"
            " img_width_scaling, img_height_scaling)"
            " VALUES (1, ?, ?, ?, ?, ?, 1, ?, ?, 1.0, 1.0)",
            (
                f"dummy_original_file{i}", f"dummy_team_name{i}",
                colors[int(rng.integers(len(colors)))], f"dummy_robot_type{i}",
                f"dummy_location{i}", image_size, image_size,
            ),
        )
        recording_ids.append(cur.lastrowid)

    joint_cols = ", ".join(f'"{n}"' for n in CANONICAL_JOINT_NAMES_22)
    joint_ph = ", ".join("?" * len(CANONICAL_JOINT_NAMES_22))
    states = RobotState.values()
    for rec_id in recording_ids:
        data = generate_dummy_arrays(
            1, num_samples_per_rec, num_joints=len(CANONICAL_JOINT_NAMES_22),
            image_step=image_step, image_size=image_size, with_images=True,
            seed=int(rng.integers(2**31)),
        )[0]
        cur.executemany(
            f"INSERT INTO JointCommands (stamp, recording_id, {joint_cols})"
            f" VALUES (?, ?, {joint_ph})",
            [(i / 100, rec_id, *map(float, row)) for i, row in enumerate(data.joint_commands)],
        )
        cur.executemany(
            f"INSERT INTO JointStates (stamp, recording_id, {joint_cols})"
            f" VALUES (?, ?, {joint_ph})",
            [(i / 100, rec_id, *map(float, row)) for i, row in enumerate(data.joint_states)],
        )
        cur.executemany(
            "INSERT INTO Rotation (stamp, recording_id, x, y, z, w) VALUES (?, ?, ?, ?, ?, ?)",
            [(i / 100, rec_id, *map(float, row)) for i, row in enumerate(data.rotations)],
        )
        cur.executemany(
            "INSERT INTO GameState (stamp, recording_id, state) VALUES (?, ?, ?)",
            [(i / 100, rec_id, states[s]) for i, s in enumerate(data.game_states)],
        )
        assert data.images is not None
        cur.executemany(
            "INSERT INTO Image (stamp, recording_id, data) VALUES (?, ?, ?)",
            [
                (float(stamp), rec_id, img.tobytes())
                for stamp, img in zip(data.image_stamps, data.images)
            ],
        )
    conn.commit()
    return recording_ids
