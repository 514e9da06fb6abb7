"""Import orchestration: strategy -> validated bulk insert into SQLite.

Counterpart of reference dataset/imports/model_importer.py:9-41 (strategy
ABC + validate-then-commit), with the ORM's add_all replaced by executemany
bulk inserts in one transaction.
"""

from __future__ import annotations

import sqlite3
from abc import ABC, abstractmethod
from pathlib import Path

from soccerdiffusion_tpu import logger
from soccerdiffusion_tpu.ingest.rows import ModelData, snake_to_column


class ImportStrategy(ABC):
    @abstractmethod
    def convert_to_model_data(self, file_path: Path) -> ModelData:
        """Read the recording file and produce rows."""


class ModelImporter:
    def __init__(self, conn: sqlite3.Connection, strategy: ImportStrategy):
        self.conn = conn
        self.strategy = strategy

    def import_to_db(self, file_path: Path) -> int:
        """Convert and commit; returns the new recording id.

        Validates that every synced model list is non-empty before writing
        (reference model_importer.py:35-38).
        """
        logger.info(f"importing {file_path}")
        model_data = self.strategy.convert_to_model_data(Path(file_path))

        assert model_data.recording is not None, "strategy produced no recording"
        for name in ("game_states", "joint_states", "joint_commands", "images", "rotations"):
            assert getattr(model_data, name), f"strategy produced no {name}"

        logger.info(
            "writing rows: %d joint_states, %d joint_commands, %d rotations,"
            " %d images, %d game_states"
            % (
                len(model_data.joint_states), len(model_data.joint_commands),
                len(model_data.rotations), len(model_data.images),
                len(model_data.game_states),
            )
        )
        return write_model_data(self.conn, model_data)


def write_model_data(conn: sqlite3.Connection, model_data: ModelData) -> int:
    """Bulk-insert a ModelData into the reference schema; returns recording id."""
    rec = model_data.recording
    assert rec is not None
    cur = conn.cursor()
    cur.execute(
        "INSERT INTO Recording (allow_public, original_file, team_name, team_color,"
        " robot_type, start_time, end_time, location, simulated, img_width,"
        " img_height, img_width_scaling, img_height_scaling)"
        " VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
        (
            rec.allow_public, rec.original_file, rec.team_name, rec.team_color,
            rec.robot_type,
            rec.start_time.isoformat(sep=" ") if rec.start_time else None,
            rec.end_time.isoformat(sep=" ") if rec.end_time else None,
            rec.location, rec.simulated, rec.img_width, rec.img_height,
            rec.img_width_scaling, rec.img_height_scaling,
        ),
    )
    rec_id = cur.lastrowid
    assert rec_id is not None

    for table, rows in (("JointStates", model_data.joint_states),
                        ("JointCommands", model_data.joint_commands)):
        if not rows:
            continue
        joint_names = sorted(rows[0].joints)
        cols = ", ".join(f'"{snake_to_column(j)}"' for j in joint_names)
        ph = ", ".join("?" * len(joint_names))
        cur.executemany(
            f"INSERT INTO {table} (stamp, recording_id, {cols}) VALUES (?, ?, {ph})",
            [
                (row.stamp, rec_id, *(float(row.joints[j]) for j in joint_names))
                for row in rows
            ],
        )
    cur.executemany(
        "INSERT INTO Rotation (stamp, recording_id, x, y, z, w) VALUES (?, ?, ?, ?, ?, ?)",
        [
            (r.stamp, rec_id, float(r.x), float(r.y), float(r.z), float(r.w))
            for r in model_data.rotations
        ],
    )
    cur.executemany(
        "INSERT INTO GameState (stamp, recording_id, state) VALUES (?, ?, ?)",
        [(g.stamp, rec_id, g.state) for g in model_data.game_states],
    )
    cur.executemany(
        "INSERT INTO Image (stamp, recording_id, data) VALUES (?, ?, ?)",
        [(i.stamp, rec_id, i.image.tobytes()) for i in model_data.images],
    )
    conn.commit()
    return rec_id
