"""Schema versioning & migrations (alembic counterpart, stdlib-only).

The reference tracks two revisions: the base schema (rev 3f1574e89695) and
the NAO elbow-yaw column addition (rev 14ae0e795470, reference
dataset/migrations/versions/14ae0e795470_add_nao_elbow_joint.py:22-40).
Here the same history is a linear integer-versioned migration list stored
in a ``schema_version`` table:

  v1  base schema, 20-joint tables (no elbow yaw)
  v2  add "RElbowYaw"/"LElbowYaw" columns (default 0.0) to both joint tables

``create_schema`` stamps fresh databases at the latest version; ``migrate``
upgrades v1 databases (including those produced by the reference's base
revision) in place.
"""

from __future__ import annotations

import sqlite3

from soccerdiffusion_tpu import logger

LATEST_VERSION = 2

_ELBOW_YAW_COLUMNS = ("RElbowYaw", "LElbowYaw")


def _migrate_v2_add_elbow_yaw(conn: sqlite3.Connection) -> None:
    """Add the NAO elbow-yaw columns. SQLite's ADD COLUMN cannot attach the
    [0, 2*pi) CHECK the reference's batch-rebuild adds; defaults (0.0) are
    in range and all writers enforce the range at conversion time."""
    for table in ("JointStates", "JointCommands"):
        existing = {row[1] for row in conn.execute(f"PRAGMA table_info({table})")}
        for col in _ELBOW_YAW_COLUMNS:
            if col not in existing:
                conn.execute(f'ALTER TABLE {table} ADD COLUMN "{col}" FLOAT DEFAULT 0.0')


MIGRATIONS: dict[int, tuple[str, callable]] = {
    2: ("add NAO elbow-yaw columns", _migrate_v2_add_elbow_yaw),
}


def _ensure_version_table(conn: sqlite3.Connection) -> None:
    conn.execute("CREATE TABLE IF NOT EXISTS schema_version (version INTEGER NOT NULL)")


def schema_version(conn: sqlite3.Connection) -> int:
    """Current version; infers v1/v2 for unstamped (reference-made) DBs."""
    _ensure_version_table(conn)
    row = conn.execute("SELECT MAX(version) FROM schema_version").fetchone()
    if row and row[0] is not None:
        return int(row[0])
    # Unstamped: infer from the presence of the elbow-yaw columns.
    tables = {r[0] for r in conn.execute(
        "SELECT name FROM sqlite_master WHERE type='table'"
    )}
    if "JointStates" not in tables:
        return 0
    cols = {r[1] for r in conn.execute("PRAGMA table_info(JointStates)")}
    return 2 if "RElbowYaw" in cols else 1


def stamp(conn: sqlite3.Connection, version: int) -> None:
    _ensure_version_table(conn)
    conn.execute("DELETE FROM schema_version")
    conn.execute("INSERT INTO schema_version (version) VALUES (?)", (version,))
    conn.commit()


def migrate(conn: sqlite3.Connection, target: int = LATEST_VERSION) -> int:
    """Apply pending migrations up to ``target``; returns the final version."""
    current = schema_version(conn)
    if current == 0:
        raise ValueError("no schema present; run create_schema first")
    while current < target:
        current += 1
        name, fn = MIGRATIONS[current]
        logger.info(f"migrating schema to v{current}: {name}")
        fn(conn)
        stamp(conn, current)
    return current
