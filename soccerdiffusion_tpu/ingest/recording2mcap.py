"""Export a recording from SQLite back into an ``.mcap`` file for replay
inspection (Foxglove/Lichtblick-style viewers).

Counterpart of reference dataset/recording2mcap.py:302-320, re-targeted to
the vendor-neutral ``mcap`` writer with foxglove/JSON-encoded channels
instead of a ROS 2 rosbag2 stack: one channel per table — /recording (info),
/image (foxglove.RawImage), /rotation (quaternion + euler), /joint_states,
/joint_commands, /game_state. Gated on the optional ``mcap`` package.
"""

from __future__ import annotations

import base64
import json
import math
from pathlib import Path

from soccerdiffusion_tpu import logger
from soccerdiffusion_tpu.config import CANONICAL_JOINT_NAMES_22
from soccerdiffusion_tpu.data.schema import connect


def _quat_to_euler(x: float, y: float, z: float, w: float) -> tuple[float, float, float]:
    """xyzw quaternion -> roll/pitch/yaw (for the viewer's plots)."""
    sinr = 2 * (w * x + y * z)
    cosr = 1 - 2 * (x * x + y * y)
    roll = math.atan2(sinr, cosr)
    sinp = max(-1.0, min(1.0, 2 * (w * y - z * x)))
    pitch = math.asin(sinp)
    siny = 2 * (w * z + x * y)
    cosy = 1 - 2 * (y * y + z * z)
    yaw = math.atan2(siny, cosy)
    return roll, pitch, yaw


def recording2mcap(db_path: str | Path, recording_id: int, output: str | Path) -> None:
    try:
        from mcap.writer import Writer
    except ImportError:  # vendored fallback (ingest/mcap_io.py)
        from soccerdiffusion_tpu.ingest.mcap_io import McapWriter as Writer

    conn = connect(db_path, read_only=True)
    cur = conn.cursor()
    rec = cur.execute(
        "SELECT original_file, team_name, team_color, robot_type, location,"
        " simulated, img_width, img_height FROM Recording WHERE _id=?",
        (recording_id,),
    ).fetchone()
    if rec is None:
        raise ValueError(f"recording {recording_id} not found")

    with open(output, "wb") as f:
        writer = Writer(f)
        writer.start()

        def channel(topic: str) -> int:
            schema = writer.register_schema(
                name=topic.strip("/"), encoding="jsonschema", data=b"{}"
            )
            return writer.register_channel(
                topic=topic, message_encoding="json", schema_id=schema
            )

        channels = {
            t: channel(t)
            for t in ("/recording", "/image", "/rotation", "/joint_states",
                      "/joint_commands", "/game_state")
        }

        def publish(topic: str, stamp_s: float, payload: dict) -> None:
            ns = int(stamp_s * 1e9)
            writer.add_message(
                channels[topic], log_time=ns, publish_time=ns,
                data=json.dumps(payload).encode(),
            )

        publish("/recording", 0.0, {
            "original_file": rec[0], "team_name": rec[1], "team_color": rec[2],
            "robot_type": rec[3], "location": rec[4], "simulated": bool(rec[5]),
        })

        w, h = int(rec[6]), int(rec[7])
        for stamp, data in cur.execute(
            "SELECT stamp, data FROM Image WHERE recording_id=? ORDER BY stamp", (recording_id,)
        ):
            publish("/image", stamp, {
                "timestamp": {"sec": int(stamp), "nsec": int((stamp % 1) * 1e9)},
                "width": w, "height": h, "encoding": "rgb8", "step": w * 3,
                "data": base64.b64encode(data).decode(),
            })

        for stamp, x, y, z, qw in cur.execute(
            "SELECT stamp, x, y, z, w FROM Rotation WHERE recording_id=? ORDER BY stamp",
            (recording_id,),
        ):
            roll, pitch, yaw = _quat_to_euler(x, y, z, qw)
            publish("/rotation", stamp, {
                "quaternion": {"x": x, "y": y, "z": z, "w": qw},
                "euler": {"roll": roll, "pitch": pitch, "yaw": yaw},
            })

        joint_cols = ", ".join(f'"{n}"' for n in CANONICAL_JOINT_NAMES_22)
        for table, topic in (("JointStates", "/joint_states"), ("JointCommands", "/joint_commands")):
            for row in cur.execute(
                f"SELECT stamp, {joint_cols} FROM {table} WHERE recording_id=? ORDER BY stamp",
                (recording_id,),
            ):
                publish(topic, row[0], {
                    "name": list(CANONICAL_JOINT_NAMES_22),
                    "position": list(row[1:]),
                })

        for stamp, state in cur.execute(
            "SELECT stamp, state FROM GameState WHERE recording_id=? ORDER BY stamp",
            (recording_id,),
        ):
            publish("/game_state", stamp, {"state": state})

        writer.finish()
    logger.info(f"wrote {output}")
