"""Vendored MCAP container + CDR codec, and the end-to-end bag import the
reference CI exercises with a downloaded recording
(reference .github/workflows/test-dataset.yml:42-58) — here against a
synthesized, format-real .mcap (zstd-chunked, CDR-encoded ros2 messages,
schemas embedded as ros2msg text)."""

import io
from types import SimpleNamespace

import numpy as np
import pytest

from soccerdiffusion_tpu.ingest.mcap_io import (
    McapReader,
    McapWriter,
    decode_cdr,
    encode_cdr,
    parse_ros2_schema,
)

HEADER_BLOCK = """================================================================================
MSG: std_msgs/Header
builtin_interfaces/Time stamp
string frame_id
================================================================================
MSG: builtin_interfaces/Time
int32 sec
uint32 nanosec
"""

JOINT_STATE_SCHEMA = """std_msgs/Header header
string[] name
float64[] position
float64[] velocity
float64[] effort
""" + HEADER_BLOCK

JOINT_COMMAND_SCHEMA = """std_msgs/Header header
string[] joint_names
float64[] positions
float64[] velocities
float64[] accelerations
float64[] max_currents
""" + HEADER_BLOCK

IMU_SCHEMA = """std_msgs/Header header
geometry_msgs/Quaternion orientation
float64[9] orientation_covariance
geometry_msgs/Vector3 angular_velocity
float64[9] angular_velocity_covariance
geometry_msgs/Vector3 linear_acceleration
float64[9] linear_acceleration_covariance
================================================================================
MSG: geometry_msgs/Quaternion
float64 x
float64 y
float64 z
float64 w
================================================================================
MSG: geometry_msgs/Vector3
float64 x
float64 y
float64 z
""" + HEADER_BLOCK

IMAGE_SCHEMA = """std_msgs/Header header
uint32 height
uint32 width
string encoding
uint8 is_bigendian
uint32 step
uint8[] data
""" + HEADER_BLOCK

GAMESTATE_SCHEMA = """std_msgs/Header header
uint8 GAMESTATE_INITIAL=0
uint8 GAMESTATE_READY=1
uint8 GAMESTATE_SET=2
uint8 GAMESTATE_PLAYING=3
uint8 GAMESTATE_FINISHED=4
uint8 game_state
uint8 secondary_state
bool first_half
uint8 own_score
uint8 rival_score
bool penalized
uint16 seconds_till_unpenalized
uint8 team_color
""" + HEADER_BLOCK


def header(sec=1, frame="base_link"):
    return SimpleNamespace(stamp=SimpleNamespace(sec=sec, nanosec=500), frame_id=frame)


class TestCdrCodec:
    def test_joint_state_roundtrip(self):
        msg = SimpleNamespace(
            header=header(),
            name=["head_pan", "head_tilt"],
            position=[0.25, -1.5],
            velocity=[0.0, 0.0],
            effort=[],
        )
        data = encode_cdr(JOINT_STATE_SCHEMA, "sensor_msgs/msg/JointState", msg)
        out = decode_cdr(JOINT_STATE_SCHEMA, "sensor_msgs/msg/JointState", data)
        assert out.name == ["head_pan", "head_tilt"]
        np.testing.assert_allclose(out.position, [0.25, -1.5])
        assert out.header.stamp.sec == 1
        assert out.header.frame_id == "base_link"

    def test_imu_alignment_and_fixed_arrays(self):
        msg = SimpleNamespace(
            header=header(frame="imu"),
            orientation=SimpleNamespace(x=0.1, y=0.2, z=0.3, w=0.9),
            orientation_covariance=[0.0] * 9,
            angular_velocity=SimpleNamespace(x=1.0, y=2.0, z=3.0),
            angular_velocity_covariance=[0.0] * 9,
            linear_acceleration=SimpleNamespace(x=0.0, y=0.0, z=9.81),
            linear_acceleration_covariance=[0.0] * 9,
        )
        data = encode_cdr(IMU_SCHEMA, "sensor_msgs/msg/Imu", msg)
        out = decode_cdr(IMU_SCHEMA, "sensor_msgs/msg/Imu", data)
        np.testing.assert_allclose(
            [out.orientation.x, out.orientation.y, out.orientation.z, out.orientation.w],
            [0.1, 0.2, 0.3, 0.9],
        )
        np.testing.assert_allclose(out.linear_acceleration.z, 9.81)

    def test_image_bytes_fast_path(self):
        raw = bytes(range(256)) * 3
        msg = SimpleNamespace(header=header(frame="camera"), height=8, width=32,
                              encoding="rgb8", is_bigendian=0, step=96, data=raw)
        data = encode_cdr(IMAGE_SCHEMA, "sensor_msgs/msg/Image", msg)
        out = decode_cdr(IMAGE_SCHEMA, "sensor_msgs/msg/Image", data)
        assert out.data == raw and isinstance(out.data, bytes)
        assert (out.height, out.width, out.encoding) == (8, 32, "rgb8")

    def test_constants_are_skipped(self):
        specs = parse_ros2_schema(GAMESTATE_SCHEMA, "bitbots_msgs/msg/GameState")
        names = [f[0] for f in specs["bitbots_msgs/GameState"].fields]
        assert "GAMESTATE_PLAYING" not in names
        assert "penalized" in names and "team_color" in names


class TestMcapContainer:
    @pytest.mark.parametrize("compression", [None, "zstd"])
    def test_writer_reader_roundtrip(self, compression):
        buf = io.BytesIO()
        w = McapWriter(buf, chunk_compression=compression)
        w.start()
        sid = w.register_schema(name="sensor_msgs/msg/JointState",
                                encoding="ros2msg", data=JOINT_STATE_SCHEMA.encode())
        cid = w.register_channel(topic="/joint_states", message_encoding="cdr",
                                 schema_id=sid)
        payloads = []
        for i in range(5):
            msg = SimpleNamespace(header=header(sec=i), name=["a"], position=[float(i)],
                                  velocity=[], effort=[])
            data = encode_cdr(JOINT_STATE_SCHEMA, "sensor_msgs/msg/JointState", msg)
            payloads.append(data)
            w.add_message(cid, log_time=i * 10**9, publish_time=i * 10**9, data=data)
        w.finish()

        r = McapReader(buf.getvalue())
        assert [c.topic for c in r.channels.values()] == ["/joint_states"]
        assert r.message_time_range == (0, 4 * 10**9)
        msgs = list(r.iter_messages())
        assert len(msgs) == 5
        for i, (ch, schema, m) in enumerate(msgs):
            assert ch.topic == "/joint_states"
            assert schema.name == "sensor_msgs/msg/JointState"
            assert m.data == payloads[i]
            out = decode_cdr(schema.data.decode(), schema.name, m.data)
            assert out.position == [float(i)]

    def test_statistics_present(self):
        buf = io.BytesIO()
        w = McapWriter(buf)
        w.start()
        sid = w.register_schema(name="x", encoding="ros2msg", data=b"int32 a")
        cid = w.register_channel(topic="/x", message_encoding="cdr", schema_id=sid)
        w.add_message(cid, log_time=7, publish_time=7, data=b"\x00\x01\x00\x00\x2a\x00\x00\x00")
        w.finish()
        r = McapReader(buf.getvalue())
        assert r.statistics.message_count == 1
        assert r.statistics.message_start_time == 7


TF_SCHEMA = """geometry_msgs/TransformStamped[] transforms
================================================================================
MSG: geometry_msgs/TransformStamped
std_msgs/Header header
string child_frame_id
geometry_msgs/Transform transform
================================================================================
MSG: geometry_msgs/Transform
geometry_msgs/Vector3 translation
geometry_msgs/Quaternion rotation
================================================================================
MSG: geometry_msgs/Vector3
float64 x
float64 y
float64 z
================================================================================
MSG: geometry_msgs/Quaternion
float64 x
float64 y
float64 z
float64 w
""" + HEADER_BLOCK


def synthesize_bitbots_bag(path, n_ticks=100, img_size=64, with_imu=True):
    """A format-real Bit-Bots rosbag: zstd chunks, CDR messages, embedded
    ros2msg schemas, the reference's 7 topics at realistic rates."""
    from soccerdiffusion_tpu.config import CANONICAL_JOINT_NAMES_22

    joints = list(CANONICAL_JOINT_NAMES_22)
    rng = np.random.default_rng(7)

    with open(path, "wb") as f:
        w = McapWriter(f, chunk_compression="zstd")
        w.start()

        def chan(topic, schema_name, schema_text):
            sid = w.register_schema(name=schema_name, encoding="ros2msg",
                                    data=schema_text.encode())
            return w.register_channel(topic=topic, message_encoding="cdr", schema_id=sid)

        c_js = chan("/joint_states", "sensor_msgs/msg/JointState", JOINT_STATE_SCHEMA)
        c_cmd = chan("/DynamixelController/command", "bitbots_msgs/msg/JointCommand",
                     JOINT_COMMAND_SCHEMA)
        c_img = chan("/camera/image_proc", "sensor_msgs/msg/Image", IMAGE_SCHEMA)
        c_gs = chan("/gamestate", "bitbots_msgs/msg/GameState", GAMESTATE_SCHEMA)
        # a channel's presence is what makes has_imu_data true downstream, so
        # only register the topic actually recorded (like a real bag)
        if with_imu:
            c_imu = chan("/imu/data", "sensor_msgs/msg/Imu", IMU_SCHEMA)
        else:
            c_tf = chan("/tf", "tf2_msgs/msg/TFMessage", TF_SCHEMA)

        t0 = 1_700_000_000 * 10**9
        for i in range(n_ticks):  # 100 Hz loop
            t = t0 + i * 10_000_000
            pos = (0.3 * np.sin(i / 25.0 + np.arange(22) * 0.1)).tolist()
            js = SimpleNamespace(header=header(sec=i), name=joints, position=pos,
                                 velocity=[], effort=[])
            w.add_message(c_js, t, t, encode_cdr(
                JOINT_STATE_SCHEMA, "sensor_msgs/msg/JointState", js))
            cmd = SimpleNamespace(header=header(sec=i), joint_names=joints,
                                  positions=(np.asarray(pos) + 0.01).tolist(),
                                  velocities=[], accelerations=[], max_currents=[])
            w.add_message(c_cmd, t + 1000, t + 1000, encode_cdr(
                JOINT_COMMAND_SCHEMA, "bitbots_msgs/msg/JointCommand", cmd))
            ang = 0.05 * np.sin(i / 10.0)
            quat = SimpleNamespace(x=float(np.sin(ang / 2)), y=0.0, z=0.0,
                                   w=float(np.cos(ang / 2)))
            if with_imu:
                imu = SimpleNamespace(
                    header=header(sec=i, frame="imu"), orientation=quat,
                    orientation_covariance=[0.0] * 9,
                    angular_velocity=SimpleNamespace(x=0.0, y=0.0, z=0.0),
                    angular_velocity_covariance=[0.0] * 9,
                    linear_acceleration=SimpleNamespace(x=0.0, y=0.0, z=9.8),
                    linear_acceleration_covariance=[0.0] * 9,
                )
                w.add_message(c_imu, t + 2000, t + 2000, encode_cdr(
                    IMU_SCHEMA, "sensor_msgs/msg/Imu", imu))
            else:
                tfm = SimpleNamespace(transforms=[SimpleNamespace(
                    header=header(sec=i, frame="base_link"),
                    child_frame_id="base_footprint",
                    transform=SimpleNamespace(
                        translation=SimpleNamespace(x=0.0, y=0.0, z=0.4),
                        rotation=quat,
                    ),
                )])
                w.add_message(c_tf, t + 2000, t + 2000, encode_cdr(
                    TF_SCHEMA, "tf2_msgs/msg/TFMessage", tfm))
            if i % 10 == 0:  # 10 Hz camera
                img = rng.integers(0, 255, (img_size, img_size, 3), dtype=np.uint8)
                msg = SimpleNamespace(header=header(sec=i, frame="camera"),
                                      height=img_size, width=img_size, encoding="rgb8",
                                      is_bigendian=0, step=img_size * 3,
                                      data=img.tobytes())
                w.add_message(c_img, t + 3000, t + 3000, encode_cdr(
                    IMAGE_SCHEMA, "sensor_msgs/msg/Image", msg))
            if i % 50 == 0:  # occasional game state
                gs = SimpleNamespace(header=header(sec=i), game_state=3,
                                     secondary_state=0, first_half=True, own_score=1,
                                     rival_score=0, penalized=False,
                                     seconds_till_unpenalized=0, team_color=1)
                w.add_message(c_gs, t + 4000, t + 4000, encode_cdr(
                    GAMESTATE_SCHEMA, "bitbots_msgs/msg/GameState", gs))
        w.finish()


class TestEndToEndImport:
    @pytest.mark.parametrize("with_imu", [True, False])
    def test_cli_import_bitbots_bag(self, tmp_path, with_imu):
        """Full pipeline: format-real .mcap -> CLI import -> SQLite rows
        (the reference CI's dataset test, test-dataset.yml:42-58)."""
        from soccerdiffusion_tpu.cli import main
        from soccerdiffusion_tpu.data.schema import connect

        bag = tmp_path / "game.mcap"
        synthesize_bitbots_bag(bag, n_ticks=100, with_imu=with_imu)
        db = str(tmp_path / "db.sqlite3")
        rc = main(["import", "bit-bots", str(bag), "TestLab", "--db", db])
        assert rc == 0

        conn = connect(db)
        (n_rec,) = conn.execute("SELECT COUNT(*) FROM Recording").fetchone()
        (n_cmd,) = conn.execute("SELECT COUNT(*) FROM JointCommands").fetchone()
        (n_js,) = conn.execute("SELECT COUNT(*) FROM JointStates").fetchone()
        (n_rot,) = conn.execute("SELECT COUNT(*) FROM Rotation").fetchone()
        (n_img,) = conn.execute("SELECT COUNT(*) FROM Image").fetchone()
        (n_gs,) = conn.execute("SELECT COUNT(*) FROM GameState").fetchone()
        assert n_rec == 1
        # ~1 s of synced 50 Hz data after the first complete sample
        assert n_cmd > 30 and n_js == n_cmd and n_rot == n_cmd
        assert n_img >= 5  # 10 Hz camera, capped by MaxRateResampler
        assert n_gs >= 1
        row = conn.execute(
            "SELECT team_color, img_width, img_height FROM Recording"
        ).fetchone()
        assert row[0] == "RED"  # team_color=1
        assert (row[1], row[2]) == (480, 480)
        # images were resized to the canonical 480x480 RGB blobs
        (blob,) = conn.execute("SELECT data FROM Image LIMIT 1").fetchone()
        assert len(blob) == 480 * 480 * 3

    def test_import_rejects_truncated_bag(self, tmp_path):
        """Reference CI also asserts imports FAIL on bad data
        (test-dataset.yml:42-49)."""
        from soccerdiffusion_tpu.cli import main

        bag = tmp_path / "bad.mcap"
        synthesize_bitbots_bag(bag, n_ticks=40)
        data = bag.read_bytes()
        bag.write_bytes(data[: len(data) // 2])  # corrupt: cut mid-file
        db = str(tmp_path / "db.sqlite3")
        rc = main(["import", "bit-bots", str(bag), "TestLab", "--db", db])
        assert rc == 1
