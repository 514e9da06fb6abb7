"""Data layer tests: schema round trip, dummy backend, window/pad semantics
(reference dataset/pytorch.py:145-293), normalizer."""

import numpy as np
import pytest

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.data import (
    Normalizer,
    RobotState,
    WindowedDataset,
    connect,
    create_schema,
    generate_dummy_arrays,
    insert_dummy_data,
)

CFG = ModelConfig(
    num_joints=20,
    hidden_dim=32,
    trajectory_prediction_length=10,
    action_context_length=50,
    joint_state_context_length=50,
    imu_context_length=50,
    image_context_length=4,
    image_resolution=64,
    use_images=False,
)


class TestSchema:
    def test_robot_state_int_is_sorted_index(self):
        # reference models.py:22-25: index into alphabetically sorted values.
        assert int(RobotState.PLAYING) == 0
        assert int(RobotState.POSITIONING) == 1
        assert int(RobotState.STOPPED) == 2
        assert int(RobotState.UNKNOWN) == 3

    def test_create_and_fill(self, tmp_path):
        db = tmp_path / "db.sqlite3"
        conn = connect(db)
        create_schema(conn)
        ids = insert_dummy_data(conn, 2, 120, 10, image_size=32)
        assert len(ids) == 2
        n = conn.execute("SELECT COUNT(*) FROM JointCommands").fetchone()[0]
        assert n == 240
        conn.close()

    def test_joint_angle_check_constraint(self, tmp_path):
        import sqlite3

        db = tmp_path / "db.sqlite3"
        conn = connect(db)
        create_schema(conn)
        conn.execute(
            "INSERT INTO Recording (original_file, team_name, robot_type,"
            " img_width_scaling, img_height_scaling) VALUES ('f','t','r',1,1)"
        )
        with pytest.raises(sqlite3.IntegrityError):
            conn.execute(
                'INSERT INTO JointCommands (stamp, recording_id, "HeadPan") VALUES (0, 1, -0.5)'
            )


class TestWindowedDataset:
    def make(self, n=200, **cfg_overrides):
        cfg = ModelConfig(**{**CFG.__dict__, **cfg_overrides}) if cfg_overrides else CFG
        dummy = generate_dummy_arrays(2, n, num_joints=20, with_images=cfg.use_images,
                                      image_size=cfg.image_resolution)
        return WindowedDataset.from_dummy(dummy, cfg), cfg

    def test_len_matches_reference_formula(self):
        ds, _ = self.make(200)
        # (200 - 10) / 1 per recording, 2 recordings
        assert len(ds) == 380

    def test_target_shape_and_values(self):
        ds, cfg = self.make(200)
        item = ds[0]
        assert item["joint_command"].shape == (10, 20)
        np.testing.assert_array_equal(
            item["joint_command"], ds.recordings[0].joint_commands[:10]
        )

    def test_history_zero_padded_at_start(self):
        ds, _ = self.make(200)
        item = ds[5]  # only 5 samples of history available
        hist = item["joint_command_history"]
        assert hist.shape == (50, 20)
        assert np.all(hist[:45] == 0)
        np.testing.assert_array_equal(hist[45:], ds.recordings[0].joint_commands[:5])

    def test_imu_identity_quat_padding(self):
        ds, _ = self.make(200)
        rot = ds[3]["rotation"]
        assert rot.shape == (50, 4)
        np.testing.assert_array_equal(rot[0], [0.0, 0.0, 0.0, 1.0])
        np.testing.assert_array_equal(rot[:47], np.tile([0, 0, 0, 1.0], (47, 1)))

    def test_five_dim_imu(self):
        ds, _ = self.make(200, imu_orientation_embedding_method="five_dim")
        rot = ds[3]["rotation"]
        assert rot.shape == (50, 5)
        # identity-quat padding converts to x-axis, angle 0 -> sin 0 cos 1
        np.testing.assert_allclose(rot[0], [1, 0, 0, 0, 1], atol=1e-6)

    def test_second_recording_indexing(self):
        ds, _ = self.make(200)
        item = ds[190]  # first sample of recording 1
        np.testing.assert_array_equal(
            item["joint_command"], ds.recordings[1].joint_commands[:10]
        )

    def test_game_state_last_at_or_before(self):
        ds, _ = self.make(200)
        item = ds[100]
        assert item["game_state"] == ds.recordings[0].game_states[100]

    def test_image_window_left_pad(self):
        ds, cfg = self.make(200, use_images=True)
        item = ds[0]  # stamp 0 -> only the t=0 frame available
        imgs = item["image_data"]
        assert imgs.shape == (4, 64, 64, 3)
        assert np.all(imgs[:3] == 0)
        assert np.any(imgs[3] != 0)
        # later sample has a full window
        full = ds[150]["image_data"]
        assert np.all(np.any(full.reshape(4, -1) != 0, axis=1))

    def test_batches_stack(self):
        ds, _ = self.make(200)
        batch = next(ds.batches(8, shuffle=True, seed=1))
        assert batch["joint_command"].shape == (8, 10, 20)
        assert batch["joint_command_history"].shape == (8, 50, 20)
        assert batch["game_state"].shape == (8,)

    def test_sqlite_roundtrip_matches_dummy(self, tmp_path):
        db = tmp_path / "db.sqlite3"
        conn = connect(db)
        create_schema(conn)
        insert_dummy_data(conn, 1, 150, 10, image_size=32)
        conn.close()
        ds = WindowedDataset.from_sqlite(db, CFG)
        assert len(ds) == 140
        item = ds[20]
        assert item["joint_command"].shape == (10, 20)
        assert np.all(item["joint_command"] >= 0) and np.all(item["joint_command"] < 2 * np.pi)


class TestNormalizer:
    def test_fit_normalize_roundtrip(self, rng):
        data = rng.standard_normal((100, 6)).astype(np.float32) * 3 + 1
        norm = Normalizer.fit(data)
        z = np.asarray(norm.normalize(data))
        np.testing.assert_allclose(z.mean(0), 0, atol=1e-5)
        np.testing.assert_allclose(z.std(0, ddof=1), 1, atol=1e-4)
        np.testing.assert_allclose(np.asarray(norm.denormalize(z)), data, rtol=1e-4, atol=1e-4)

    def test_constant_joint_raises(self):
        data = np.ones((50, 3), dtype=np.float32)
        with pytest.raises(ValueError, match="std is zero"):
            Normalizer.fit(data)

    def test_matches_torch_std_semantics(self, rng):
        import torch

        data = rng.standard_normal((64, 4)).astype(np.float32)
        norm = Normalizer.fit(data)
        tstd = torch.tensor(data).std(dim=0).numpy()
        np.testing.assert_allclose(np.asarray(norm.std), tstd, rtol=1e-5)


class TestMigrations:
    def _make_v1_db(self, path):
        """A base-revision DB as the reference's first migration made it:
        20-joint tables, no elbow yaw, no version stamp."""
        import sqlite3

        from soccerdiffusion_tpu.config import CANONICAL_JOINT_NAMES_20

        conn = sqlite3.connect(path)
        cols = ", ".join(f'"{n}" FLOAT DEFAULT 0.0' for n in CANONICAL_JOINT_NAMES_20)
        for table in ("JointStates", "JointCommands"):
            conn.execute(
                f"CREATE TABLE {table} (_id INTEGER PRIMARY KEY, stamp FLOAT,"
                f" recording_id INTEGER, {cols})"
            )
        conn.execute(
            'INSERT INTO JointStates (stamp, recording_id, "HeadPan") VALUES (0, 1, 1.5)'
        )
        conn.commit()
        return conn

    def test_fresh_db_stamped_latest(self, tmp_path):
        from soccerdiffusion_tpu.data.migrations import LATEST_VERSION, schema_version

        conn = connect(tmp_path / "db.sqlite3")
        create_schema(conn)
        assert schema_version(conn) == LATEST_VERSION

    def test_v1_inferred_and_migrated(self, tmp_path):
        from soccerdiffusion_tpu.data.migrations import migrate, schema_version

        conn = self._make_v1_db(tmp_path / "old.sqlite3")
        assert schema_version(conn) == 1
        assert migrate(conn) == 2
        cols = {r[1] for r in conn.execute("PRAGMA table_info(JointCommands)")}
        assert {"RElbowYaw", "LElbowYaw"} <= cols
        # existing rows get the 0.0 default
        val = conn.execute('SELECT "RElbowYaw" FROM JointStates').fetchone()[0]
        assert val == 0.0

    def test_migrate_idempotent(self, tmp_path):
        from soccerdiffusion_tpu.data.migrations import migrate

        conn = self._make_v1_db(tmp_path / "old.sqlite3")
        assert migrate(conn) == 2
        assert migrate(conn) == 2

    def test_migrate_without_schema_raises(self, tmp_path):
        import sqlite3

        from soccerdiffusion_tpu.data.migrations import migrate

        conn = sqlite3.connect(tmp_path / "empty.sqlite3")
        with pytest.raises(ValueError, match="no schema"):
            migrate(conn)
