"""PackedDataset (native C++ assembler) vs WindowedDataset equality."""

import numpy as np
import pytest

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.data import WindowedDataset, generate_dummy_arrays
from soccerdiffusion_tpu.data.packed import PackedDataset
from soccerdiffusion_tpu.native import native_available

CFG = ModelConfig(
    num_joints=20, hidden_dim=32, trajectory_prediction_length=10,
    action_context_length=50, joint_state_context_length=40, imu_context_length=30,
    use_images=False,
)


def make_pair(cfg=CFG, n=300):
    dummy = generate_dummy_arrays(2, n, num_joints=20)
    ds = WindowedDataset.from_dummy(dummy, cfg)
    return ds, PackedDataset.from_windowed(ds)


class TestPackedDataset:
    def test_native_library_builds(self):
        assert native_available(), "g++ toolchain should be present in this image"

    def test_len_matches(self):
        ds, packed = make_pair()
        assert len(ds) == len(packed)

    @pytest.mark.parametrize("idx", [0, 3, 55, 289, 290, 450])
    def test_single_sample_equality(self, idx):
        ds, packed = make_pair()
        want = ds[idx]
        got = packed.assemble(np.array([idx]))
        np.testing.assert_array_equal(got["joint_command"][0], want["joint_command"])
        np.testing.assert_array_equal(
            got["joint_command_history"][0], want["joint_command_history"]
        )
        np.testing.assert_array_equal(got["joint_state"][0], want["joint_state"])
        np.testing.assert_array_equal(got["rotation"][0], want["rotation"])
        assert got["game_state"][0] == want["game_state"]

    def test_batch_equality_vs_windowed(self):
        ds, packed = make_pair()
        b_py = next(ds.batches(32, shuffle=True, seed=5))
        b_native = next(packed.batches(32, shuffle=True, seed=5))
        for k in b_py:
            np.testing.assert_array_equal(b_native[k], b_py[k], err_msg=k)

    def test_five_dim_packed_at_pack_time(self):
        cfg = ModelConfig(**{**CFG.__dict__, "imu_orientation_embedding_method": "five_dim"})
        ds, packed = make_pair(cfg)
        assert packed.rot_dim == 5
        want = ds[7]["rotation"]
        got = packed.assemble(np.array([7]))["rotation"][0]
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_native_matches_numpy_fallback(self):
        ds, packed = make_pair()
        idx = np.array([0, 17, 100, 379])
        native = packed.assemble(idx)
        packed._lib = None  # force the numpy path
        fallback = packed.assemble(idx)
        for k in native:
            np.testing.assert_array_equal(native[k], fallback[k], err_msg=k)

    def test_save_load_roundtrip(self, tmp_path):
        ds, packed = make_pair()
        packed.save(tmp_path / "pack")
        loaded = PackedDataset.load(tmp_path / "pack", CFG)
        assert len(loaded) == len(packed)
        idx = np.array([5, 50])
        a, b = packed.assemble(idx), loaded.assemble(idx)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    def test_sample_targets_shape(self):
        _, packed = make_pair()
        t = packed.sample_targets(20)
        assert t.shape == (200, 20)


IMG_CFG = ModelConfig(
    num_joints=20, hidden_dim=32, trajectory_prediction_length=10,
    action_context_length=50, joint_state_context_length=40, imu_context_length=30,
    use_images=True, image_encoder_type="vit", image_context_length=4,
    image_resolution=32,
)


def make_image_pair(n=300):
    dummy = generate_dummy_arrays(2, n, num_joints=20, with_images=True,
                                  image_size=32, image_step=10)
    ds = WindowedDataset.from_dummy(dummy, IMG_CFG)
    return ds, PackedDataset.from_windowed(ds)


class TestPackedImages:
    def test_image_window_equality_vs_windowed(self):
        """Normalized packed uint8 windows == the float path, incl. padding."""
        from soccerdiffusion_tpu.data.pipeline import device_normalize_images

        ds, packed = make_image_pair()
        idx = np.array([0, 5, 120, len(ds) - 1])
        got = packed.assemble(idx)
        assert got["image_u8"].dtype == np.uint8
        normed = np.asarray(device_normalize_images(got["image_u8"], got["image_valid"]))
        for row, i in enumerate(idx):
            want = ds[int(i)]
            np.testing.assert_allclose(normed[row], want["image_data"],
                                       atol=1e-5, err_msg=f"idx {i}")
            np.testing.assert_allclose(got["image_stamps"][row], want["image_stamps"])

    def test_save_load_mmap_roundtrip_with_images(self, tmp_path):
        ds, packed = make_image_pair()
        packed.save(tmp_path / "packed")
        loaded = PackedDataset.load(tmp_path / "packed", IMG_CFG)
        # mmap'd shard: windows stream from disk, not RAM
        assert isinstance(loaded.images, np.memmap)
        idx = np.array([3, 77])
        a, b = packed.assemble(idx), loaded.assemble(idx)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    def test_train_step_on_packed_image_batch(self):
        """The jitted step normalizes uint8 batches in-graph."""
        import jax

        from soccerdiffusion_tpu.data import Normalizer
        from soccerdiffusion_tpu.diffusion import make_schedule
        from soccerdiffusion_tpu.models import DiffusionPolicy
        from soccerdiffusion_tpu.training.trainer import (
            create_train_state, make_optimizer, make_train_step,
        )

        cfg = ModelConfig(**{**IMG_CFG.__dict__, "hidden_dim": 16,
                             "num_decoder_layers": 1,
                             "num_action_history_encoder_layers": 1,
                             "num_imu_encoder_layers": 1,
                             "joint_state_encoder_layers": 1})
        ds, packed = make_image_pair(n=150)
        batch = next(packed.batches(4, shuffle=False))
        model = DiffusionPolicy(cfg)
        schedule = make_schedule(20)
        opt = make_optimizer(1e-4, 10)
        from soccerdiffusion_tpu.data.pipeline import prepare_batch

        state = create_train_state(
            model, prepare_batch(jax.device_put(batch)), opt, jax.random.key(0),
            cfg.trajectory_prediction_length, cfg.num_joints,
        )
        step = make_train_step(model, schedule, opt, Normalizer.identity(20), donate=False)
        state, metrics = step(state, batch, 0)
        assert np.isfinite(float(metrics["loss"]))


class TestStreamingImages:
    def test_from_sqlite_streams_blobs_lazily(self, tmp_path):
        from soccerdiffusion_tpu.data.dataset import SqliteImageStore
        from soccerdiffusion_tpu.data.dummy import insert_dummy_data
        from soccerdiffusion_tpu.data.schema import connect, create_schema

        db = str(tmp_path / "d.sqlite3")
        conn = connect(db)
        create_schema(conn)
        insert_dummy_data(conn, num_recordings=1, num_samples_per_rec=200,
                          image_step=10, image_size=64)
        conn.commit()
        conn.execute("PRAGMA wal_checkpoint(TRUNCATE)")  # immutable readers skip the WAL
        conn.close()

        ds = WindowedDataset.from_sqlite(db, IMG_CFG)
        rec = ds.recordings[0]
        assert isinstance(rec.images, SqliteImageStore)
        assert rec.images.fetch_count == 0  # nothing decoded at load time
        item = ds[len(ds) - 1]
        assert item["image_data"].shape == (4, 32, 32, 3)
        assert 0 < rec.images.fetch_count <= IMG_CFG.image_context_length
        # eager mode still matches the streamed data
        ds_eager = WindowedDataset.from_sqlite(db, IMG_CFG, stream_images=False)
        np.testing.assert_array_equal(
            ds_eager[len(ds) - 1]["image_data"], item["image_data"])


class TestPrepatchified:
    def test_prepatchify_matches_whole_frame_path(self):
        """Pre-patchified shards produce bit-identical normalized windows."""
        from soccerdiffusion_tpu.data.pipeline import (
            device_normalize_images, patchify_frames)

        _, packed = make_image_pair()
        idx = np.array([0, 5, 120])
        whole = packed.assemble(idx)
        p = IMG_CFG.vit_patch_size
        packed.prepatchify_images(p)
        assert packed.images.ndim == 3  # (N, patches, P*P*3)
        pre = packed.assemble(idx)
        assert pre["image_u8"].shape[-1] == p * p * 3
        np.testing.assert_array_equal(
            pre["image_u8"], patchify_frames(whole["image_u8"], p))
        np.testing.assert_array_equal(pre["image_valid"], whole["image_valid"])
        # normalization handles the patch layout and matches exactly
        a = np.asarray(device_normalize_images(whole["image_u8"], whole["image_valid"]))
        b = np.asarray(device_normalize_images(pre["image_u8"], pre["image_valid"]))
        np.testing.assert_allclose(patchify_frames(a, p), b, atol=1e-6)

    def test_prepatchify_idempotent(self):
        _, packed = make_image_pair()
        packed.prepatchify_images(IMG_CFG.vit_patch_size)
        shape = packed.images.shape
        packed.prepatchify_images(IMG_CFG.vit_patch_size)  # no-op
        assert packed.images.shape == shape


class TestPatchifyFrames:
    def test_matches_manual_loop(self):
        from soccerdiffusion_tpu.data.pipeline import patchify_frames

        rng = np.random.default_rng(0)
        x = rng.integers(0, 255, (2, 3, 8, 8, 3), dtype=np.uint8)
        got = patchify_frames(x, 4)
        assert got.shape == (2, 3, 4, 4 * 4 * 3)
        # manual patch extraction for one (frame, patch) pair
        b, t, pi = 1, 2, 3  # patch index 3 = (row 1, col 1)
        want = x[b, t, 4:8, 4:8, :].reshape(-1)
        np.testing.assert_array_equal(got[b, t, pi], want)

    def test_single_image_rank3(self):
        from soccerdiffusion_tpu.data.pipeline import patchify_frames

        x = np.arange(2 * 2 * 3, dtype=np.float32).reshape(2, 2, 3)
        got = patchify_frames(x, 2)
        assert got.shape == (1, 12)
        np.testing.assert_array_equal(got[0], x.reshape(-1))
