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
