"""Dataset-window plotting (data/plot.py + `cli db plot-window`): the
headless counterpart of the reference's dataset inspection demo
(reference dataset/pytorch.py:418-497)."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from soccerdiffusion_tpu.cli import main as cli_main
from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.data import WindowedDataset, generate_dummy_arrays
from soccerdiffusion_tpu.data.plot import plot_window


class TestPlotWindow:
    def test_writes_png_with_all_modalities(self, tmp_path):
        cfg = ModelConfig(
            num_joints=6, hidden_dim=32, trajectory_prediction_length=5,
            action_context_length=20, joint_state_context_length=20,
            imu_context_length=20, use_images=True, image_resolution=32,
            image_context_length=3, num_action_history_encoder_layers=1,
            num_decoder_layers=1)
        recs = generate_dummy_arrays(1, 300, num_joints=6, with_images=True,
                                     image_size=32, seed=3)
        ds = WindowedDataset.from_dummy(recs, cfg)
        out = plot_window(ds[len(ds) // 2], cfg, tmp_path / "w.png")
        assert out.exists() and out.stat().st_size > 10_000

    def test_proprio_only_window(self, tmp_path):
        cfg = ModelConfig(num_joints=4, trajectory_prediction_length=5,
                          action_context_length=10,
                          joint_state_context_length=10, imu_context_length=10,
                          use_images=False)
        recs = generate_dummy_arrays(1, 200, num_joints=4, seed=1)
        ds = WindowedDataset.from_dummy(recs, cfg)
        out = plot_window(ds[0], cfg, tmp_path / "p.png")
        assert out.exists() and out.stat().st_size > 5_000

    def test_cli_subcommand(self, tmp_path):
        out = tmp_path / "cli.png"
        rc = cli_main(["db", "plot-window", "0", str(out), "--dummy-data"])
        assert rc == 0
        assert out.exists() and out.stat().st_size > 5_000

    def test_cli_index_out_of_range(self, tmp_path):
        rc = cli_main(["db", "plot-window", "99999999",
                       str(tmp_path / "x.png"), "--dummy-data"])
        assert rc == 1
