"""Smoke-run the preliminary-tier example scripts (SURVEY.md §2.8).

Counterpart of the reference's preliminary research scripts being runnable
(reference ml/preliminary/*, exercised manually there — here each CPU-tier
archetype is driven as a subprocess and must exit 0 on its own PASS
criterion). Whole module rides the slow tier (tests/conftest.py
SLOW_MODULES): each script trains a small model for tens of seconds.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

CASES = [
    # (script, extra args) — every archetype prints "... PASSED" and exits 0
    ("examples/sine_diffusion_toy.py", []),
    ("examples/ar_bin_baseline.py", []),
    ("examples/preliminary_context_robot.py", ["--steps", "150"]),
    ("examples/mlp_denoiser_multijoint.py", []),
    # rosbag -> CSV extractor against the committed fixture bag (the
    # reference's fetch_data.py step, ml/preliminary/fetch_data.py)
    ("examples/fetch_data.py",
     [str(REPO / "tests/fixtures/bitbots_synth.mcap"), "-o", "legs.csv"]),
]


def test_fetch_data_feeds_preliminary_training(tmp_path):
    """The reference's preliminary chain: fetch_data CSV -> context-robot
    training (ml/preliminary/fetch_data.py -> train_diffusion_context_
    transformer_robot.py). End-to-end: extract the fixture bag's 12 leg
    joints, then train the history-only model from that CSV."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", MPLBACKEND="Agg")
    csv_path = tmp_path / "legs.csv"
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples/fetch_data.py"),
         str(REPO / "tests/fixtures/bitbots_synth.mcap"), "-o", str(csv_path)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples/preliminary_context_robot.py"),
         "--csv", str(csv_path), "--steps", "120"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}")
    assert "12 joints" in proc.stdout


@pytest.mark.parametrize("script,args", CASES, ids=[c[0].split("/")[-1] for c in CASES])
def test_example_runs_and_passes(script, args, tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", MPLBACKEND="Agg")
    proc = subprocess.run(
        [sys.executable, str(REPO / script), *args],
        cwd=tmp_path,  # plots/checkpoints land in the tmp dir, not the repo
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (
        f"{script} failed (rc={proc.returncode})\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )
