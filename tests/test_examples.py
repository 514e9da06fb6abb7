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
]


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
