"""Dataset visualization — counterpart of the reference's
``dataset/vizualization.ipynb``: plot joint commands/states, IMU
orientation, game state, and sample images for one recording of a dataset
DB (or the dummy backend).

  python examples/visualize_dataset.py [--db db.sqlite3] [--dummy] [-o viz/]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from soccerdiffusion_tpu.config import CANONICAL_JOINT_NAMES_20, ModelConfig
from soccerdiffusion_tpu.data import WindowedDataset, generate_dummy_arrays


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--db", type=str, default=None)
    parser.add_argument("--dummy", action="store_true")
    parser.add_argument("--recording", type=int, default=0)
    parser.add_argument("--output", "-o", type=str, default="viz")
    args = parser.parse_args(argv)

    cfg = ModelConfig(use_images=args.dummy is False)
    if args.dummy:
        ds = WindowedDataset.from_dummy(
            generate_dummy_arrays(1, 1000, with_images=True, image_step=50), cfg
        )
    else:
        assert args.db, "--db or --dummy required"
        ds = WindowedDataset.from_sqlite(args.db, cfg)
    rec = ds.recordings[args.recording]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    t = np.arange(len(rec.joint_commands)) / 100

    fig, axes = plt.subplots(4, 1, figsize=(14, 12), sharex=True)
    for j in range(min(6, rec.joint_commands.shape[1])):
        axes[0].plot(t, rec.joint_commands[:, j], label=CANONICAL_JOINT_NAMES_20[j], lw=0.8)
        axes[1].plot(t, rec.joint_states[:, j], lw=0.8)
    axes[0].set_title("joint commands [0, 2π)")
    axes[0].legend(fontsize=6, ncol=6)
    axes[1].set_title("joint states [0, 2π)")
    for k, name in enumerate("xyzw"):
        axes[2].plot(t[: len(rec.rotations)], rec.rotations[:, k], label=name, lw=0.8)
    axes[2].set_title("IMU quaternion")
    axes[2].legend(fontsize=8)
    axes[3].step(rec.game_state_stamps, rec.game_states, where="post")
    axes[3].set_title("game state (sorted-enum index)")
    axes[3].set_xlabel("time [s]")
    fig.tight_layout()
    fig.savefig(out / "recording_timeseries.png", dpi=110)
    plt.close(fig)

    if rec.images is not None and len(rec.images):
        n = min(8, len(rec.images))
        fig, axes = plt.subplots(1, n, figsize=(2 * n, 2.4))
        for i in range(n):
            ax = axes[i] if n > 1 else axes
            ax.imshow(rec.images[i * len(rec.images) // n])
            ax.set_title(f"t={rec.image_stamps[i * len(rec.images) // n]:.1f}s", fontsize=7)
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(out / "recording_images.png", dpi=110)
        plt.close(fig)

    print(f"wrote plots to {out}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
