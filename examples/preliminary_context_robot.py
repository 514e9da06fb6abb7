"""Tiny-tier example: action-history-conditioned diffusion on ROBOT rows.

Counterpart of the reference's preliminary context-robot pair
(reference ml/preliminary/train_diffusion_context_transformer_robot.py +
run_diffusion_context_transformer_robot.py, SURVEY.md §2.8): a small
history-only trajectory diffusion model trained on real recorded rows from
a dataset DB (not synthetic waves — that archetype is
examples/sine_diffusion_toy.py), with EMA parameter averaging, then rolled
out open-loop and plotted against ground truth. Train and run live in one
script, selected by ``--run`` (the reference splits them into two files).

  JAX_PLATFORMS=cpu python examples/preliminary_context_robot.py [--db X]

Without ``--db`` a throwaway DB is synthesized via the dummy-data CLI
(the reference's fetch_data.py step, fetched locally instead).
"""

import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.data import Normalizer, WindowedDataset
from soccerdiffusion_tpu.diffusion import ddim_sample, make_schedule
from soccerdiffusion_tpu.models import DiffusionPolicy
from soccerdiffusion_tpu.training import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

CFG = ModelConfig(
    # history-only conditioning: every other modality off (the preliminary
    # model conditions on past actions + the step token alone)
    num_joints=20, hidden_dim=64, trajectory_prediction_length=10,
    action_context_length=60, use_imu=False, use_joint_states=False,
    use_images=False, use_gamestate=False,
    num_action_history_encoder_layers=2, num_decoder_layers=2,
)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--db", type=str, default=None,
                        help="dataset DB (default: synthesize dummy data)")
    parser.add_argument("--csv", type=str, default=None,
                        help="train from a fetch_data.py CSV instead of a "
                             "DB (the reference's preliminary input format, "
                             "ml/preliminary/train_diffusion_context_"
                             "transformer_robot.py:52-60): timestamp_ns + "
                             "one column per joint")
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--run", action="store_true",
                        help="skip training; sample/plot only (loads the "
                             "params saved by a previous train invocation)")
    parser.add_argument("--out", type=str, default="plots/preliminary_context_robot.png")
    args = parser.parse_args()

    global CFG
    if args.csv is not None:
        # fetch_data.py CSV -> a single-recording WindowedDataset; the
        # joint count comes from the CSV columns (the reference's leg-only
        # CSVs carry 12 joints, not the canonical 20)
        import csv as csv_mod
        import dataclasses

        from soccerdiffusion_tpu.data.dataset import RecordingArrays

        with open(args.csv, newline="") as f:
            reader = csv_mod.DictReader(f)
            joints = [c for c in reader.fieldnames if c != "timestamp_ns"]
            rows = np.array([[float(r[j]) for j in joints] for r in reader],
                            dtype=np.float32)
        CFG = dataclasses.replace(CFG, num_joints=len(joints))
        rec = RecordingArrays(
            joint_commands=rows, joint_states=rows.copy(),
            rotations=np.tile(np.array([0, 0, 0, 1], np.float32),
                              (len(rows), 1)),
            game_states=np.zeros((1,), np.int32),
            game_state_stamps=np.zeros((1,), np.float32),
            image_stamps=np.zeros((0,), np.float32), images=None)
        ds = WindowedDataset([rec], CFG)
        print(f"{len(ds)} windows x {len(joints)} joints from {args.csv}")
    else:
        db = args.db
        if db is None:
            from soccerdiffusion_tpu.cli import main as cli

            db = str(Path(tempfile.mkdtemp()) / "prelim.sqlite3")
            cli(["db", "create-schema", "--db", db])
            cli(["db", "dummy-data", "-n", "2", "-s", "1200", "-i", "50",
                 "--db", db])

        ds = WindowedDataset.from_sqlite(db, CFG)
        print(f"{len(ds)} windows from {db}")
    norm = Normalizer.fit(ds.sample_targets(500))
    model = DiffusionPolicy(CFG)
    sched = make_schedule(100)
    opt = make_optimizer(1e-3, total_steps=args.steps)

    batch = next(ds.batches(32, shuffle=False))
    state = create_train_state(model, jax.device_put(batch), opt,
                               jax.random.key(0), 10, CFG.num_joints,
                               ema=True)  # EMA as the reference uses ema_pytorch
    ckpt = Path(tempfile.gettempdir()) / "prelim_context_robot.ckpt"
    if args.run:
        from soccerdiffusion_tpu.training.checkpoint import load_checkpoint

        state = load_checkpoint(str(ckpt), state_template=state)["state"]
    else:
        step = make_train_step(model, sched, opt, norm, donate=False,
                               ema_decay=0.99)
        t0, losses, n = time.time(), [], 0
        while n < args.steps:
            for b in ds.batches(32, shuffle=True, seed=n):
                state, m = step(state, jax.device_put(b), 0)
                losses.append(float(m["loss"]))
                n += 1
                if n >= args.steps:
                    break
        print(f"train: {n} steps in {time.time()-t0:.1f}s; "
              f"loss {losses[0]:.3f} -> {np.mean(losses[-10:]):.3f}")
        if not np.mean(losses[-10:]) < 0.8 * losses[0]:
            print("FAIL: loss did not decrease")
            return 1
        from soccerdiffusion_tpu.training.checkpoint import save_checkpoint

        save_checkpoint(str(ckpt), state, norm, {"preliminary": True}, 0)

    # open-loop: EMA weights (the reference samples the EMA model)
    params = state.ema_params if getattr(state, "ema_params", None) is not None \
        else state.params
    variables = {"params": params}
    idx = np.linspace(0, len(ds) - 1, 4).astype(int)
    items = [ds[int(i)] for i in idx]
    eval_batch = {k: jnp.asarray(np.stack([it[k] for it in items]))
                  for k in items[0]}
    context = model.apply(variables, eval_batch, False,
                          method=model.encode_context)
    noise = jax.random.normal(jax.random.key(1), (4, 10, CFG.num_joints))

    def denoise_fn(x, t):
        return model.apply(variables, context, x,
                           jnp.full((4,), t, jnp.int32), method=model.denoise)

    traj = norm.denormalize(ddim_sample(sched, denoise_fn, noise, 30))
    gt = np.stack([it["joint_command"] for it in items])
    mse = float(np.mean((np.asarray(traj) - gt) ** 2))
    print(f"open-loop MSE over 4 windows: {mse:.4f} "
          f"(pure-noise floor ~{2 * float(np.asarray(norm.std).mean())**2:.3f})")

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(10, 6), sharex=True)
    for ax, tr, g in zip(axes.ravel(), np.asarray(traj), gt):
        for j in range(0, CFG.num_joints, 5):
            ax.plot(g[:, j], "k-", lw=1)
            ax.plot(tr[:, j], "--", lw=1)
    fig.suptitle("preliminary context-robot: sampled (dashed) vs recorded")
    fig.savefig(out, dpi=100)
    print(f"wrote {out}")
    return 0 if np.isfinite(np.asarray(traj)).all() else 1


if __name__ == "__main__":
    raise SystemExit(main())
