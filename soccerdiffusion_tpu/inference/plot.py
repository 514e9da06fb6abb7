"""Offline open-loop evaluation plots.

Counterpart of reference ml/inference/plot.py: load a checkpoint (the
hyperparams ride inside), sample dataset items, run the full DDIM sampler —
or the single distilled forward if the checkpoint carries
``distilled_decoder`` — and plot per joint: action-history context, the
initial noise, the denoised prediction, and the ground-truth target.

  python -m soccerdiffusion_tpu.inference.plot <ckpt_dir> [--steps 30]
      [--num-samples 5] [--dummy-data] [--db path] [-o out_dir]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu import logger
from soccerdiffusion_tpu.config import Config
from soccerdiffusion_tpu.diffusion import make_schedule
from soccerdiffusion_tpu.models import DiffusionPolicy
from soccerdiffusion_tpu.training.checkpoint import load_policy_checkpoint


def sample_open_loop(model, variables, normalizer, schedule, batch, steps,
                     distilled, rng, guidance_scale: float = 1.0,
                     guidance_null: tuple[str, ...] = ("image",)):
    """Returns (denoised, initial_noise) in the denormalized joint domain.

    ``guidance_scale`` != 1 plots classifier-free-guided samples
    (evaluation/openloop.py sample_trajectories semantics; iterative
    samplers only)."""
    from soccerdiffusion_tpu.evaluation.openloop import sample_trajectories

    bsz = batch["joint_command"].shape[0]
    shape = (bsz, model.config.trajectory_prediction_length, model.config.num_joints)
    noise = jax.random.normal(rng, shape, dtype=jnp.float32)
    context = model.apply(variables, batch, False, method=model.encode_context)
    uncond = None
    if guidance_scale != 1.0 and not distilled:
        from soccerdiffusion_tpu.data.pipeline import null_modalities

        uncond = model.apply(variables, null_modalities(batch, guidance_null),
                             False, method=model.encode_context)
    traj = sample_trajectories(model, variables, schedule, context, noise,
                               steps, distilled, uncond_context=uncond,
                               guidance_scale=guidance_scale)
    return normalizer.denormalize(traj), normalizer.denormalize(noise)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Plot open-loop samples")
    parser.add_argument("checkpoint", type=str)
    parser.add_argument("--steps", type=int, default=None,
                        help="sampler steps (default: the checkpoint's own "
                             "operating point via load_policy_checkpoint)")
    parser.add_argument("--num-samples", type=int, default=5)
    parser.add_argument("--dummy-data", action="store_true")
    parser.add_argument("--db", type=str, default=None)
    parser.add_argument("--output", "-o", type=str, default="plots")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--guidance", type=str, default=None,
                        metavar="SCALE[@MODALITY,...]",
                        help="classifier-free guidance, e.g. '2.0@image' "
                             "(iterative samplers only; meaningful on "
                             "modality_dropout-trained checkpoints)")
    args = parser.parse_args(argv)
    g_scale, g_null = 1.0, ("image",)
    if args.guidance:
        from soccerdiffusion_tpu.data.pipeline import parse_guidance_spec

        try:
            g_scale, g_null = parse_guidance_spec(args.guidance)
        except ValueError as e:
            parser.error(str(e))

    # shared decode: the step count plotted is the one served/evaluated
    # (training/checkpoint.py:load_policy_checkpoint)
    params, variables, normalizer, ckpt_steps, distilled = (
        load_policy_checkpoint(args.checkpoint))
    if g_scale != 1.0 and distilled:
        # consistent with serve (raises) / report (warns): never render
        # silently-unguided plots for a guided request
        parser.error("--guidance requires an iterative sampler; "
                     f"{args.checkpoint} is a distilled checkpoint whose "
                     "single forward is not a score prediction")
    config = Config.from_dict(params)
    if args.steps is None:
        args.steps = ckpt_steps

    model = DiffusionPolicy(config.model)
    schedule = make_schedule(config.train.train_denoising_timesteps)

    from soccerdiffusion_tpu.training.train import build_dataset

    dataset = build_dataset(args, config)
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rng = np.random.default_rng(args.seed)
    pred_len = config.model.trajectory_prediction_length
    for s in range(args.num_samples):
        idx = int(rng.integers(len(dataset)))
        item = dataset[idx]
        batch = {k: jnp.asarray(v)[None] for k, v in item.items()}
        traj, noisy = sample_open_loop(
            model, variables, normalizer, schedule, batch, args.steps, distilled,
            jax.random.key(args.seed + s),
            guidance_scale=g_scale, guidance_null=g_null,
        )
        traj, noisy = np.asarray(traj)[0], np.asarray(noisy)[0]
        target = item["joint_command"]
        history = item.get("joint_command_history")

        n = config.model.num_joints
        ncols = 4
        nrows = -(-n // ncols)
        fig, axes = plt.subplots(nrows, ncols, figsize=(16, 3 * nrows), squeeze=False)
        hist_len = len(history) if history is not None else 0
        t_hist = np.arange(-hist_len, 0)
        t_pred = np.arange(pred_len)
        for j in range(n):
            ax = axes[j // ncols][j % ncols]
            if history is not None:
                ax.plot(t_hist, history[:, j], label="context", color="gray")
            ax.plot(t_pred, noisy[:, j], label="noisy", color="orange", alpha=0.5)
            ax.plot(t_pred, traj[:, j], label="denoised", color="tab:blue")
            ax.plot(t_pred, target[:, j], label="target", color="tab:green")
            ax.set_title(config.model.joint_names[j], fontsize=8)
        axes[0][0].legend(fontsize=6)
        fig.tight_layout()
        path = out_dir / f"sample_{s}.png"
        fig.savefig(path, dpi=100)
        plt.close(fig)
        logger.info(f"wrote {path}")


if __name__ == "__main__":
    main()
