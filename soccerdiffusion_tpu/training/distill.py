"""Sampler distillation: 30-step DDIM teacher -> few-step (1..K) student.

Counterpart of reference ml/training/distill.py:120-224, as one jitted step:

  * teacher and student start from the same checkpoint (distill.py:127-142)
  * per batch: sample pure noise; the teacher encodes the context ONCE and
    rolls out ``distill_teacher_inference_steps`` DDIM steps (here a
    ``lax.scan`` under ``stop_gradient``) using the teacher's cached
    context (distill.py:172-189)
  * the student consumes the ORIGINAL noise and the same cached context:
    with ``student_steps=1`` it is the reference's single ``denoise`` at
    t=0 whose output IS the trajectory (distill.py:191-195); with
    ``student_steps=K>1`` it runs its own K-step DDIM rollout WITH
    gradients through all K steps (trajectory-matching few-step
    distillation — the mid-quality/mid-speed points between the 30-step
    teacher and the 1-step student; no reference counterpart)
  * loss = MSE(student_output, teacher_trajectory) (distill.py:198)
  * the saved checkpoint's hyperparams carry ``distilled_decoder: True``
    for the 1-step student — which inference branches on (distill.py:62;
    ros.py:293) — or ``distilled_num_steps: K`` for a few-step student,
    which the evaluation/serving paths read as the DDIM step count (the
    student still predicts epsilon, so the standard sampler machinery,
    including the fused whole-chunk kernel, serves it with T=K).

CLI (argument order matches the reference):

  python -m soccerdiffusion_tpu.training.distill <config.yaml> <teacher_ckpt>
      [-o out] [--student-steps K] [--dummy-data] [--epochs N]
      [--steps-per-epoch N]
"""

from __future__ import annotations

import argparse
from typing import Callable

import jax
import jax.numpy as jnp
import optax
import yaml

from soccerdiffusion_tpu import logger
from soccerdiffusion_tpu.config import Config
from soccerdiffusion_tpu.data.normalizer import Normalizer
from soccerdiffusion_tpu.data.pipeline import prefetch_to_device
from soccerdiffusion_tpu.diffusion import DiffusionSchedule, ddim_sample, make_schedule
from soccerdiffusion_tpu.models import DiffusionPolicy
from soccerdiffusion_tpu.parallel import make_mesh
from soccerdiffusion_tpu.training.checkpoint import load_checkpoint, save_checkpoint
from soccerdiffusion_tpu.training.metrics import MetricsLogger
from soccerdiffusion_tpu.training.trainer import (
    TrainState,
    create_train_state,
    lr_at_step,
    make_optimizer,
)


def make_distill_step(
    model: DiffusionPolicy,
    schedule: DiffusionSchedule,
    optimizer: optax.GradientTransformation,
    teacher_inference_steps: int = 30,
    student_steps: int = 1,
    donate: bool = True,
    guidance_scale: float = 1.0,
    guidance_null: tuple[str, ...] = (),
    teacher_draws: int = 1,
) -> Callable:
    """(student_state, teacher_params, batch, seed) -> (student_state, metrics).

    ``student_steps=1``: single forward at t=0, output IS the trajectory
    (reference distill.py:191-195). ``student_steps=K>1``: differentiable
    K-step DDIM rollout of the student (epsilon-predicting) against the
    teacher trajectory.

    ``guidance_scale != 1`` with ``guidance_null`` modality names runs the
    TEACHER rollout with classifier-free guidance (the unconditional
    branch nulls those modalities, data/pipeline.py null_modalities) while
    the student still consumes only the conditional context — guidance
    distillation (Meng & Salimans 2023): the student bakes the amplified
    conditioning in and needs no doubled-batch CFG at serve time. No
    reference counterpart (the reference's distillation is unguided,
    distill.py:172-198).

    ``teacher_draws=K>1`` distills from the POSTERIOR-MEAN teacher: the
    target is the average of K full teacher rollouts from independent
    start noises (a ``lax.map`` over draws — sequential, so no K-fold
    activation memory). The K-draw average is the estimator that met the
    camera-use criterion in evaluation (open_loop_metrics mean_of), and
    it is a deterministic function of the context — the student learns to
    output it directly, collapsing the 480-NFE evaluation-time estimator
    into its own (1..student_steps)-NFE forward. With K=1 the behavior is
    exactly the classic path (student consumes the teacher's own noise)."""
    if student_steps < 1:
        raise ValueError(f"student_steps must be >= 1, got {student_steps}")
    if teacher_draws < 1:
        raise ValueError(f"teacher_draws must be >= 1, got {teacher_draws}")
    guided = guidance_scale != 1.0 and bool(guidance_null)

    def step_fn(state: TrainState, teacher_params, batch, rng_seed):
        from soccerdiffusion_tpu.data.pipeline import null_modalities

        rng = jax.random.fold_in(jax.random.key(rng_seed), state.step)
        bsz = batch["joint_command"].shape[0]
        shape = (
            bsz,
            model.config.trajectory_prediction_length,
            model.config.num_joints,
        )
        noise = jax.random.normal(rng, shape, dtype=jnp.float32)

        teacher_vars = {"params": teacher_params}
        if state.batch_stats:
            teacher_vars["batch_stats"] = state.batch_stats

        # Teacher: encode once, then the full DDIM rollout — all frozen.
        context = model.apply(teacher_vars, batch, False, method=model.encode_context)
        if guided:
            context_u = model.apply(teacher_vars, null_modalities(batch, guidance_null),
                                    False, method=model.encode_context)

            def denoise_fn(x, t):
                tt = jnp.full((bsz,), t, jnp.int32)
                eps_c = model.apply(teacher_vars, context, x, tt,
                                    method=model.denoise)
                eps_u = model.apply(teacher_vars, context_u, x, tt,
                                    method=model.denoise)
                return eps_u + guidance_scale * (eps_c - eps_u)
        else:
            def denoise_fn(x, t):
                return model.apply(
                    teacher_vars, context, x, jnp.full((bsz,), t, jnp.int32),
                    method=model.denoise,
                )

        if teacher_draws > 1:
            # posterior-mean target: average K independent-noise rollouts.
            # lax.map keeps the draws sequential (one rollout's activations
            # live at a time); the student's input noise stays a separate
            # draw — the target is noise-independent by construction and
            # the student learns to ignore its noise input.
            draw_noise = jax.random.normal(
                jax.random.fold_in(rng, 1),
                (teacher_draws,) + shape, dtype=jnp.float32)
            teacher_traj = jax.lax.stop_gradient(jnp.mean(
                jax.lax.map(
                    lambda n: ddim_sample(schedule, denoise_fn, n,
                                          teacher_inference_steps),
                    draw_noise),
                axis=0))
        else:
            teacher_traj = jax.lax.stop_gradient(
                ddim_sample(schedule, denoise_fn, noise,
                            teacher_inference_steps)
            )
        context = jax.lax.stop_gradient(context)

        def loss_fn(params):
            student_vars = {"params": params}
            if state.batch_stats:
                student_vars["batch_stats"] = state.batch_stats
            if student_steps == 1:
                pred = model.apply(
                    student_vars, context, noise, jnp.zeros((bsz,), jnp.int32),
                    method=model.denoise,
                )
            else:
                def student_denoise(x, t):
                    return model.apply(
                        student_vars, context, x,
                        jnp.full((bsz,), t, jnp.int32), method=model.denoise,
                    )

                # K-step DDIM with gradients flowing through every step
                pred = ddim_sample(schedule, student_denoise, noise, student_steps)
            return jnp.mean(jnp.square(pred.astype(jnp.float32) - teacher_traj))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def main(argv=None):
    parser = argparse.ArgumentParser(description="Distill the diffusion policy sampler")
    parser.add_argument("config", type=str)
    parser.add_argument("checkpoint", type=str)
    parser.add_argument("--output", "-o", type=str, default="distilled_model.ckpt")
    parser.add_argument("--student-steps", type=int, default=1,
                        help="student DDIM steps: 1 = reference-style t=0 "
                             "forward; K>1 = few-step trajectory-matching "
                             "student served with T=K")
    parser.add_argument("--guidance", type=str, default=None,
                        help="guidance distillation: SCALE[@MODALITY,...] "
                             "(e.g. '3.0@image') — the teacher rollout runs "
                             "with classifier-free guidance and the student "
                             "bakes it in (no CFG cost at serve time)")
    parser.add_argument("--teacher-draws", type=int, default=1,
                        help="K>1: distill from the POSTERIOR-MEAN teacher "
                             "— the target is the average of K independent-"
                             "noise teacher rollouts (the estimator the "
                             "camera-use evidence uses), so the student's "
                             "single forward outputs the mean directly")
    parser.add_argument("--dummy-data", action="store_true")
    parser.add_argument("--device-data", action="store_true",
                        help="upload the whole dataset to the device once "
                             "and gather batches on-device (single-device "
                             "runs; see train.py --device-data)")
    parser.add_argument("--db", type=str, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--steps-per-epoch", type=int, default=None)
    parser.add_argument("--mesh", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--metrics", type=str, default=None)
    args = parser.parse_args(argv)

    with open(args.config) as f:
        params = yaml.safe_load(f)
    config = Config.from_dict(params)
    epochs = args.epochs if args.epochs is not None else config.train.epochs
    batch_size = config.train.batch_size

    from soccerdiffusion_tpu.training.train import build_dataset, parse_mesh

    dataset = build_dataset(args, config)
    steps_per_epoch = len(dataset) // batch_size
    if args.steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.steps_per_epoch)
    total_steps = max(1, epochs * steps_per_epoch)

    model = DiffusionPolicy(config.model)
    schedule = make_schedule(config.train.train_denoising_timesteps)
    # Only the denoiser + step token receive gradients (the context comes
    # from the teacher's cached encoding, distill.py:177); mask the
    # optimizer so frozen encoder params are not touched — torch skips
    # None-grad params in optimizer.step(), so the reference's student
    # encoder stays bit-identical to the teacher's, and AdamW weight decay
    # must not erode ours either.
    optimizer = optax.masked(
        make_optimizer(config.train.lr, total_steps, config.train.weight_decay),
        lambda params: {
            k: k in ("diffusion_action_generator", "step_encoding")
            for k in params
        },
    )
    mesh = make_mesh(parse_mesh(args.mesh) or None)

    sample_batch = next(dataset.batches(batch_size, shuffle=False))
    with mesh:
        state = create_train_state(
            model, jax.device_put(sample_batch), optimizer, jax.random.key(args.seed),
            config.model.trajectory_prediction_length, config.model.num_joints,
        )
    # Teacher and student both initialized from the checkpoint
    # (distill.py:127-142). Loaded template-free: the teacher's optimizer
    # state is discarded (the student starts a fresh masked optimizer), so
    # its layout need not match.
    ckpt = load_checkpoint(args.checkpoint)
    # Distill from the weights the teacher would SERVE: the EMA tree when
    # the checkpoint carries one (training/checkpoint.py policy), else the
    # raw params.
    teacher_weights = ckpt["state"].get("ema_params") or ckpt["state"]["params"]
    teacher_params = jax.tree.map(jnp.asarray, teacher_weights)
    # distinct buffers: the student state is donated by the jitted step
    # while teacher_params is passed alongside every call
    state = state.replace(params=jax.tree.map(jnp.copy, teacher_params))
    if ckpt["state"].get("batch_stats"):
        state = state.replace(
            batch_stats=jax.tree.map(jnp.asarray, ckpt["state"]["batch_stats"]))
    normalizer = ckpt["norm"]

    g_scale, g_null = 1.0, ()
    if args.guidance is not None:
        from soccerdiffusion_tpu.data.pipeline import parse_guidance_spec

        try:
            g_scale, g_null = parse_guidance_spec(args.guidance)
        except ValueError as e:
            parser.error(str(e))
        logger.info(f"guidance distillation: teacher CFG w={g_scale:g} "
                    f"nulling {list(g_null)}")

    if args.teacher_draws > 1:
        logger.info(f"posterior-mean distillation: teacher target = mean of "
                    f"{args.teacher_draws} independent rollouts")
    distill_step = make_distill_step(
        model, schedule, optimizer,
        teacher_inference_steps=config.train.distill_teacher_inference_steps,
        student_steps=args.student_steps,
        guidance_scale=g_scale, guidance_null=g_null,
        teacher_draws=args.teacher_draws,
    )
    metrics_logger = MetricsLogger(args.metrics, log_every=config.train.log_every)

    params = dict(params)
    if args.student_steps == 1:
        params["distilled_decoder"] = True  # inference branches on this (ros.py:293)
    else:
        # few-step student: epsilon-predicting, served by the standard DDIM
        # machinery (incl. the fused chunk kernel) with T=K
        params["distilled_num_steps"] = args.student_steps
    if args.guidance is not None:
        # provenance: the student was trained against the GUIDED teacher
        # (evaluation/serving need no special handling — the student runs
        # unguided and the amplification is baked into its weights)
        params["distilled_guidance_scale"] = g_scale
        params["distilled_guidance_null"] = list(g_null)
    if args.teacher_draws > 1:
        # provenance: the target was the K-draw posterior-mean teacher
        params["distilled_teacher_draws"] = args.teacher_draws

    device_data = None
    if args.device_data:
        from soccerdiffusion_tpu.data.pipeline import DeviceResidentData

        device_data = DeviceResidentData(dataset)
        logger.info(f"dataset resident on device ({len(device_data)} samples)")

    with mesh:
        for epoch in range(epochs):
            batch_iter = (
                device_data.batches(batch_size, shuffle=True,
                                    seed=args.seed + epoch)
                if device_data is not None else
                prefetch_to_device(
                    dataset.batches(batch_size, shuffle=True,
                                    seed=args.seed + epoch), mesh))
            for i, batch in enumerate(batch_iter):
                if i >= steps_per_epoch:
                    break
                state, metrics = distill_step(state, teacher_params, batch, args.seed)
                metrics_logger.log(
                    int(state.step) - 1,
                    {
                        "loss": metrics["loss"],
                        "grad_norm": metrics["grad_norm"],
                        "lr": lr_at_step(config.train.lr, total_steps, int(state.step) - 1),
                        "epoch": epoch,
                    },
                )
            save_checkpoint(args.output, state, normalizer, params, epoch)
            logger.info(f"epoch {epoch} done; distilled checkpoint -> {args.output}")
    metrics_logger.close()
    return state


if __name__ == "__main__":
    main()
