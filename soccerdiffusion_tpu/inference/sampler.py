"""Action-chunk sampling: the serving-side denoising path.

Factorization matches the reference's real-time loop
(reference ros.py:287-313): encode the context ONCE, then either run the
30-step DDIM reverse process (teacher) or a single distilled forward at t=0,
then denormalize. Here the whole thing is one jitted function with the DDIM
loop as ``lax.scan``, so a chunk is one device program — no per-step Python
dispatch on the critical path.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from soccerdiffusion_tpu.data.normalizer import Normalizer
from soccerdiffusion_tpu.diffusion import DiffusionSchedule, solver_sample


def make_chunk_sampler(
    model,
    schedule: DiffusionSchedule,
    normalizer: Normalizer,
    num_inference_steps: int = 30,
    distilled: bool = False,
    jit: bool = True,
    solver: str = "ddim",
    guidance_scale: float = 1.0,
    guidance_null: tuple[str, ...] = ("image",),
) -> Callable:
    """Returns ``sample_fn(variables, batch, rng) -> (B, pred_len, J)`` action
    chunks in the [0, 2*pi) joint domain (denormalized).

    ``solver``: "ddim" (the reference sampler) or "dpmpp"
    (DPM-Solver++(2M), diffusion/dpm_solver.py — training-free few-step).

    ``guidance_scale`` != 1 serves with classifier-free guidance: each step
    denoises under the conditional context AND a ``guidance_null``-nulled
    context in one doubled-batch pass, combined as ``eps_u + w (eps_c -
    eps_u)`` (data/pipeline.py null_modalities; meaningful on
    modality_dropout-trained checkpoints). Iterative samplers only."""
    guided = guidance_scale != 1.0
    if guided and distilled:
        raise ValueError("classifier-free guidance requires an iterative "
                         "sampler; the distilled single forward is not a "
                         "score prediction")
    if guided:
        from soccerdiffusion_tpu.data.pipeline import (
            inactive_guidance_modalities, null_modalities)

        null_modalities({}, guidance_null)  # validate names eagerly
        inactive = inactive_guidance_modalities(model.config, guidance_null)
        if inactive:
            from soccerdiffusion_tpu import logger

            # guiding a modality the config never conditions on makes
            # eps_u == eps_c: doubled-batch cost for an unguided result
            logger.warning(
                f"guidance over {inactive} is a no-op: the model config "
                "does not condition on "
                f"{'/'.join(inactive)} (use_images/use_gamestate off); "
                "the doubled-batch CFG cost buys an unguided sample")

    def sample_fn(variables, batch, rng):
        context = model.apply(variables, batch, False, method=model.encode_context)
        bsz = context.shape[0]
        if guided:
            from soccerdiffusion_tpu.data.pipeline import null_modalities

            ctx_u = model.apply(variables, null_modalities(batch, guidance_null),
                                False, method=model.encode_context)
            context = jnp.concatenate([context, ctx_u], axis=0)
        shape = (
            bsz,
            model.config.trajectory_prediction_length,
            model.config.num_joints,
        )
        noise = jax.random.normal(rng, shape, dtype=jnp.float32)

        if distilled:
            # Single forward at t=0 from pure noise (reference ros.py:293-298,
            # matching the distilled student's training; distill.py:191-195).
            traj = model.apply(
                variables, context, noise, jnp.zeros((bsz,), jnp.int32),
                method=model.denoise,
            )
        else:
            # Project the context's cross-attention K/V once; every denoise
            # step only projects the fresh step token.
            context_kv = model.apply(variables, context,
                                     method=model.precompute_context_kv)

            if guided:
                def denoise_fn(x, t):
                    eps2 = model.apply(
                        variables, context_kv, jnp.concatenate([x, x], axis=0),
                        jnp.full((2 * bsz,), t, dtype=jnp.int32),
                        method=model.denoise_with_kv,
                    )
                    return (eps2[bsz:]
                            + guidance_scale * (eps2[:bsz] - eps2[bsz:]))
            else:
                def denoise_fn(x, t):
                    return model.apply(
                        variables, context_kv, x,
                        jnp.full((bsz,), t, dtype=jnp.int32),
                        method=model.denoise_with_kv,
                    )

            traj = solver_sample(schedule, denoise_fn, noise,
                                 num_inference_steps, solver=solver)
        return normalizer.denormalize(traj)

    return jax.jit(sample_fn) if jit else sample_fn
