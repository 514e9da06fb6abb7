"""Closed-loop divergence: teacher vs student under feedback.

Open-loop agreement (evaluation/openloop.py) measures one chunk; a policy
is deployed CLOSED-loop (reference ml/inference/ros.py:315-318 feeds its
own predictions back into the action-history buffer), where small per-chunk
errors compound. This module rolls two samplers through the batched rollout
engine (inference/rollout.py) from IDENTICAL initial state and an identical
noise stream, and records how far the executed trajectories drift apart per
replan period.

The rollout RNG depends only on the carry (``jax.random.split`` of the same
key), never on the params — so both runs draw the same chunk noise at every
period and the divergence isolates the sampler difference + its feedback
amplification, not sampling luck.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.diffusion import DiffusionSchedule, solver_label
from soccerdiffusion_tpu.inference.rollout import RolloutEngine


def rollout_chunks(model, variables, schedule: DiffusionSchedule, normalizer,
                   num_steps: int, distilled: bool, batch_size: int,
                   num_chunks: int, seed: int = 0,
                   solver: str = "ddim") -> np.ndarray:
    """Executed chunks (num_chunks, B, P, J) for one sampler configuration."""
    engine = RolloutEngine(
        model, schedule, normalizer,
        num_inference_steps=num_steps, distilled=distilled, solver=solver,
    )
    carry = engine.init(batch_size, jax.random.key(seed))
    rollout = engine.make_rollout_fn(num_chunks, jit=True)
    _, chunks = rollout(variables, carry)
    return np.asarray(chunks)


def closed_loop_divergence(model, teacher_vars, student_vars,
                           schedule: DiffusionSchedule, normalizer,
                           teacher_steps: int, student_steps: int,
                           student_distilled: bool, batch_size: int = 64,
                           num_chunks: int = 10, seed: int = 0,
                           student_solver: str = "ddim") -> dict:
    """Per-period mean |joint delta| between teacher and student rollouts.

    Returns the divergence curve (one value per replan period, radians),
    its final value, and the teacher's own action scale as a yardstick.
    """
    t_chunks = rollout_chunks(model, teacher_vars, schedule, normalizer,
                              teacher_steps, False, batch_size, num_chunks, seed)
    s_chunks = rollout_chunks(model, student_vars, schedule, normalizer,
                              student_steps, student_distilled, batch_size,
                              num_chunks, seed, solver=student_solver)
    # mean absolute joint-command difference per period (radians)
    curve = np.mean(np.abs(t_chunks - s_chunks), axis=(1, 2, 3))
    action_scale = float(np.mean(np.abs(np.diff(t_chunks, axis=2))))
    return {
        "num_chunks": int(num_chunks),
        "batch_size": int(batch_size),
        "teacher": f"ddim{teacher_steps}",
        "student": ("distilled1" if student_distilled
                    else solver_label(student_solver, student_steps)),
        "divergence_curve_rad": [float(v) for v in curve],
        "final_divergence_rad": float(curve[-1]),
        "mean_divergence_rad": float(curve.mean()),
        "teacher_tick_action_scale_rad": action_scale,
    }


def self_consistency(model, variables, schedule: DiffusionSchedule, normalizer,
                     num_steps: int, batch_size: int = 64,
                     num_chunks: int = 10, seed: int = 0) -> dict:
    """Noise sensitivity yardstick: the SAME sampler rolled out twice with
    different noise streams. Student-vs-teacher divergence below this level
    is indistinguishable from sampling variation."""
    a = rollout_chunks(model, variables, schedule, normalizer, num_steps,
                       False, batch_size, num_chunks, seed)
    b = rollout_chunks(model, variables, schedule, normalizer, num_steps,
                       False, batch_size, num_chunks, seed + 104729)
    curve = np.mean(np.abs(a - b), axis=(1, 2, 3))
    return {
        "divergence_curve_rad": [float(v) for v in curve],
        "mean_divergence_rad": float(curve.mean()),
    }
