"""Noise schedules.

Implements the "squaredcos_cap_v2" (Nichol & Dhariwal improved-DDPM cosine)
beta schedule with the exact semantics the reference gets from
``diffusers.DDIMScheduler(beta_schedule="squaredcos_cap_v2")``
(reference ml/training/train.py:185): betas derived from the cosine
alpha-bar function with s=0.008, capped at 0.999.

The schedule is a small immutable pytree of precomputed tables; everything
downstream indexes into it with gathers, which XLA fuses into the surrounding
computation (no host-side scheduler object, no per-step Python).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class DiffusionSchedule:
    """Precomputed diffusion schedule tables (immutable pytree).

    Attributes:
      betas: (T,) float32 per-step noise variances.
      alphas_cumprod: (T,) float32 cumulative products of (1 - beta).
      num_train_timesteps: static int T.
      final_alpha_cumprod: alpha-bar used for the step *past* t=0 in DDIM
        (diffusers' ``set_alpha_to_one=True`` default => 1.0).
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    num_train_timesteps: int = struct.field(pytree_node=False)
    final_alpha_cumprod: float = struct.field(pytree_node=False)


def squaredcos_cap_v2_betas(num_train_timesteps: int, max_beta: float = 0.999) -> np.ndarray:
    """Cosine alpha-bar schedule betas (improved-DDPM, s=0.008, capped)."""

    def alpha_bar(t: float) -> float:
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = np.empty(num_train_timesteps, dtype=np.float64)
    for i in range(num_train_timesteps):
        t1 = i / num_train_timesteps
        t2 = (i + 1) / num_train_timesteps
        betas[i] = min(1.0 - alpha_bar(t2) / alpha_bar(t1), max_beta)
    return betas.astype(np.float32)


def linear_betas(num_train_timesteps: int, beta_start: float = 1e-4, beta_end: float = 0.02) -> np.ndarray:
    """Classic DDPM linear schedule (not used by the reference; provided for completeness)."""
    return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64).astype(np.float32)


def scaled_linear_betas(num_train_timesteps: int, beta_start: float = 0.00085, beta_end: float = 0.012) -> np.ndarray:
    """Stable-diffusion style sqrt-space linear schedule (completeness)."""
    return (
        np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64) ** 2
    ).astype(np.float32)


_BETA_FNS = {
    "squaredcos_cap_v2": squaredcos_cap_v2_betas,
    "linear": linear_betas,
    "scaled_linear": scaled_linear_betas,
}


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_schedule: str = "squaredcos_cap_v2",
    set_alpha_to_one: bool = True,
) -> DiffusionSchedule:
    """Build a DiffusionSchedule matching the reference's scheduler config.

    Reference: DDIMScheduler(beta_schedule="squaredcos_cap_v2",
    clip_sample=False) with num_train_timesteps from config
    (reference train.py:185-186).
    """
    if beta_schedule not in _BETA_FNS:
        raise ValueError(f"unknown beta_schedule: {beta_schedule}")
    betas = _BETA_FNS[beta_schedule](num_train_timesteps)
    alphas_cumprod = np.cumprod(1.0 - betas.astype(np.float64)).astype(np.float32)
    final_alpha_cumprod = 1.0 if set_alpha_to_one else float(alphas_cumprod[0])
    return DiffusionSchedule(
        betas=jnp.asarray(betas),
        alphas_cumprod=jnp.asarray(alphas_cumprod),
        num_train_timesteps=num_train_timesteps,
        final_alpha_cumprod=final_alpha_cumprod,
    )
