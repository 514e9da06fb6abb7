"""DDPM forward process and DDIM/DDPM reverse processes as pure JAX.

Semantics match what the reference obtains from diffusers'
``DDIMScheduler`` with epsilon prediction, ``clip_sample=False``, eta=0 and
the default "leading" timestep spacing:

  * ``add_noise``   — forward diffusion q(x_t | x_0)  (reference train.py:218)
  * ``ddim_step``   — one reverse step x_t -> x_{t-dt} (reference ros.py:301-310)
  * ``ddim_sample`` — the full 30-step sampling loop, here one ``lax.scan``
    so the whole sampler compiles to a single fused XLA while-loop instead of
    30 Python-dispatched kernel launches.

All math is done in float32 regardless of the activations' compute dtype; the
result is cast back to the input dtype.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.diffusion.schedule import DiffusionSchedule


def _broadcast_gather(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather table[t] for a batch of timesteps and reshape to broadcast over trailing dims."""
    vals = jnp.take(table, t, axis=0)
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))


def add_noise(
    schedule: DiffusionSchedule, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Forward diffusion: x_t = sqrt(abar_t) x0 + sqrt(1-abar_t) eps.

    ``t`` is a per-batch-element integer timestep, shape (B,) (or scalar).
    """
    abar = _broadcast_gather(schedule.alphas_cumprod.astype(jnp.float32), t, x0.ndim)
    out = jnp.sqrt(abar) * x0.astype(jnp.float32) + jnp.sqrt(1.0 - abar) * noise.astype(jnp.float32)
    return out.astype(x0.dtype)


def ddim_timesteps(num_train_timesteps: int, num_inference_steps: int) -> np.ndarray:
    """Inference timestep sequence with "leading" spacing (diffusers default).

    step_ratio = T // n; timesteps = round(arange(n) * step_ratio)[::-1]
    e.g. T=1000, n=30 -> [957, 924, ..., 33, 0].
    Returned as a static numpy array: the sampler trip count must be static
    under jit.
    """
    if num_inference_steps > num_train_timesteps:
        raise ValueError("num_inference_steps cannot exceed num_train_timesteps")
    step_ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy().astype(np.int32)
    return ts


def ddim_prev_timestep(num_train_timesteps: int, num_inference_steps: int, t: jnp.ndarray) -> jnp.ndarray:
    """prev_t = t - T // n (may be negative, meaning 'fully denoised')."""
    return t - num_train_timesteps // num_inference_steps


def _alpha_prod_prev(schedule: DiffusionSchedule, prev_t: jnp.ndarray) -> jnp.ndarray:
    """abar_{prev_t}, using final_alpha_cumprod when prev_t < 0."""
    safe_prev = jnp.maximum(prev_t, 0)
    abar_prev = jnp.take(schedule.alphas_cumprod, safe_prev, axis=0)
    return jnp.where(prev_t >= 0, abar_prev, schedule.final_alpha_cumprod)


def ddim_step(
    schedule: DiffusionSchedule,
    eps_pred: jnp.ndarray,
    t: jnp.ndarray,
    prev_t: jnp.ndarray,
    sample: jnp.ndarray,
    *,
    clip_x0: float | None = None,
) -> jnp.ndarray:
    """One deterministic DDIM reverse step (eta=0, epsilon prediction).

      x0_hat = (x_t - sqrt(1-abar_t) eps) / sqrt(abar_t)
      x_prev = sqrt(abar_prev) x0_hat + sqrt(1-abar_prev) eps

    ``clip_x0`` (default off — the reference's clip_sample=False path)
    enables diffusers' ``clip_sample`` semantics: x0_hat is clamped to
    [-clip_x0, clip_x0] and eps is RECOMPUTED from the clamped x0 before
    the reverse mixture. The preliminary MLP archetype depends on this
    (reference ml/preliminary/train_robot_multi_joint.py:47 uses the
    DDIMScheduler default clip_sample=True on tanh-bounded data); the
    production policy path never sets it, keeping serving parity exact.

    ``t``/``prev_t`` may be scalars or per-batch (B,) arrays.
    """
    x = sample.astype(jnp.float32)
    eps = eps_pred.astype(jnp.float32)
    abar_t = _broadcast_gather(schedule.alphas_cumprod, jnp.asarray(t), x.ndim)
    prev_t = jnp.asarray(prev_t)
    abar_prev = _alpha_prod_prev(schedule, prev_t)
    abar_prev = abar_prev.reshape(abar_prev.shape + (1,) * (x.ndim - abar_prev.ndim))

    x0_hat = (x - jnp.sqrt(1.0 - abar_t) * eps) / jnp.sqrt(abar_t)
    if clip_x0 is not None:
        x0_hat = jnp.clip(x0_hat, -clip_x0, clip_x0)
        eps = (x - jnp.sqrt(abar_t) * x0_hat) / jnp.sqrt(1.0 - abar_t)
    x_prev = jnp.sqrt(abar_prev) * x0_hat + jnp.sqrt(1.0 - abar_prev) * eps
    return x_prev.astype(sample.dtype)


def ddim_sample(
    schedule: DiffusionSchedule,
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_t: jnp.ndarray,
    num_inference_steps: int,
    *,
    clip_x0: float | None = None,
) -> jnp.ndarray:
    """Full DDIM sampling loop as one ``lax.scan``.

    ``denoise_fn(x, t)`` predicts epsilon for the whole batch at (broadcast)
    timestep ``t`` (an int32 scalar). Mirrors the reference's inference loop
    (reference ros.py:301-310, distill.py:179-189) but compiles to a single
    fused loop. The trip count ``num_inference_steps`` is static.
    ``clip_x0`` forwards to :func:`ddim_step` (diffusers clip_sample
    semantics; default off = reference parity).
    """
    ts = jnp.asarray(ddim_timesteps(schedule.num_train_timesteps, num_inference_steps))
    step_ratio = schedule.num_train_timesteps // num_inference_steps

    def body(x, t):
        eps = denoise_fn(x, t)
        x = ddim_step(schedule, eps, t, t - step_ratio, x, clip_x0=clip_x0)
        return x, None

    x0, _ = jax.lax.scan(body, x_t, ts)
    return x0


def ddpm_step(
    schedule: DiffusionSchedule,
    eps_pred: jnp.ndarray,
    t: jnp.ndarray,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """One stochastic DDPM ancestral step (epsilon prediction, no clipping).

    Completeness beyond the reference's DDIM-only path; used for ablation and
    the tiny CPU-tier examples (BASELINE.json config[0]).
    """
    x = sample.astype(jnp.float32)
    eps = eps_pred.astype(jnp.float32)
    t = jnp.asarray(t)
    beta_t = _broadcast_gather(schedule.betas, t, x.ndim)
    abar_t = _broadcast_gather(schedule.alphas_cumprod, t, x.ndim)
    prev_t = t - 1
    abar_prev = _alpha_prod_prev(schedule, prev_t)
    abar_prev = abar_prev.reshape(abar_prev.shape + (1,) * (x.ndim - abar_prev.ndim))
    alpha_t = 1.0 - beta_t

    x0_hat = (x - jnp.sqrt(1.0 - abar_t) * eps) / jnp.sqrt(abar_t)
    # Posterior mean coefficients (Ho et al. 2020, eq. 7).
    coef_x0 = jnp.sqrt(abar_prev) * beta_t / (1.0 - abar_t)
    coef_xt = jnp.sqrt(alpha_t) * (1.0 - abar_prev) / (1.0 - abar_t)
    mean = coef_x0 * x0_hat + coef_xt * x
    # Posterior variance, zeroed at t == 0.
    var = beta_t * (1.0 - abar_prev) / (1.0 - abar_t)
    t_b = t.reshape(t.shape + (1,) * (x.ndim - t.ndim))
    x_prev = mean + jnp.where(t_b > 0, jnp.sqrt(var) * noise.astype(jnp.float32), 0.0)
    return x_prev.astype(sample.dtype)


def ddpm_sample(
    schedule: DiffusionSchedule,
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_t: jnp.ndarray,
    rng: jax.Array,
) -> jnp.ndarray:
    """Full ancestral DDPM sampling over all T train timesteps, as one scan."""
    ts = jnp.arange(schedule.num_train_timesteps - 1, -1, -1, dtype=jnp.int32)

    def body(carry, t):
        x, key = carry
        key, sub = jax.random.split(key)
        eps = denoise_fn(x, t)
        noise = jax.random.normal(sub, x.shape, dtype=jnp.float32)
        x = ddpm_step(schedule, eps, t, x, noise)
        return (x, key), None

    (x0, _), _ = jax.lax.scan(body, (x_t, rng), ts)
    return x0
