"""Diffusion process machinery, built natively in JAX.

The reference delegates all diffusion math to HuggingFace
``diffusers.DDIMScheduler(beta_schedule="squaredcos_cap_v2", clip_sample=False)``
(reference ml/training/train.py:185-186). Here the squared-cosine schedule,
DDPM forward process, and DDIM reverse process (eta=0, "leading" timestep
spacing) are first-class closed-form JAX code, with the full sampler expressed
as a single ``lax.scan`` so it compiles into one fused XLA loop.
"""

from soccerdiffusion_tpu.diffusion.schedule import DiffusionSchedule, make_schedule
from soccerdiffusion_tpu.diffusion.ddim import (
    add_noise,
    ddim_prev_timestep,
    ddim_sample,
    ddim_step,
    ddim_timesteps,
    ddpm_sample,
    ddpm_step,
)
from soccerdiffusion_tpu.diffusion.dpm_solver import (
    dpmpp_sample,
    parse_solver,
    solver_coef_table,
    solver_label,
    solver_sample,
    solver_timesteps,
)

__all__ = [
    "DiffusionSchedule",
    "make_schedule",
    "add_noise",
    "ddim_timesteps",
    "ddim_prev_timestep",
    "ddim_step",
    "ddim_sample",
    "ddpm_step",
    "ddpm_sample",
    "dpmpp_sample",
    "parse_solver",
    "solver_coef_table",
    "solver_label",
    "solver_sample",
    "solver_timesteps",
]
