"""DPM-Solver++(2M): a second-order multistep ODE solver for the reverse process.

The reference samples exclusively with 30-step first-order DDIM
(reference ml/inference/ros.py:301-310); its only route to fewer steps is
*trained* distillation (ml/training/distill.py).  DPM-Solver++(2M)
(Lu et al. 2022, arXiv:2211.01095) is the standard *training-free* few-step
lever: a second-order linear-multistep integrator of the probability-flow
ODE in log-SNR time, matching 30-step DDIM quality at ~10 steps with zero
extra model evaluations per step.

TPU-first formulation: every step of the solver is **linear in
(x_t, eps_pred, x0_prev)** with coefficients that depend only on the
schedule and the (static) timestep sequence.  We therefore precompute one
``(T, 5)`` fp32 coefficient table ``[A, B, C, P, Q]`` host-side in float64

    x_{i+1}    = A_i * x_i + B_i * eps_i + C_i * x0cache_i
    x0cache_{i+1} = P_i * x_i + Q_i * eps_i          (= x0_hat at step i)

and the whole sampler compiles to a single ``lax.scan`` (XLA path) or rides
the same SMEM table slot as DDIM inside the fused whole-chunk Pallas kernel
(ops/fused_chunk.py) — first-order DDIM is exactly the ``C = 0`` special
case of this form, so one in-kernel update rule serves both solvers.

Math (data-prediction DPM-Solver++, epsilon-parameterized model):
  alpha_t = sqrt(abar_t), sigma_t = sqrt(1 - abar_t),
  lambda_t = log(alpha_t / sigma_t)                  (log-SNR/2)
  x0_i     = (x - sigma_c * eps) / alpha_c
  h_i      = lambda_p - lambda_c,   r_i = h_{i-1} / h_i,   c_i = 1/(2 r_i)
  D_i      = (1 + c_i) x0_i - c_i x0_{i-1}           (c_0 = 0: first step
                                                      is first-order = DDIM)
  (c_i = h_i / (2 h_{i-1}) linearly extrapolates x0 in lambda to the
   midpoint of the current step — the 2M midpoint correction.)
  x_{t_p}  = (sigma_p / sigma_c) x + alpha_p (1 - e^{-h_i}) D_i

``lower_order_final`` (diffusers' stabilizer for small T) forces the final
step back to first order; the terminal step to abar=final_alpha_cumprod=1
(sigma_p = 0) is the exact limit x -> x0_hat of the update above.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.diffusion.ddim import ddim_timesteps
from soccerdiffusion_tpu.diffusion.schedule import DiffusionSchedule


def parse_solver(solver: str) -> tuple[str, str]:
    """Split a compound solver string into (name, spacing).

    ``"ddim"`` / ``"dpmpp"`` use the reference's "leading" timestep spacing
    — the DEPLOYMENT form. ``"dpmpp@lambda"`` (or ``"ddim@lambda"``)
    selects log-SNR-uniform timesteps (solver_timesteps), the spacing under
    which the 2M multistep correction is correctly sized on the closed-form
    Gaussian ODE with an EXACT eps oracle (2.6-11x more accurate than ddim
    over N=8..30; tests/test_diffusion.py::TestDPMSolverPP). On a real (imperfect)
    eps model, however, @lambda starts at t=T-1 where 1/sqrt(abar) ~ 2e4
    amplifies model error and the sampler diverges — measured on the
    trained teacher in docs/quality_ledger_r3d.md. Keep @lambda for
    analytic/ODE studies; serve with leading spacing.
    """
    name, _, spacing = solver.partition("@")
    spacing = spacing or "leading"
    if name not in ("ddim", "dpmpp"):
        raise ValueError(f"unknown solver {solver!r}")
    if spacing not in ("leading", "lambda"):
        raise ValueError(f"unknown timestep spacing {spacing!r} in {solver!r}")
    return name, spacing


def solver_label(solver: str, num_steps: int) -> str:
    """Human/metric label, e.g. ("dpmpp@lambda", 10) -> "dpmpp10_lambda"."""
    name, spacing = parse_solver(solver)
    return f"{name}{num_steps}" + ("" if spacing == "leading" else f"_{spacing}")


def solver_timesteps(
    schedule: DiffusionSchedule,
    num_inference_steps: int,
    spacing: str = "leading",
) -> np.ndarray:
    """Static descending int32 timestep sequence for a sampler run.

    "leading": the reference's spacing (diffusion/ddim.py:ddim_timesteps,
    diffusers default — what the reference's DDIMScheduler produces).
    "lambda": log-SNR-uniform — timesteps chosen so consecutive
    half-log-SNR (lambda) increments are as equal as the integer grid
    allows, the spacing the DPM-Solver papers integrate under. The model
    was trained on uniformly sampled integer t (reference train.py:218),
    so any integer subset is in-distribution.
    """
    if spacing == "leading":
        return ddim_timesteps(schedule.num_train_timesteps, num_inference_steps)
    if spacing != "lambda":
        raise ValueError(f"unknown spacing {spacing!r}")
    T = schedule.num_train_timesteps
    if num_inference_steps > T:
        raise ValueError("num_inference_steps cannot exceed num_train_timesteps")
    acp = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
    lam = 0.5 * np.log(acp / (1.0 - acp))
    grid = np.linspace(lam[T - 1], lam[0], num_inference_steps)
    ts = [int(np.abs(lam - g).argmin()) for g in grid]
    # enforce strictly decreasing on the integer grid (duplicates collapse
    # where lambda moves less than one step per integer t)
    out, prev = [], T
    for t in ts:
        t = min(t, prev - 1)
        out.append(t)
        prev = t
    if out[-1] < 0:
        raise ValueError(f"cannot place {num_inference_steps} distinct "
                         f"lambda-spaced steps on a {T}-step schedule")
    return np.asarray(out, dtype=np.int32)


def solver_coef_table(
    schedule: DiffusionSchedule,
    num_inference_steps: int,
    solver: str = "ddim",
    lower_order_final: bool = True,
) -> np.ndarray:
    """(T, 5) float32 table [A, B, C, P, Q] for the linear per-step update.

    Computed host-side in float64 over the *static* timestep sequence
    (solver_timesteps, per the solver string's spacing), so both the XLA
    scan and the fused chunk kernel read identical coefficients.

      x_next  = A x + B eps + C x0cache ;  x0cache_next = P x + Q eps

    solver="ddim":  first-order (C = 0 everywhere), bit-for-bit the update in
    diffusion/ddim.py:ddim_step fused into one (A, B) pair.
    solver="dpmpp": DPM-Solver++(2M) as derived in the module docstring.
    Either may carry an "@lambda" spacing suffix (parse_solver).
    """
    name, spacing = parse_solver(solver)
    T = num_inference_steps
    ts = np.asarray(solver_timesteps(schedule, T, spacing), dtype=np.int64)
    acp = np.asarray(schedule.alphas_cumprod, dtype=np.float64)

    def abar(t: int) -> float:
        return acp[t] if t >= 0 else float(schedule.final_alpha_cumprod)

    out = np.zeros((T, 5), dtype=np.float64)
    h_prev = None
    for i, t in enumerate(ts):
        # the step target is the next timestep in the sequence; the final
        # step denoises past the end (abar = final_alpha_cumprod), exactly
        # as diffusion/ddim.py's prev_t < 0 convention
        prev_t = int(ts[i + 1]) if i + 1 < len(ts) else -1
        a_c2, a_p2 = abar(int(t)), abar(prev_t)
        alpha_c, sigma_c = np.sqrt(a_c2), np.sqrt(1.0 - a_c2)
        alpha_p, sigma_p = np.sqrt(a_p2), np.sqrt(1.0 - a_p2)
        # x0_hat coefficients (shared by both solvers)
        P = 1.0 / alpha_c
        Q = -sigma_c / alpha_c
        if name == "ddim":
            # x_prev = alpha_p x0_hat + sigma_p eps
            A = alpha_p * P
            B = alpha_p * Q + sigma_p
            C = 0.0
        else:
            lam_c = np.log(alpha_c / sigma_c)
            # Terminal step (sigma_p == 0): the exact h -> inf limit is
            # x_prev = D (phi = 1, sigma-ratio term = 0).
            if sigma_p == 0.0:
                phi = 1.0
                sig_ratio = 0.0
                h = np.inf
            else:
                lam_p = np.log(alpha_p / sigma_p)
                h = lam_p - lam_c
                phi = 1.0 - np.exp(-h)
                sig_ratio = sigma_p / sigma_c
            first_order = (
                h_prev is None
                or (lower_order_final and i == T - 1)
                or not np.isfinite(h)  # terminal sigma_p=0: h is infinite
            )
            c = 0.0 if first_order else h / (2.0 * h_prev)
            A = sig_ratio + alpha_p * phi * (1.0 + c) * P
            B = alpha_p * phi * (1.0 + c) * Q
            C = -alpha_p * phi * c
            h_prev = h
        out[i] = (A, B, C, P, Q)
    return out.astype(np.float32)


def solver_sample(
    schedule: DiffusionSchedule,
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_t: jnp.ndarray,
    num_inference_steps: int,
    solver: str = "dpmpp",
) -> jnp.ndarray:
    """Full sampling loop for either solver as one ``lax.scan``.

    Same contract as diffusion/ddim.py:ddim_sample — ``denoise_fn(x, t)``
    predicts epsilon at (broadcast) int32 timestep ``t``; the trip count is
    static; all solver math in float32 regardless of compute dtype.
    """
    _, spacing = parse_solver(solver)
    ts = jnp.asarray(solver_timesteps(schedule, num_inference_steps, spacing))
    coefs = jnp.asarray(solver_coef_table(schedule, num_inference_steps, solver))

    def body(carry, step):
        x, x0cache = carry
        t, cf = step
        eps = denoise_fn(x.astype(x_t.dtype), t).astype(jnp.float32)
        x_next = cf[0] * x + cf[1] * eps + cf[2] * x0cache
        x0cache = cf[3] * x + cf[4] * eps
        return (x_next, x0cache), None

    x32 = x_t.astype(jnp.float32)
    (x0, _), _ = jax.lax.scan(body, (x32, jnp.zeros_like(x32)), (ts, coefs))
    return x0.astype(x_t.dtype)


def dpmpp_sample(
    schedule: DiffusionSchedule,
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_t: jnp.ndarray,
    num_inference_steps: int,
) -> jnp.ndarray:
    """DPM-Solver++(2M) sampling loop (see solver_sample)."""
    return solver_sample(schedule, denoise_fn, x_t, num_inference_steps, solver="dpmpp")
