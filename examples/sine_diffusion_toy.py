"""Tiny-tier example: unconditional-ish diffusion on synthetic sine waves.

Counterpart of the reference's preliminary research scripts
(reference ml/preliminary/train_diffusion_transformer.py and friends,
SURVEY.md §2.8) and BASELINE.json config[0]: a small transformer denoiser
learns to generate sine-wave "joint trajectories" conditioned only on the
action history, trained and sampled on CPU in under a minute.

  JAX_PLATFORMS=cpu python examples/sine_diffusion_toy.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.data import Normalizer
from soccerdiffusion_tpu.diffusion import add_noise, ddim_sample, make_schedule
from soccerdiffusion_tpu.models import DiffusionPolicy
from soccerdiffusion_tpu.training import create_train_state, make_optimizer, make_train_step

HIST, PRED, JOINTS = 40, 10, 4


def sine_batch(rng: np.random.Generator, batch: int):
    """History + future windows of multi-frequency sine waves."""
    freqs = rng.uniform(0.5, 2.0, (batch, JOINTS))
    phases = rng.uniform(0, 2 * np.pi, (batch, JOINTS))
    t = np.arange(HIST + PRED) * 0.05
    waves = np.sin(freqs[:, None, :] * t[None, :, None] + phases[:, None, :])
    waves = waves.astype(np.float32) + np.pi  # [0, 2pi)-style domain
    return {
        "joint_command_history": jnp.asarray(waves[:, :HIST]),
        "joint_command": jnp.asarray(waves[:, HIST:]),
    }


def main() -> int:
    cfg = ModelConfig(
        num_joints=JOINTS, hidden_dim=64, trajectory_prediction_length=PRED,
        action_context_length=HIST, use_imu=False, use_joint_states=False,
        use_images=False, use_gamestate=False,
        num_action_history_encoder_layers=1, num_decoder_layers=2,
        encoder_patch_size=1,
    )
    model = DiffusionPolicy(cfg)
    sched = make_schedule(100)
    opt = make_optimizer(3e-3, total_steps=800)
    norm = Normalizer(mean=jnp.full((JOINTS,), np.pi), std=jnp.full((JOINTS,), 0.71))

    rng = np.random.default_rng(0)
    batch = sine_batch(rng, 64)
    state = create_train_state(model, batch, opt, jax.random.key(0), PRED, JOINTS)
    step = make_train_step(model, sched, opt, norm, donate=False)

    t0 = time.time()
    losses = []
    for i in range(800):
        state, m = step(state, sine_batch(rng, 64), 0)
        losses.append(float(m["loss"]))
        if i % 200 == 0:
            print(f"step {i}: loss {losses[-1]:.4f}")
    print(f"trained 800 steps in {time.time()-t0:.1f}s; final loss {np.mean(losses[-10:]):.4f}")

    # Sample continuations and measure fit against the true future.
    test = sine_batch(rng, 16)
    variables = {"params": state.params}
    ctx = model.apply(variables, test, method=model.encode_context)

    def denoise_fn(x, t):
        return model.apply(variables, ctx, x, jnp.full((16,), t, jnp.int32),
                           method=model.denoise)

    noise = jax.random.normal(jax.random.key(3), (16, PRED, JOINTS))
    sampled = norm.denormalize(ddim_sample(sched, denoise_fn, noise, 30))
    err = float(jnp.abs(sampled - test["joint_command"]).mean())
    print(f"mean |sampled - true future| = {err:.3f} (vs ~0.8 for pure noise)")
    ok = np.mean(losses[-10:]) < 0.4 and err < 0.55
    print("SINE TOY PASSED" if ok else "SINE TOY FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
