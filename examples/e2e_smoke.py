"""End-to-end smoke: dummy data -> train -> DDIM sample -> distill -> rollout.

The framework's MVP slice (SURVEY.md §7 step 3) as one runnable script:

  JAX_PLATFORMS=cpu python examples/e2e_smoke.py

Exits non-zero if the loss fails to drop or any stage produces non-finite
output.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.data import Normalizer, WindowedDataset, generate_dummy_arrays
from soccerdiffusion_tpu.diffusion import make_schedule
from soccerdiffusion_tpu.inference import RolloutEngine, make_chunk_sampler
from soccerdiffusion_tpu.models import DiffusionPolicy
from soccerdiffusion_tpu.training import create_train_state, make_optimizer, make_train_step
from soccerdiffusion_tpu.training.distill import make_distill_step


def main() -> int:
    cfg = ModelConfig(
        num_joints=8, hidden_dim=32, trajectory_prediction_length=10,
        action_context_length=40, joint_state_context_length=40, imu_context_length=40,
        use_images=False, num_action_history_encoder_layers=1,
        num_imu_encoder_layers=1, joint_state_encoder_layers=1, num_decoder_layers=2,
    )
    dummy = generate_dummy_arrays(1, 500, num_joints=cfg.num_joints)
    ds = WindowedDataset.from_dummy(dummy, cfg)
    norm = Normalizer.fit(ds.sample_targets(300))
    model = DiffusionPolicy(cfg)
    sched = make_schedule(100)
    opt = make_optimizer(1e-3, total_steps=120)

    batch = next(ds.batches(32, shuffle=False))
    state = create_train_state(model, jax.device_put(batch), opt, jax.random.key(0),
                               cfg.trajectory_prediction_length, cfg.num_joints)
    step = make_train_step(model, sched, opt, norm, donate=False)

    t0 = time.time()
    losses = []
    for epoch in range(4):
        for b in ds.batches(32, shuffle=True, seed=epoch):
            state, m = step(state, jax.device_put(b), 0)
            losses.append(float(m["loss"]))
    print(f"train: {len(losses)} steps in {time.time()-t0:.1f}s; "
          f"loss {losses[0]:.3f} -> {np.mean(losses[-5:]):.3f}")
    if not np.mean(losses[-5:]) < 0.8 * losses[0]:
        print("FAIL: loss did not decrease")
        return 1

    variables = {"params": state.params}
    sampler = make_chunk_sampler(model, sched, norm, num_inference_steps=30)
    chunk = sampler(variables, batch, jax.random.key(1))
    print(f"30-step DDIM chunk: {chunk.shape}, finite={bool(jnp.isfinite(chunk).all())}")
    if not bool(jnp.isfinite(chunk).all()):
        return 1

    # distill a few steps
    dstep = make_distill_step(model, sched, opt, teacher_inference_steps=10, donate=False)
    teacher_params = jax.tree.map(jnp.copy, state.params)
    dlosses = []
    for epoch in range(2):
        for b in ds.batches(32, shuffle=True, seed=10 + epoch):
            state, m = dstep(state, teacher_params, jax.device_put(b), 0)
            dlosses.append(float(m["loss"]))
    print(f"distill: loss {dlosses[0]:.4f} -> {dlosses[-1]:.4f}")
    if not dlosses[-1] < dlosses[0]:
        print("FAIL: distill loss did not decrease")
        return 1

    engine = RolloutEngine(model, sched, norm, num_inference_steps=5, distilled=True)
    carry = engine.init(batch_size=16, rng=jax.random.key(2))
    rollout = engine.make_rollout_fn(num_chunks=3)
    carry, chunks = rollout({"params": state.params}, carry)
    print(f"rollout: {chunks.shape}, finite={bool(jnp.isfinite(chunks).all())}")
    if not bool(jnp.isfinite(chunks).all()):
        return 1

    print("E2E SMOKE PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
