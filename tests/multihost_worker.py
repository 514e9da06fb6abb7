"""Worker process for the multi-host distributed smoke test.

Each process owns 2 virtual CPU devices; 2 processes form a 4-device global
mesh. One data-parallel train step runs on a globally-sharded batch; the loss
(identical on every process — same program, same data, psum'd grads) is
printed as LOSS <value> for the parent test to compare. This is the DCN story
(SURVEY.md §5.8): the same shardings as single-slice, with
jax.distributed.initialize bootstrapping the cross-process runtime.

Usage: python tests/multihost_worker.py <coordinator> <num_procs> <pid>
"""

from __future__ import annotations

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# force OUR device count even if the parent (e.g. pytest's conftest) already
# exported a different xla_force_host_platform_device_count
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
flags.append("--xla_force_host_platform_device_count=2")
os.environ["XLA_FLAGS"] = " ".join(flags)
# keep workers lean; the distributed service is the thing under test
os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "false")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from soccerdiffusion_tpu.parallel.distributed import global_mesh, initialize_distributed

    initialize_distributed(coordinator, num_procs, pid)
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.device_count() == 2 * num_procs, jax.device_count()

    from soccerdiffusion_tpu.config import ModelConfig
    from soccerdiffusion_tpu.data import Normalizer, WindowedDataset, generate_dummy_arrays
    from soccerdiffusion_tpu.diffusion import make_schedule
    from soccerdiffusion_tpu.models import DiffusionPolicy
    from soccerdiffusion_tpu.training import create_train_state, make_optimizer, make_train_step

    cfg = ModelConfig(
        num_joints=8, hidden_dim=16, trajectory_prediction_length=5,
        action_context_length=10, joint_state_context_length=10,
        imu_context_length=10, use_images=False, use_gamestate=True,
        num_action_history_encoder_layers=1, num_imu_encoder_layers=1,
        joint_state_encoder_layers=1, num_decoder_layers=1,
    )
    model = DiffusionPolicy(cfg)
    dummy = generate_dummy_arrays(1, 80, num_joints=8, seed=0)
    ds = WindowedDataset.from_dummy(dummy, cfg)
    normalizer = Normalizer.fit(ds.sample_targets(32))
    schedule = make_schedule(20)
    optimizer = make_optimizer(1e-4, total_steps=4)

    mesh = global_mesh({"data": jax.device_count()})
    global_batch_size = 2 * jax.device_count()
    host_batch = next(ds.batches(global_batch_size, shuffle=False))

    from jax.sharding import NamedSharding, PartitionSpec as P

    def to_global(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        # every process holds the full host batch; hand JAX this process's rows
        local_rows = x[pid * (len(x) // num_procs):(pid + 1) * (len(x) // num_procs)]
        return jax.make_array_from_process_local_data(sharding, local_rows, x.shape)

    batch = {k: to_global(v) for k, v in host_batch.items()}

    with mesh:
        state = create_train_state(
            model, batch, optimizer, jax.random.key(0),
            cfg.trajectory_prediction_length, cfg.num_joints,
        )
        train_step = make_train_step(model, schedule, optimizer, normalizer, donate=False)
        state, metrics = train_step(state, batch, 0)
        loss = float(metrics["loss"])
    assert np.isfinite(loss)
    print(f"LOSS {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
