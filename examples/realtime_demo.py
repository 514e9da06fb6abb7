"""Closed-loop realtime serving demo — the reference's deployment story
(ml/inference/ros.py driving a robot at 50 Hz with 200 ms replans) without
ROS: a transport-agnostic ``RobotIO`` + ``RealtimeController``.

Trains nothing: initializes a small proprioceptive policy, then runs the
50 Hz control loop against the built-in simulated plant for two seconds of
virtual time (deterministic — no wall-clock sleeps), with overlapped
replanning every 200 ms. Prints the commands delivered and replan
latencies.

Run: JAX_PLATFORMS=cpu python examples/realtime_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.data import Normalizer
from soccerdiffusion_tpu.diffusion import make_schedule
from soccerdiffusion_tpu.inference import make_chunk_sampler
from soccerdiffusion_tpu.inference.controller import (
    init_controller_state,
    make_controller_batch,
)
from soccerdiffusion_tpu.inference.realtime import (
    RealtimeController,
    SimulatedRobotIO,
)
from soccerdiffusion_tpu.models import DiffusionPolicy


class VirtualClock:
    """Deterministic clock: sleep() advances time instead of waiting."""

    def __init__(self):
        self.t = 0.0

    def now(self) -> float:
        return self.t

    def sleep(self, dt: float) -> None:
        self.t += max(dt, 0.0)


def main() -> int:
    cfg = ModelConfig(
        num_joints=8, hidden_dim=32, trajectory_prediction_length=10,
        action_context_length=20, joint_state_context_length=20,
        imu_context_length=20, use_images=False, use_gamestate=True,
        num_action_history_encoder_layers=1, num_imu_encoder_layers=1,
        joint_state_encoder_layers=1, num_decoder_layers=1,
    )
    model = DiffusionPolicy(cfg)
    state = init_controller_state(cfg, batch_size=1)
    batch = make_controller_batch(cfg, state)
    variables = model.init(jax.random.key(0), batch,
                           jnp.zeros((1, 10, 8)), jnp.zeros((1,), jnp.int32))

    sampler = make_chunk_sampler(model, make_schedule(100),
                                 Normalizer.identity(cfg.num_joints),
                                 num_inference_steps=5)
    io = SimulatedRobotIO(num_joints=cfg.num_joints)
    clock = VirtualClock()
    ctl = RealtimeController(cfg, sampler, variables, io,
                             clock=clock.now, sleep_fn=clock.sleep,
                             plan_in_thread=False)
    ctl.run(duration_s=2.0)

    expected = int(2.0 * 50)
    print(f"commands delivered: {io.commands_received} "
          f"(expected ~{expected} at 50 Hz over 2 s virtual time)")
    lat = ctl.plan_latencies_ms
    # latencies are measured on the injected clock — virtual here, so the
    # count (one per 200 ms period) is the meaningful signal
    print(f"replans: {len(lat)} (every {cfg.trajectory_prediction_length} "
          f"ticks = 200 ms)")
    print(f"final joint positions: {np.round(io.positions, 3)}")
    ok = io.commands_received >= expected - 5 and len(lat) >= 8
    print("REALTIME DEMO PASSED" if ok else "REALTIME DEMO FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
