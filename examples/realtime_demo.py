"""Closed-loop realtime serving demo — the reference's deployment story
(ml/inference/ros.py driving a robot at 50 Hz with 200 ms replans) without
ROS: a transport-agnostic ``RobotIO`` + ``RealtimeController``.

Trains nothing: initializes a small proprioceptive policy, then runs the
50 Hz control loop against the built-in simulated plant for two seconds of
virtual time (deterministic — no wall-clock sleeps), with overlapped
replanning every 200 ms. Prints the commands delivered and replan
latencies.

Run: JAX_PLATFORMS=cpu python examples/realtime_demo.py

With ``--udp`` the plant runs in a SEPARATE PROCESS behind the UDP bridge
(inference/transport.py) and the loop runs on the wall clock — the same
driver/robot process split as the reference's inference-node/robot pub-sub
deployment (ros.py:60-67, trajectory_player.py:25-33).
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


def _build_policy():
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
    return cfg, sampler, variables


def run_udp(duration_s: float = 2.0) -> int:
    """Two-process mode: simulated robot behind the UDP bridge."""
    import socket
    import subprocess
    import sys as _sys

    from soccerdiffusion_tpu.inference.transport import UdpRobotIO

    cfg, sampler, variables = _build_policy()
    # pick a free UDP port for the robot bridge
    probe = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    probe.bind(("127.0.0.1", 0))
    robot_port = probe.getsockname()[1]
    probe.close()

    server = subprocess.Popen(
        [_sys.executable, "-m", "soccerdiffusion_tpu.inference.transport",
         "--listen", f"127.0.0.1:{robot_port}", "--joints", str(cfg.num_joints),
         "--duration", str(duration_s + 10.0)],
        stdout=subprocess.PIPE, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": os.path.dirname(os.path.dirname(
                 os.path.abspath(__file__)))},
    )
    try:
        io = UdpRobotIO(f"127.0.0.1:{robot_port}")
        assert io.wait_connected(), "no observations from the robot process"
        # compile the sampler BEFORE the wall-clock loop starts so the
        # first 200 ms replan slot isn't spent in jit
        warm = make_controller_batch(cfg, init_controller_state(cfg, 1))
        jax.block_until_ready(sampler(variables, warm, jax.random.key(1)))
        ctl = RealtimeController(cfg, sampler, variables, io,
                                 plan_in_thread=True)
        ctl.run(duration_s=duration_s)
        delivered = io._cmd_seq
        received = io.request_stats()
        observations = io.observations_received
        io.close()
    finally:
        server.terminate()
        out = server.communicate(timeout=10)[0]
    lat = ctl.plan_latencies_ms
    print(f"[udp] observations received by driver: {observations}")
    print(f"[udp] commands sent: {delivered}; received by robot process: "
          f"{received} (server stdout: {out.strip()!r})")
    if lat:
        print(f"[udp] replans: {len(lat)}, plan latency p50 "
              f"{np.median(lat):.1f} ms, max {max(lat):.1f} ms")
    # Gate on the process boundary being proven: observations streaming
    # in at a real rate, commands crossing to the robot process nearly
    # losslessly, and multiple replans completing. (Absolute command
    # counts depend on host load — the first plan can overrun a tick.)
    ok = (observations >= duration_s * 25 and received is not None
          and delivered >= 10 and received >= 0.8 * delivered
          and len(lat) >= 3)
    print("REALTIME UDP DEMO PASSED" if ok else "REALTIME UDP DEMO FAILED")
    return 0 if ok else 1


def main() -> int:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--udp", action="store_true",
                        help="run the plant in a separate process over UDP")
    parser.add_argument("--duration", type=float, default=2.0)
    args = parser.parse_args()
    if args.udp:
        return run_udp(args.duration)

    cfg, sampler, variables = _build_policy()
    io = SimulatedRobotIO(num_joints=cfg.num_joints)
    clock = VirtualClock()
    ctl = RealtimeController(cfg, sampler, variables, io,
                             clock=clock.now, sleep_fn=clock.sleep,
                             plan_in_thread=False)
    ctl.run(duration_s=args.duration)

    expected = int(args.duration * 50)
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
