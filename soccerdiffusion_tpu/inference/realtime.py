"""Host-side realtime control driver.

Counterpart of the reference's ROS 2 deployment pair — the ``Inference``
node's three timers (50 Hz buffer update, 10 Hz image update, 200 ms
``step()``; reference ml/inference/ros.py:155-203) and the
``TrajectoryPlayer``'s wall-clock point selection
(trajectory_player.py:43-79) — re-expressed as a transport-agnostic driver:
the robot side is an abstract ``RobotIO`` (implementations can wrap rclpy,
a UDP bridge, or the built-in simulated plant), and all compute runs through
the jitted chunk sampler with controller state as a pytree.

The replan step runs in a worker thread so the 50 Hz actuation tick never
blocks on the accelerator: while a new chunk is being sampled, the player
keeps serving points from the previous chunk (the same overlap the ROS
node gets from its MutuallyExclusiveCallbackGroup + multithreaded executor;
ros.py:155-159, :338-344).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass
from typing import Callable, Optional, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu import DEFAULT_RESAMPLE_RATE_HZ, IMAGE_MAX_RESAMPLE_RATE_HZ, logger
from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.inference.controller import (
    init_controller_state,
    make_controller_batch,
    observe,
    push_action_chunk,
)
from soccerdiffusion_tpu.inference.player import select_action


class RobotIO(Protocol):
    """Transport seam between the driver and a robot (or simulator)."""

    def read_joint_state(self) -> Optional[np.ndarray]:
        """(J,) latest joint positions in [-pi, pi], or None."""

    def read_imu(self) -> Optional[np.ndarray]:
        """(4,) or (5,) latest orientation, or None."""

    def read_image(self) -> Optional[np.ndarray]:
        """(H, W, 3) preprocessed float frame, or None."""

    def read_game_state(self) -> Optional[int]:
        """Robot state id, or None."""

    def write_command(self, command: np.ndarray) -> None:
        """(J,) joint command in [-pi, pi]."""


@dataclass
class ChunkSlot:
    chunk: np.ndarray  # (P, J), [0, 2*pi) domain
    start_time: float


class RealtimeController:
    def __init__(
        self,
        config: ModelConfig,
        sample_fn: Callable,  # (variables, batch, rng) -> (1, P, J), e.g. make_chunk_sampler(...)
        variables,
        io: RobotIO,
        control_rate_hz: float = DEFAULT_RESAMPLE_RATE_HZ,
        image_rate_hz: float = IMAGE_MAX_RESAMPLE_RATE_HZ,
        seed: int = 0,
        clock: Callable[[], float] = time.monotonic,
        sleep_fn: Callable[[float], None] = time.sleep,
        plan_in_thread: bool = True,
        replan_every_ticks: Optional[int] = None,
        plan_join_timeout_s: Optional[float] = 600.0,
        encode_image_fn: Optional[Callable] = None,
    ):
        self.cfg = config
        self.sample_fn = sample_fn
        self.variables = variables
        self.io = io
        self.control_rate = control_rate_hz
        self.image_period = 1.0 / image_rate_hz
        self.clock = clock
        self.sleep_fn = sleep_fn
        # With plan_in_thread=False the replan runs inline in the control
        # loop (no overlap) — deterministic under a virtual clock, at the
        # cost of blocking one actuation tick per replan.
        self.plan_in_thread = plan_in_thread
        # Replan every pred_len control ticks = 200 ms at the default rates
        # (reference ros.py:156-159). Receding horizon: replan_every_ticks
        # < pred_len replans before the chunk is exhausted (down to every
        # tick = the full control rate); the slot keeps the whole chunk so
        # actuation plays on past the horizon if a plan arrives late, and
        # only the horizon prefix enters the action-history buffer
        # (commands expected to be issued; matches RolloutEngine
        # replan_every semantics).
        P = config.trajectory_prediction_length
        self.replan_every_ticks = (
            P if replan_every_ticks is None else int(replan_every_ticks))
        if not 1 <= self.replan_every_ticks <= P:
            raise ValueError(
                f"replan_every_ticks must be in [1, pred_len={P}], "
                f"got {replan_every_ticks}")
        self.replan_period = self.replan_every_ticks / control_rate_hz

        # Image-token caching (encode_image_fn given): each camera frame is
        # encoded ONCE on arrival — on the 10 Hz image tick, off the replan
        # critical path — and the replan samples against the cached token
        # buffer (models/policy.py encode_image_frames / encode_context's
        # image_tokens branch). The reference re-encodes the whole frame
        # stack inside every 200 ms step() (ros.py:177-203, 287-313).
        # ``encode_image_fn(variables, frames(1,K,H,W,3)) -> (1,K,hidden)``,
        # e.g. jax.jit(partial(model.apply, method=model.encode_image_frames)).
        self.encode_image_fn = encode_image_fn
        cache_tokens = config.use_images and encode_image_fn is not None
        self._state = init_controller_state(config, batch_size=1,
                                            cache_image_tokens=cache_tokens)
        if cache_tokens:
            # parity with the raw path's zero-image buffers: prefill the
            # cache with the zero-frame encoding
            res = config.image_resolution
            zero_tok = np.asarray(encode_image_fn(
                variables, jnp.zeros((1, 1, res, res, 3))))
            self._state = self._state.replace(image_tokens=jnp.broadcast_to(
                jnp.asarray(zero_tok),
                self._state.image_tokens.shape).astype(
                    self._state.image_tokens.dtype))
        self._state_lock = threading.Lock()
        self._rng = jax.random.key(seed)
        self._slot: Optional[ChunkSlot] = None
        self._last_image_time = -np.inf
        self._plan_thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self.plan_latencies_ms: list[float] = []
        # Upper bound on waiting for an in-flight plan after run() ends.
        # Covers a first-call jit compile (minutes through a cold tunnel)
        # but not a wedged device runtime: past the bound the daemon thread
        # is abandoned with an error rather than blocking run() forever.
        # None = wait indefinitely.
        self.plan_join_timeout_s = plan_join_timeout_s

    # ------------------------------------------------------------- plumbing

    def _observe_tick(self, now: float) -> None:
        joint_state = self.io.read_joint_state()
        imu = self.io.read_imu()
        game_state = self.io.read_game_state()
        image = None
        if self.cfg.use_images and now - self._last_image_time >= self.image_period:
            image = self.io.read_image()
            if image is not None:
                self._last_image_time = now
        image_tokens = None
        if image is not None and self.encode_image_fn is not None:
            # encode on arrival (10 Hz), not on replan — the expensive
            # per-frame encoder leaves the replan critical path entirely
            image_tokens = self.encode_image_fn(
                self.variables, jnp.asarray(image)[None, None])[:, 0]
            image = None
        with self._state_lock:
            self._state = observe(
                self._state,
                joint_state=None if joint_state is None else jnp.asarray(joint_state)[None],
                imu=None if imu is None else jnp.asarray(imu)[None],
                image=None if image is None else jnp.asarray(image)[None],
                game_state=None if game_state is None else jnp.full((1,), game_state, jnp.int32),
                image_tokens=image_tokens,
            )

    def _plan_once(self) -> None:
        t0 = self.clock()
        with self._state_lock:
            batch = make_controller_batch(self.cfg, self._state)
        self._rng, sub = jax.random.split(self._rng)
        chunk = np.asarray(jax.block_until_ready(
            self.sample_fn(self.variables, batch, sub)
        ))[0]
        with self._state_lock:
            self._state = push_action_chunk(
                self._state,
                jnp.asarray(chunk[: self.replan_every_ticks])[None])
        self._slot = ChunkSlot(chunk=chunk, start_time=self.clock())
        self.plan_latencies_ms.append((self.clock() - t0) * 1e3)

    def _maybe_replan(self) -> None:
        if not self.plan_in_thread:
            self._plan_once()
            return
        if self._plan_thread is not None and self._plan_thread.is_alive():
            return  # previous plan still in flight — keep playing the old chunk
        self._plan_thread = threading.Thread(target=self._plan_once, daemon=True)
        self._plan_thread.start()

    def _actuate(self, now: float) -> None:
        if self._slot is None:
            return
        command = np.asarray(
            select_action(jnp.asarray(self._slot.chunk), self._slot.start_time, now,
                          self.control_rate)
        )
        # Chunks live in [0, 2*pi); commands go out in [-pi, pi]
        # (reference ros.py:331 publishes positions - pi).
        self.io.write_command(command - np.pi)

    # ------------------------------------------------------------------ run

    def run(self, duration_s: float) -> None:
        """Blocking control loop at ``control_rate`` for ``duration_s``."""
        period = 1.0 / self.control_rate
        start = self.clock()
        next_tick = start
        next_plan = start
        while not self._stop.is_set() and self.clock() - start < duration_s:
            now = self.clock()
            self._observe_tick(now)
            if now >= next_plan:
                self._maybe_replan()
                next_plan += self.replan_period
            self._actuate(now)
            next_tick += period
            sleep = next_tick - self.clock()
            if sleep > 0:
                self.sleep_fn(sleep)
            elif sleep < -period:
                logger.warning(f"control loop overran by {-sleep * 1e3:.1f} ms")
                next_tick = self.clock()
        if self._plan_thread is not None:
            self._plan_thread.join(timeout=5.0)
            if self._plan_thread.is_alive():
                # An in-flight plan can legitimately outlive the loop (e.g.
                # the first call is a jit compile). Interpreter teardown
                # while the daemon thread is inside XLA aborts the process,
                # so wait it out — but only up to plan_join_timeout_s: a
                # wedged device runtime can hang a call for tens of minutes,
                # and an unbounded join would turn that into a hung run().
                logger.warning("waiting for in-flight plan to finish "
                               "(first-call jit compile?)")
                self._plan_thread.join(timeout=self.plan_join_timeout_s)
                if self._plan_thread.is_alive():
                    logger.error(
                        f"in-flight plan still running after "
                        f"{self.plan_join_timeout_s:.0f}s; abandoning the "
                        f"plan thread (device runtime may be wedged — "
                        f"teardown while it is inside XLA can abort)")

    def stop(self) -> None:
        self._stop.set()


class SimulatedRobotIO:
    """Built-in plant for driver tests/demos: first-order joint tracking."""

    def __init__(self, num_joints: int, imu_dim: int = 4, alpha: float = 0.5):
        self.positions = np.zeros(num_joints, dtype=np.float32)
        self.imu_dim = imu_dim
        self.alpha = alpha
        self.commands_received: int = 0

    def read_joint_state(self):
        return self.positions

    def read_imu(self):
        imu = np.zeros(self.imu_dim, dtype=np.float32)
        imu[-1] = 1.0
        return imu

    def read_image(self):
        return None

    def read_game_state(self):
        return 2

    def write_command(self, command: np.ndarray) -> None:
        self.commands_received += 1
        self.positions = self.positions + self.alpha * (
            command.astype(np.float32) - self.positions
        )
