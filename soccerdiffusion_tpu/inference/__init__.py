"""Serving: chunk sampling, closed-loop controller state, batched rollouts.

The reference deploys as a ROS 2 node holding Python-list buffers behind a
lock (reference ml/inference/ros.py:36-335). Here the controller is a pure
state pytree stepped by jitted functions, so one code path serves both the
single-robot real-time case and thousands of batched simulated robots per
device (BASELINE.json north star).
"""

from soccerdiffusion_tpu.inference.sampler import make_chunk_sampler
from soccerdiffusion_tpu.inference.controller import (
    ControllerState,
    init_controller_state,
    make_controller_batch,
    observe,
    push_action_chunk,
)
from soccerdiffusion_tpu.inference.rollout import RolloutEngine
from soccerdiffusion_tpu.inference.player import select_action_index, select_action

__all__ = [
    "make_chunk_sampler",
    "ControllerState",
    "init_controller_state",
    "observe",
    "make_controller_batch",
    "push_action_chunk",
    "RolloutEngine",
    "select_action_index",
    "select_action",
]
