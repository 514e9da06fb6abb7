"""Closed-loop controller state as a pure pytree.

Re-expresses the reference ROS node's rolling buffers
(reference ros.py:88-106 init, :205-257 update, :264-275 batch build) as an
immutable struct updated by jitted functions. All arrays carry a leading
batch dimension so the same code drives one real robot or thousands of
simulated ones.

Conventions preserved from the reference:
  * joint buffers hold values in the symmetric [-pi, pi] domain and are
    shifted to [0, 2*pi) only when building the model batch
    (ros.py:266-273 ``(x + 3*pi) % (2*pi)``)
  * the model's predicted chunk (already in [0, 2*pi)) is pushed back into
    the action-history buffer with a -pi shift (ros.py:315-318)
  * buffers initialize to zeros (ros.py:88-106 — including the IMU buffer,
    which deliberately differs from the dataset's identity-quat padding)
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from soccerdiffusion_tpu.config import ModelConfig

TWO_PI = 2.0 * jnp.pi


@struct.dataclass
class ControllerState:
    joint_command_history: jnp.ndarray  # (B, A, J) in [-pi, pi]
    joint_state_history: jnp.ndarray  # (B, S, J) in [-pi, pi]
    imu_history: jnp.ndarray  # (B, I, 4|5)
    images: jnp.ndarray | None  # (B, F, H, W, 3) preprocessed, or None
    game_state: jnp.ndarray  # (B,) int32
    # Serving-side image-token cache: per-frame encoder outputs (B, F,
    # hidden), rolled on frame ARRIVAL (10 Hz) so replans skip the image
    # encoder entirely (models/policy.py encode_image_frames). Mutually
    # exclusive with ``images``.
    image_tokens: jnp.ndarray | None = None


def init_controller_state(config: ModelConfig, batch_size: int = 1,
                          cache_image_tokens: bool = False) -> ControllerState:
    """``cache_image_tokens``: hold the image context as cached per-frame
    TOKENS instead of raw frames. The zeros init is a placeholder — for
    exact parity with the raw path's zero-image buffers, fill it with the
    zero-frame encoding (see RolloutEngine.init / RealtimeController)."""
    cfg = config
    b = batch_size
    images = image_tokens = None
    if cfg.use_images and cache_image_tokens:
        image_tokens = jnp.zeros(
            (b, cfg.image_context_length, cfg.hidden_dim), dtype=jnp.float32)
    elif cfg.use_images:
        images = jnp.zeros(
            (b, cfg.image_context_length, cfg.image_resolution, cfg.image_resolution, 3),
            dtype=jnp.float32,
        )
    return ControllerState(
        joint_command_history=jnp.zeros((b, cfg.action_context_length, cfg.num_joints)),
        joint_state_history=jnp.zeros((b, cfg.joint_state_context_length, cfg.num_joints)),
        imu_history=jnp.zeros((b, cfg.imu_context_length, cfg.imu_input_dim)),
        images=images,
        # The reference node pins game_state to 2 (= STOPPED in sorted order)
        # during play (ros.py:275); keep that default, callers may observe.
        game_state=jnp.full((b,), 2, dtype=jnp.int32),
        image_tokens=image_tokens,
    )


def _roll_append(buffer: jnp.ndarray, new_rows: jnp.ndarray) -> jnp.ndarray:
    """Append new_rows (B, k, ...) to a rolling (B, T, ...) buffer, keeping T."""
    return jnp.concatenate([buffer, new_rows], axis=1)[:, new_rows.shape[1] :]


def observe(
    state: ControllerState,
    joint_state: jnp.ndarray | None = None,  # (B, J) in [-pi, pi]
    imu: jnp.ndarray | None = None,  # (B, 4|5)
    image: jnp.ndarray | None = None,  # (B, H, W, 3) preprocessed
    game_state: jnp.ndarray | None = None,  # (B,)
    image_tokens: jnp.ndarray | None = None,  # (B, hidden) encoded frame
) -> ControllerState:
    """Push one tick of sensor data into the rolling buffers (ros.py:205-257)."""
    updates = {}
    if joint_state is not None:
        updates["joint_state_history"] = _roll_append(
            state.joint_state_history, joint_state[:, None]
        )
    if imu is not None:
        updates["imu_history"] = _roll_append(state.imu_history, imu[:, None])
    if image is not None and state.images is not None:
        updates["images"] = _roll_append(state.images, image[:, None])
    if image_tokens is not None and state.image_tokens is not None:
        updates["image_tokens"] = _roll_append(state.image_tokens,
                                               image_tokens[:, None])
    if game_state is not None:
        updates["game_state"] = game_state
    return state.replace(**updates)


def make_controller_batch(config: ModelConfig, state: ControllerState) -> dict:
    """Build the model batch dict, shifting joints into [0, 2*pi)
    (ros.py:264-275)."""
    batch: dict = {}
    if config.use_action_history:
        batch["joint_command_history"] = (state.joint_command_history + 3 * jnp.pi) % TWO_PI
    if config.use_joint_states:
        batch["joint_state"] = (state.joint_state_history + 3 * jnp.pi) % TWO_PI
    if config.use_imu:
        batch["rotation"] = state.imu_history
    if config.use_images:
        if state.image_tokens is not None:
            batch["image_tokens"] = state.image_tokens
        else:
            batch["image_data"] = state.images
    if config.use_gamestate:
        batch["game_state"] = state.game_state
    if not batch:
        # decoder_only tier: every conditioning modality is off (reference
        # config/decoder_only.yaml) — carry the batch size for
        # encode_context's empty-context fallback via a zero-width
        # placeholder under the training batch's target key
        batch["joint_command"] = jnp.zeros(
            (state.joint_command_history.shape[0], 0, 0))
    return batch


def push_action_chunk(state: ControllerState, chunk: jnp.ndarray) -> ControllerState:
    """Feed the model's own predicted chunk ((B, P, J), [0, 2*pi) domain)
    back into the action-history buffer with the -pi shift (ros.py:315-318)."""
    return state.replace(
        joint_command_history=_roll_append(state.joint_command_history, chunk - jnp.pi)
    )


def observe_many(
    state: ControllerState,
    joint_states: jnp.ndarray | None = None,  # (B, K, J)
    imus: jnp.ndarray | None = None,  # (B, K, 4|5)
    images: jnp.ndarray | None = None,  # (B, K', H, W, 3) preprocessed
    image_tokens: jnp.ndarray | None = None,  # (B, K', hidden) encoded
) -> ControllerState:
    """Push K ticks of sensor rows in ONE buffer update per modality —
    identical result to K sequential ``observe`` calls (each an O(history)
    concat), at a fraction of the op count on the serving path. Images
    arrive at their own (lower) rate, so K' may differ from K
    (reference ros.py:162-163: <=10 Hz camera vs 50 Hz sensors)."""
    updates = {}
    if joint_states is not None:
        updates["joint_state_history"] = _roll_append(state.joint_state_history, joint_states)
    if imus is not None:
        updates["imu_history"] = _roll_append(state.imu_history, imus)
    if images is not None and state.images is not None:
        updates["images"] = _roll_append(state.images, images)
    if image_tokens is not None and state.image_tokens is not None:
        updates["image_tokens"] = _roll_append(state.image_tokens, image_tokens)
    return state.replace(**updates)
