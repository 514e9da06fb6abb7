"""Chunk playback: select the active point of a published action chunk.

Counterpart of the reference's TrajectoryPlayer node
(reference ml/inference/trajectory_player.py:43-79): at each 50 Hz tick pick
the latest trajectory point whose time offset has passed, clamped to the
last point.
"""

from __future__ import annotations

import jax.numpy as jnp


def select_action_index(
    chunk_len: int, chunk_start_time: jnp.ndarray, now: jnp.ndarray, rate_hz: float = 50.0
) -> jnp.ndarray:
    """Index of the active point: floor((now - start) * rate), clamped."""
    idx = jnp.floor((now - chunk_start_time) * rate_hz).astype(jnp.int32)
    return jnp.clip(idx, 0, chunk_len - 1)


def select_action(
    chunk: jnp.ndarray, chunk_start_time, now, rate_hz: float = 50.0
) -> jnp.ndarray:
    """chunk: (..., P, J); returns the (..., J) command active at ``now``."""
    idx = select_action_index(chunk.shape[-2], jnp.asarray(chunk_start_time),
                              jnp.asarray(now), rate_hz)
    return jnp.take_along_axis(
        chunk, idx[..., None, None].astype(jnp.int32), axis=-2
    ).squeeze(-2) if jnp.ndim(idx) else chunk[..., idx, :]
