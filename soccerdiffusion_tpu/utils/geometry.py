"""Quaternion / angle utilities (jnp, batch-first, jit-safe).

Behavioral counterparts of reference utils/utils.py:9-75, re-derived as
vectorized closed forms (the reference loops over transforms3d' quat2axangle
per sample; here the axis-angle conversion is branch-free jnp so it can live
inside jitted input pipelines and the rollout engine).
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def xyzw2wxyz(quat: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) xyzw -> wxyz."""
    return jnp.roll(quat, 1, axis=-1)


def wxyz2xyzw(quat: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz -> xyzw."""
    return jnp.roll(quat, -1, axis=-1)


def quats_to_5d(quats_xyzw: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) xyzw quaternions -> (..., 5) [axis_x, axis_y, axis_z, sin a, cos a].

    Matches reference utils/utils.py:9-25 (axis-angle with the angle as a
    continuous sin/cos pair), including transforms3d's conventions: for the
    identity-rotation limit the axis is the canonical x-axis (1, 0, 0).
    """
    q = quats_xyzw
    # Normalize (transforms3d quat2axangle normalizes non-unit quaternions).
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(norm, 1e-12)
    xyz, w = q[..., :3], q[..., 3]
    len_xyz = jnp.linalg.norm(xyz, axis=-1)
    # Safe axis: fall back to x-axis when the vector part vanishes.
    safe_len = jnp.maximum(len_xyz, 1e-12)
    axis = xyz / safe_len[..., None]
    default_axis = jnp.zeros_like(axis).at[..., 0].set(1.0)
    degenerate = (len_xyz < 1e-6)[..., None]
    axis = jnp.where(degenerate, default_axis, axis)
    angle = 2.0 * jnp.arctan2(len_xyz, w)
    angle = jnp.where(len_xyz < 1e-6, 0.0, angle)
    return jnp.concatenate(
        [axis, jnp.sin(angle)[..., None], jnp.cos(angle)[..., None]], axis=-1
    )


def shift_radian_to_positive_range(radian: jnp.ndarray) -> jnp.ndarray:
    """[-pi, pi] principal range -> [0, 2*pi) (reference utils/utils.py:47-54).

    Identical formula: (x + 3*pi) mod 2*pi.
    """
    return (radian + 3.0 * jnp.pi) % TWO_PI


def shift_radian_to_symmetric_range(radian: jnp.ndarray) -> jnp.ndarray:
    """[0, 2*pi) -> [-pi, pi) (inverse shift used when feeding actions back;
    reference ml/inference/ros.py:315-318 applies the -pi wrap)."""
    return ((radian + jnp.pi) % TWO_PI) - jnp.pi
