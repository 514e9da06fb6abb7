"""Pallas fused attention vs the XLA reference path (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from soccerdiffusion_tpu.models.attention import xla_attention
from soccerdiffusion_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize(
    "b,tq,tk,h,d",
    [
        (2, 10, 111, 4, 32),  # decoder cross-attn shape (chunk x context)
        (2, 111, 111, 4, 32),  # encoder self-attn
        (1, 10, 10, 4, 32),  # decoder self-attn
        (1, 196, 196, 4, 48),  # ViT patches
        (3, 7, 13, 2, 8),  # awkward unaligned sizes
    ],
)
def test_matches_xla(rng, b, tq, tk, h, d):
    q = rng.standard_normal((b, tq, h, d)).astype(np.float32)
    k = rng.standard_normal((b, tk, h, d)).astype(np.float32)
    v = rng.standard_normal((b, tk, h, d)).astype(np.float32)
    expected = xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    got = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5)


def test_streaming_path_matches(rng):
    # tk > single-tile threshold triggers the flash streaming recursion
    b, tq, tk, h, d = 1, 16, 1536, 2, 16
    q = rng.standard_normal((b, tq, h, d)).astype(np.float32)
    k = rng.standard_normal((b, tk, h, d)).astype(np.float32)
    v = rng.standard_normal((b, tk, h, d)).astype(np.float32)
    expected = xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    got = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True, block_k=512
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=3e-5, atol=3e-5)


def test_bfloat16_inputs(rng):
    b, t, h, d = 2, 24, 4, 32
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, t, h, d)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, t, h, d)), dtype=jnp.bfloat16)
    got = flash_attention(q, k, v, interpret=True)
    expected = xla_attention(q, k, v)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), np.asarray(expected, dtype=np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_gradients_match_xla(rng):
    """custom-VJP backward (recompute-in-VMEM) vs autodiff of XLA attention."""
    import jax

    b, tq, tk, h, d = 2, 12, 40, 4, 16
    q = jnp.asarray(rng.standard_normal((b, tq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, tk, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, tk, h, d)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((b, tq, h, d)).astype(np.float32))

    want = jax.grad(lambda *a: jnp.sum(xla_attention(*a) * cot), argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(
        lambda *a: jnp.sum(flash_attention(*a, interpret=True) * cot),
        argnums=(0, 1, 2),
    )(q, k, v)
    for name, g, w in zip("qkv", got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_gradients_streaming_match_xla(rng):
    import jax

    b, tq, tk, h, d = 1, 8, 1408, 2, 16
    q = jnp.asarray(rng.standard_normal((b, tq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, tk, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, tk, h, d)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(flash_attention(q, k, v, interpret=True, block_k=512)))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.square(xla_attention(q, k, v)))

    want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for name, g, w in zip("qkv", got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-4, atol=5e-4, err_msg=f"d{name}")
