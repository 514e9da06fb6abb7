"""Fused decoder layer (interpret mode): forward parity vs the flax layer,
gradient parity vs autodiff (x, memory, and every weight — the custom-VJP
backward recomputes in-kernel), and the module/serving fallbacks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soccerdiffusion_tpu.models.transformer import (
    FusedTransformerDecoderLayer,
    TransformerDecoderLayer,
)
from soccerdiffusion_tpu.ops.fused_decoder_layer import make_decoder_layer_fn

# T=10 (the shipped pred_len) is deliberately sublane-misaligned to
# exercise the pad-to-16 path; S=19 is misaligned too.
E, T, S, H = 64, 10, 19, 4


def setup(n=6, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, T, E)).astype(np.float32), dtype)
    mem = jnp.asarray(rng.standard_normal((n, S, E)).astype(np.float32), dtype)
    layer = TransformerDecoderLayer(E, H, dtype=dtype)
    params = layer.init(jax.random.key(0), x, mem)["params"]
    return layer, params, x, mem


def flat_weights(params):
    sa, ca = params["self_attn"], params["cross_attn"]
    wqkv = jnp.concatenate([sa["q_proj"]["kernel"], sa["k_proj"]["kernel"],
                            sa["v_proj"]["kernel"]], axis=1)
    bqkv = jnp.concatenate([sa["q_proj"]["bias"], sa["k_proj"]["bias"],
                            sa["v_proj"]["bias"]])
    return (params["norm1"]["scale"], params["norm1"]["bias"], wqkv, bqkv,
            sa["out_proj"]["kernel"], sa["out_proj"]["bias"],
            params["norm2"]["scale"], params["norm2"]["bias"],
            ca["q_proj"]["kernel"], ca["q_proj"]["bias"],
            ca["k_proj"]["kernel"], ca["k_proj"]["bias"],
            ca["v_proj"]["kernel"], ca["v_proj"]["bias"],
            ca["out_proj"]["kernel"], ca["out_proj"]["bias"],
            params["norm3"]["scale"], params["norm3"]["bias"],
            params["mlp"]["linear1"]["kernel"], params["mlp"]["linear1"]["bias"],
            params["mlp"]["linear2"]["kernel"], params["mlp"]["linear2"]["bias"])


class TestForward:
    def test_matches_flax_layer(self):
        layer, params, x, mem = setup()
        want = layer.apply({"params": params}, x, mem)
        fn = make_decoder_layer_fn(H, block_rows=3, interpret=True)
        got = fn(x, mem, *flat_weights(params))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_block_sizes_agree(self):
        _, params, x, mem = setup(n=8)
        w = flat_weights(params)
        outs = [np.asarray(make_decoder_layer_fn(H, block_rows=r,
                                                 interpret=True)(x, mem, *w))
                for r in (2, 4, 8)]
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(outs[0], outs[2], rtol=1e-5, atol=1e-5)

    def test_indivisible_batch_shrinks_block(self):
        _, params, x, mem = setup(n=5)
        fn = make_decoder_layer_fn(H, block_rows=4, interpret=True)
        assert fn(x, mem, *flat_weights(params)).shape == (5, T, E)

    def test_aligned_chunk_rows(self):
        """Tp == T (no padding) also lowers and matches."""
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((4, 16, E)).astype(np.float32))
        mem = jnp.asarray(rng.standard_normal((4, S, E)).astype(np.float32))
        layer = TransformerDecoderLayer(E, H)
        params = layer.init(jax.random.key(1), x, mem)["params"]
        want = layer.apply({"params": params}, x, mem)
        got = make_decoder_layer_fn(H, block_rows=2, interpret=True)(
            x, mem, *flat_weights(params))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


class TestGradients:
    def test_grads_match_autodiff(self):
        """d(loss)/d(x, memory, every weight) vs jax.grad through the flax
        layer — including the padded-chunk-row handling (T=10 -> Tp=16)."""
        layer, params, x, mem = setup(n=4, seed=3)
        cot = jnp.asarray(
            np.random.default_rng(9).standard_normal((4, T, E)).astype(np.float32))

        def loss_ref(params, x, mem):
            return jnp.sum(layer.apply({"params": params}, x, mem) * cot)

        want_dp, want_dx, want_dmem = jax.grad(
            loss_ref, argnums=(0, 1, 2))(params, x, mem)

        fn = make_decoder_layer_fn(H, block_rows=2, interpret=True)

        def loss_fused(weights, x, mem):
            return jnp.sum(fn(x, mem, *weights) * cot)

        got_dw, got_dx, got_dmem = jax.grad(
            loss_fused, argnums=(0, 1, 2))(flat_weights(params), x, mem)

        np.testing.assert_allclose(np.asarray(got_dx), np.asarray(want_dx),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(got_dmem), np.asarray(want_dmem),
                                   rtol=2e-3, atol=2e-3)
        want_dw = flat_weights(want_dp)
        for got, want, name in zip(
                got_dw, want_dw,
                ("g1", "be1", "wqkv", "bqkv", "wso", "bso", "g2", "be2",
                 "wcq", "bcq", "wck", "bck", "wcv", "bcv", "wco", "bco",
                 "g3", "be3", "w1", "b1", "w2", "b2")):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3,
                err_msg=f"gradient mismatch for {name}")


class TestModule:
    def test_module_matches_plain_layer(self):
        """FusedTransformerDecoderLayer has the identical param tree and
        output as TransformerDecoderLayer (training path)."""
        layer, params, x, mem = setup(n=4, seed=5)
        fused = FusedTransformerDecoderLayer(E, H, interpret=True)
        fused_params = fused.init(jax.random.key(2), x, mem)["params"]
        assert jax.tree.structure(fused_params) == jax.tree.structure(params)
        want = layer.apply({"params": params}, x, mem)
        got = fused.apply({"params": params}, x, mem)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_serving_kv_fallback_matches(self):
        """The cached-K/V serving path (plain-math fallback on the same
        params) matches the plain layer given the same precomputed K/V."""
        layer, params, x, mem = setup(n=4, seed=6)
        kv = layer.apply({"params": params}, mem, method=layer.compute_memory_kv)
        want = layer.apply({"params": params}, x, None, kv)
        fused = FusedTransformerDecoderLayer(E, H, interpret=True)
        kv2 = fused.apply({"params": params}, mem, method=fused.compute_memory_kv)
        np.testing.assert_allclose(np.asarray(kv2[0]), np.asarray(kv[0]),
                                   rtol=1e-5, atol=1e-5)
        got = fused.apply({"params": params}, x, None, kv)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_memory_none_degenerates_to_self(self):
        layer, params, x, _ = setup(n=2, seed=7)
        want = layer.apply({"params": params}, x, None)
        fused = FusedTransformerDecoderLayer(E, H, interpret=True)
        got = fused.apply({"params": params}, x, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


class TestPolicyWiring:
    def test_policy_forward_and_grads_match(self):
        """DiffusionPolicy with decoder_fused_block=True matches the plain
        model (same params) in forward and train-style gradients."""
        import dataclasses

        from soccerdiffusion_tpu.config import ModelConfig
        from soccerdiffusion_tpu.models import DiffusionPolicy

        cfg = ModelConfig(
            hidden_dim=32, num_joints=4, action_context_length=12,
            joint_state_context_length=12, imu_context_length=12,
            trajectory_prediction_length=10, use_images=False,
            num_action_history_encoder_layers=1, num_imu_encoder_layers=1,
            joint_state_encoder_layers=1, num_decoder_layers=2,
        )
        rng = np.random.default_rng(11)
        b = 3
        batch = {
            "joint_command_history": jnp.asarray(
                rng.standard_normal((b, 12, 4)).astype(np.float32)),
            "joint_state": jnp.asarray(
                rng.standard_normal((b, 12, 4)).astype(np.float32)),
            "rotation": jnp.asarray(
                rng.standard_normal((b, 12, 4)).astype(np.float32)),
            "game_state": jnp.zeros((b,), jnp.int32),
        }
        noisy = jnp.asarray(rng.standard_normal((b, 10, 4)).astype(np.float32))
        t = jnp.asarray([3, 77, 500])

        plain = DiffusionPolicy(cfg)
        fused = DiffusionPolicy(
            dataclasses.replace(cfg, decoder_fused_block=True,
                                decoder_fused_block_rows=2))
        params = plain.init(jax.random.key(0), batch, noisy, t)["params"]
        want = plain.apply({"params": params}, batch, noisy, t)
        got = fused.apply({"params": params}, batch, noisy, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-4, atol=5e-4)

        def loss(model):
            def f(p):
                out = model.apply({"params": p}, batch, noisy, t)
                return jnp.mean(jnp.square(out))
            return f

        from jax.flatten_util import ravel_pytree

        g_plain = jax.grad(loss(plain))(params)
        g_fused = jax.grad(loss(fused))(params)
        flat_p, _ = ravel_pytree(g_plain)
        flat_f, _ = ravel_pytree(g_fused)
        np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_p),
                                   rtol=5e-3, atol=5e-3)
