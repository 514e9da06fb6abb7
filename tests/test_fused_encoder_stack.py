"""Fused L-layer encoder stack (interpret mode): forward parity vs the flax
stack, gradient parity vs autodiff (x and every stacked weight), padding
correctness, and the TransformerEncoder fused_stack wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.models.transformer import TransformerEncoder
from soccerdiffusion_tpu.ops.fused_encoder_stack import make_encoder_stack_fn

E, T, H, L = 64, 13, 4, 2  # T deliberately sublane-misaligned (pads to 16)


def setup(n=6, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, T, E)).astype(np.float32))
    enc = TransformerEncoder(E, H, L)
    params = enc.init(jax.random.key(0), x)["params"]
    return enc, params, x


def stacked_weights(params):
    """Plain per-layer param tree -> the kernel's stacked (L, ...) tensors."""
    def per_layer(f):
        return jnp.stack([f(params[f"layer_{i}"]) for i in range(L)])

    sa = lambda p: p["self_attn"]
    wqkv = per_layer(lambda p: jnp.concatenate(
        [sa(p)["q_proj"]["kernel"], sa(p)["k_proj"]["kernel"],
         sa(p)["v_proj"]["kernel"]], axis=1))
    bqkv = per_layer(lambda p: jnp.concatenate(
        [sa(p)["q_proj"]["bias"], sa(p)["k_proj"]["bias"],
         sa(p)["v_proj"]["bias"]]))
    return (per_layer(lambda p: p["norm1"]["scale"]),
            per_layer(lambda p: p["norm1"]["bias"]),
            wqkv, bqkv,
            per_layer(lambda p: sa(p)["out_proj"]["kernel"]),
            per_layer(lambda p: sa(p)["out_proj"]["bias"]),
            per_layer(lambda p: p["norm2"]["scale"]),
            per_layer(lambda p: p["norm2"]["bias"]),
            per_layer(lambda p: p["mlp"]["linear1"]["kernel"]),
            per_layer(lambda p: p["mlp"]["linear1"]["bias"]),
            per_layer(lambda p: p["mlp"]["linear2"]["kernel"]),
            per_layer(lambda p: p["mlp"]["linear2"]["bias"]))


class TestForward:
    def test_matches_flax_stack(self):
        enc, params, x = setup()
        want = enc.apply({"params": params}, x)
        fn = make_encoder_stack_fn(H, L, block_rows=3, interpret=True)
        got = fn(x, *stacked_weights(params))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_block_sizes_agree(self):
        _, params, x = setup(n=8)
        w = stacked_weights(params)
        outs = [np.asarray(make_encoder_stack_fn(H, L, block_rows=r,
                                                 interpret=True)(x, *w))
                for r in (2, 8)]
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)

    def test_aligned_rows_no_padding(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((4, 16, E)).astype(np.float32))
        enc = TransformerEncoder(E, H, L)
        params = enc.init(jax.random.key(1), x)["params"]
        want = enc.apply({"params": params}, x)
        got = make_encoder_stack_fn(H, L, block_rows=2, interpret=True)(
            x, *stacked_weights(params))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


class TestGradients:
    def test_grads_match_autodiff(self):
        enc, params, x = setup(n=4, seed=3)
        cot = jnp.asarray(
            np.random.default_rng(9).standard_normal((4, T, E)).astype(np.float32))

        def loss_ref(params, x):
            return jnp.sum(enc.apply({"params": params}, x) * cot)

        want_dp, want_dx = jax.grad(loss_ref, argnums=(0, 1))(params, x)

        fn = make_encoder_stack_fn(H, L, block_rows=2, interpret=True)

        def loss_fused(weights, x):
            return jnp.sum(fn(x, *weights) * cot)

        got_dw, got_dx = jax.grad(
            loss_fused, argnums=(0, 1))(stacked_weights(params), x)
        np.testing.assert_allclose(np.asarray(got_dx), np.asarray(want_dx),
                                   rtol=2e-3, atol=2e-3)
        want_dw = stacked_weights(want_dp)
        names = ("g1", "be1", "wqkv", "bqkv", "wo", "bo", "g2", "be2",
                 "w1", "b1", "w2", "b2")
        for got, want, name in zip(got_dw, want_dw, names):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3,
                err_msg=f"gradient mismatch for stacked {name}")


class TestWiring:
    def test_transformer_encoder_fused_stack_matches(self):
        """TransformerEncoder(fused_stack=True) has the identical param tree
        and output as the plain stack (training path), and its gradients
        flow to every layer's params."""
        enc, params, x = setup(n=4, seed=5)
        fused = TransformerEncoder(E, H, L, fused_stack=True,
                                   fused_block_frames=2,
                                   fused_interpret=True)
        fused_params = fused.init(jax.random.key(2), x)["params"]
        assert jax.tree.structure(fused_params) == jax.tree.structure(params)
        want = enc.apply({"params": params}, x)
        got = fused.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

        g = jax.grad(lambda p: jnp.sum(
            jnp.square(fused.apply({"params": p}, x))))(params)
        for leaf in jax.tree.leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf)))
        assert float(jnp.abs(g["layer_0"]["mlp"]["linear1"]["kernel"]).max()) > 0

    def test_image_seq_encoder_fused_stack_matches(self):
        """The frame-token sequence encoder honors the fused-stack knob
        (wired from encoder_fused_stack via ImageSequenceEncoder)."""
        from soccerdiffusion_tpu.models.encoders import SequenceEncoder

        rng = np.random.default_rng(8)
        tokens = jnp.asarray(rng.standard_normal((4, 10, E)).astype(np.float32))
        plain = SequenceEncoder(E, 1, 1, 8, 10)
        params = plain.init(jax.random.key(0), tokens)["params"]
        fused = SequenceEncoder(E, 1, 1, 8, 10, fused_stack=True,
                                fused_block_rows=2)
        want = plain.apply({"params": params}, tokens)
        got = fused.apply({"params": params}, tokens)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_policy_encoder_fused_stack_matches(self):
        import dataclasses

        from soccerdiffusion_tpu.config import ModelConfig
        from soccerdiffusion_tpu.models import DiffusionPolicy

        cfg = ModelConfig(
            hidden_dim=32, num_joints=4, action_context_length=13,
            joint_state_context_length=13, imu_context_length=13,
            trajectory_prediction_length=10, use_images=False,
            num_action_history_encoder_layers=2, num_imu_encoder_layers=2,
            joint_state_encoder_layers=2, num_decoder_layers=1,
        )
        rng = np.random.default_rng(11)
        b = 3
        batch = {
            "joint_command_history": jnp.asarray(
                rng.standard_normal((b, 13, 4)).astype(np.float32)),
            "joint_state": jnp.asarray(
                rng.standard_normal((b, 13, 4)).astype(np.float32)),
            "rotation": jnp.asarray(
                rng.standard_normal((b, 13, 4)).astype(np.float32)),
            "game_state": jnp.zeros((b,), jnp.int32),
        }
        noisy = jnp.asarray(rng.standard_normal((b, 10, 4)).astype(np.float32))
        t = jnp.asarray([3, 77, 50])
        plain = DiffusionPolicy(cfg)
        fused = DiffusionPolicy(
            dataclasses.replace(cfg, encoder_fused_stack=True,
                                encoder_fused_block_rows=2))
        params = plain.init(jax.random.key(0), batch, noisy, t)["params"]
        want = plain.apply({"params": params}, batch, noisy, t)
        got = fused.apply({"params": params}, batch, noisy, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-4, atol=5e-4)
