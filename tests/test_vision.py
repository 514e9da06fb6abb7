"""Vision encoder tests: shapes, head variants, swin windows, factory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soccerdiffusion_tpu.models.swin import (
    SwinImageEncoder,
    relative_position_index,
    shift_attn_mask,
    window_partition,
    window_unpartition,
)
from soccerdiffusion_tpu.models.vision import (
    ImageSequenceEncoder,
    ResNetImageEncoder,
    ViTImageEncoder,
    make_image_encoder,
)


class TestResNet:
    def test_resnet18_shapes_avgpool(self, rng):
        enc = ResNetImageEncoder(hidden_dim=32, use_final_avgpool=True)
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
        variables = enc.init(jax.random.key(0), x, train=False)
        out = enc.apply(variables, x, train=False)
        assert out.shape == (2, 32)
        assert "batch_stats" in variables

    def test_resnet18_spatial_head(self, rng):
        # reference image.py:81-83: avgpool replaced by 1x1 conv to 32ch.
        enc = ResNetImageEncoder(hidden_dim=16, use_final_avgpool=False)
        x = jnp.asarray(rng.standard_normal((1, 224, 224, 3)).astype(np.float32))
        variables = enc.init(jax.random.key(0), x, train=False)
        # final feature map for 224 input is 7x7 (reference output-size calc
        # image.py:76-83); spatial head = 7*7*32 -> hidden
        kernel = variables["params"]["fc"]["kernel"]
        assert kernel.shape == (7 * 7 * 32, 16)
        out = enc.apply(variables, x, train=False)
        assert out.shape == (1, 16)

    def test_batchnorm_updates_in_train_mode(self, rng):
        enc = ResNetImageEncoder(hidden_dim=8, use_final_avgpool=True)
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
        variables = enc.init(jax.random.key(0), x, train=True)
        _, mutated = enc.apply(variables, x, train=True, mutable=["batch_stats"])
        before = variables["batch_stats"]["bn1"]["mean"]
        after = mutated["batch_stats"]["bn1"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))


class TestViT:
    def test_shapes(self, rng):
        enc = ViTImageEncoder(hidden_dim=32, patch_size=8, width=64, depth=2)
        x = jnp.asarray(rng.standard_normal((3, 32, 32, 3)).astype(np.float32))
        variables = enc.init(jax.random.key(0), x)
        out = enc.apply(variables, x)
        assert out.shape == (3, 32)
        assert np.isfinite(np.asarray(out)).all()


class TestSwin:
    def test_window_partition_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
        back = window_unpartition(window_partition(x, 4), 4, 8, 8)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_relative_position_index_range(self):
        idx = relative_position_index(7)
        assert idx.shape == (49, 49)
        assert idx.min() >= 0 and idx.max() < 13 * 13

    def test_shift_mask_blocks_cross_region(self):
        mask = shift_attn_mask(8, 8, 4, 2)
        assert mask.shape == (4, 16, 16)
        assert (mask == 0).any() and (mask == -100.0).any()

    def test_swin_tiny_forward(self, rng):
        enc = SwinImageEncoder(hidden_dim=16, variant="tiny", embed_dim=24,
                               num_heads=(2, 2, 2, 2), window=4)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
        variables = enc.init(jax.random.key(0), x)
        out = enc.apply(variables, x)
        assert out.shape == (1, 16)
        assert np.isfinite(np.asarray(out)).all()


class TestFactoryAndSequence:
    @pytest.mark.parametrize("kind", ["resnet18", "resnet50", "vit", "swin_transformer_tiny"])
    def test_factory_builds(self, kind):
        enc = make_image_encoder(kind, hidden_dim=8, use_final_avgpool=True)
        assert enc is not None

    def test_factory_rejects_unknown(self):
        with pytest.raises(ValueError):
            make_image_encoder("nope", 8, True)

    def test_sequence_encoder_tokens(self, rng):
        enc = ImageSequenceEncoder(
            hidden_dim=16, encoder_type="vit", sequence_encoder_type="transformer",
            num_layers=1, max_seq_len=4,
        )
        x = jnp.asarray(rng.standard_normal((2, 4, 32, 32, 3)).astype(np.float32))
        variables = enc.init(jax.random.key(0), x)
        out = enc.apply(variables, x)
        assert out.shape == (2, 4, 16)

    def test_sequence_encoder_none_passthrough(self, rng):
        enc = ImageSequenceEncoder(
            hidden_dim=16, encoder_type="vit", sequence_encoder_type="none",
            num_layers=1, max_seq_len=4,
        )
        x = jnp.asarray(rng.standard_normal((1, 2, 32, 32, 3)).astype(np.float32))
        variables = enc.init(jax.random.key(0), x)
        assert enc.apply(variables, x).shape == (1, 2, 16)


class TestFoldedU8Path:
    def test_u8_folded_matches_float_path(self):
        """Raw-uint8 ViT path (normalization folded into patch-embed
        weights, invalid frames reset to the zero-image embedding) must
        match normalizing first and running the float path."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from soccerdiffusion_tpu.config import ModelConfig
        from soccerdiffusion_tpu.data.pipeline import device_normalize_images
        from soccerdiffusion_tpu.models import DiffusionPolicy

        cfg = ModelConfig(
            num_joints=8, hidden_dim=32, trajectory_prediction_length=10,
            action_context_length=10, joint_state_context_length=10,
            imu_context_length=10, use_images=True, image_encoder_type="vit",
            image_sequence_encoder_type="transformer", image_context_length=3,
            image_resolution=64, vit_patch_size=32, vit_width=64, vit_depth=2,
            use_gamestate=True, num_action_history_encoder_layers=1,
            num_imu_encoder_layers=1, joint_state_encoder_layers=1,
            num_decoder_layers=1)
        model = DiffusionPolicy(cfg)
        rng = np.random.default_rng(0)
        b = 2
        u8 = rng.integers(0, 255, (b, 3, 64, 64, 3), dtype=np.uint8)
        valid = np.array([[1, 1, 0], [0, 1, 1]], np.float32)
        base = {
            "joint_command_history": jnp.asarray(rng.random((b, 10, 8), dtype=np.float32)),
            "rotation": jnp.asarray(rng.random((b, 10, 4), dtype=np.float32)),
            "joint_state": jnp.asarray(rng.random((b, 10, 8), dtype=np.float32)),
            "game_state": jnp.zeros((b,), jnp.int32),
        }
        batch_f = dict(base, image_data=device_normalize_images(
            jnp.asarray(u8), jnp.asarray(valid)))
        batch_u8 = dict(base, image_u8=jnp.asarray(u8), image_valid=jnp.asarray(valid))
        variables = model.init(jax.random.key(0), batch_f,
                               jnp.zeros((b, 10, 8)), jnp.zeros((b,), jnp.int32))
        ctx_f = model.apply(variables, batch_f, method=model.encode_context)
        ctx_u = model.apply(variables, batch_u8, method=model.encode_context)
        np.testing.assert_allclose(np.asarray(ctx_f), np.asarray(ctx_u),
                                   atol=2e-4, rtol=2e-4)

    def test_u8_path_resnet_normalizes_in_encoder(self):
        """Non-ViT encoders take the u8 batch too (normalized in-jit)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from soccerdiffusion_tpu.config import ModelConfig
        from soccerdiffusion_tpu.data.pipeline import device_normalize_images
        from soccerdiffusion_tpu.models import DiffusionPolicy

        cfg = ModelConfig(
            num_joints=8, hidden_dim=32, trajectory_prediction_length=10,
            action_context_length=10, joint_state_context_length=10,
            imu_context_length=10, use_images=True,
            image_encoder_type="resnet18",
            image_sequence_encoder_type="none", image_context_length=2,
            image_resolution=32, use_gamestate=False,
            num_action_history_encoder_layers=1, num_imu_encoder_layers=1,
            joint_state_encoder_layers=1, num_decoder_layers=1)
        model = DiffusionPolicy(cfg)
        rng = np.random.default_rng(1)
        b = 2
        u8 = rng.integers(0, 255, (b, 2, 32, 32, 3), dtype=np.uint8)
        valid = np.ones((b, 2), np.float32)
        base = {
            "joint_command_history": jnp.asarray(rng.random((b, 10, 8), dtype=np.float32)),
            "rotation": jnp.asarray(rng.random((b, 10, 4), dtype=np.float32)),
            "joint_state": jnp.asarray(rng.random((b, 10, 8), dtype=np.float32)),
        }
        batch_f = dict(base, image_data=device_normalize_images(
            jnp.asarray(u8), jnp.asarray(valid)))
        batch_u8 = dict(base, image_u8=jnp.asarray(u8), image_valid=jnp.asarray(valid))
        variables = model.init(jax.random.key(0), batch_f,
                               jnp.zeros((b, 10, 8)), jnp.zeros((b,), jnp.int32))
        ctx_f = model.apply(variables, batch_f, train=False,
                            method=model.encode_context)
        ctx_u = model.apply(variables, batch_u8, train=False,
                            method=model.encode_context)
        np.testing.assert_allclose(np.asarray(ctx_f), np.asarray(ctx_u),
                                   atol=1e-5, rtol=1e-5)


class TestConvOnlyRemat:
    """remat_image_encoder='conv_only': selective remat that saves the conv
    outputs (checkpoint_name 'conv_out') and recomputes only the BN/ReLU
    chain — the round-5 ResNet MFU lever. Must be numerically identical to
    the no-remat and full-remat paths (remat never changes math)."""

    def _loss_and_grads(self, remat, x, train=True):
        enc = make_image_encoder("resnet18", 16, True, jnp.float32,
                                 remat=remat)
        variables = enc.init(jax.random.key(0), x, False)

        def loss_fn(params):
            out, _ = enc.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train, mutable=["batch_stats"] if train else [])
            return jnp.sum(out ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        return float(loss), grads

    def test_matches_full_and_none(self):
        x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3),
                                                        dtype=np.float32))
        l_none, g_none = self._loss_and_grads(False, x)
        l_conv, g_conv = self._loss_and_grads("conv_only", x)
        l_full, g_full = self._loss_and_grads(True, x)
        assert l_conv == pytest.approx(l_none, rel=1e-5)
        assert l_full == pytest.approx(l_none, rel=1e-5)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
            g_conv, g_none)

    def test_conv_only_rejected_for_vit(self):
        with pytest.raises(ValueError, match="conv_only"):
            make_image_encoder("vit", 16, True, jnp.float32,
                               remat="conv_only")


class TestSavedStatsBatchNorm:
    def test_bit_identical_to_flax_batchnorm(self):
        """Same math, params, batch_stats as nn.BatchNorm in both modes —
        the checkpoint_name tag must be the ONLY difference."""
        from flax import linen as nn

        from soccerdiffusion_tpu.models.vision import SavedStatsBatchNorm

        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(4, 8, 8, 16)).astype(np.float32))
        ref = nn.BatchNorm(use_running_average=None, momentum=0.9,
                           epsilon=1e-5)
        new = SavedStatsBatchNorm(use_running_average=None, momentum=0.9,
                                  epsilon=1e-5)
        v_ref = ref.init(jax.random.key(0), x, False)
        v_new = new.init(jax.random.key(0), x, False)
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                     v_ref, v_new)
        y_ref, m_ref = ref.apply(v_ref, x, False, mutable=["batch_stats"])
        y_new, m_new = new.apply(v_new, x, False, mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_new))
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                     m_ref, m_new)
        # eval mode on the updated running stats
        e_ref = ref.apply({**v_ref, **m_ref}, x, True)
        e_new = new.apply({**v_new, **m_new}, x, True)
        np.testing.assert_array_equal(np.asarray(e_ref), np.asarray(e_new))
