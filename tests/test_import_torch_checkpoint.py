"""Reference-checkpoint import: torch .pth (standard + legacy EMA) -> native
checkpoint that reproduces the torch model's outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from soccerdiffusion_tpu.config import ModelConfig
from soccerdiffusion_tpu.models import DiffusionPolicy
from soccerdiffusion_tpu.training.checkpoint import load_checkpoint
from soccerdiffusion_tpu.utils.import_torch_checkpoint import (
    convert,
    extract_ema_state_dict,
    main,
)
from tests.test_policy import PROPRIO, TorchReferencePolicy, make_batch


def make_reference_pth(tmp_path, ema=False):
    cfg = ModelConfig(**PROPRIO)
    torch.manual_seed(11)
    tmodel = TorchReferencePolicy(cfg)
    sd = {
        k.replace("game_state_encoder_embedding", "game_state_encoder.embedding"): v
        for k, v in tmodel.state_dict().items()
    }
    hp = dict(PROPRIO)
    if ema:
        ckpt = {f"ema_model.{k}": v for k, v in sd.items()}
        ckpt["initted"] = torch.tensor(True)
        ckpt["step"] = torch.tensor(100)
        path = tmp_path / "legacy_ema.pth"
        torch.save(ckpt, path)
    else:
        path = tmp_path / "ref.pth"
        torch.save({"model_state_dict": sd, "hyperparams": hp, "current_epoch": 4}, path)
    return path, tmodel, cfg, hp


class TestImport:
    def test_standard_checkpoint_roundtrip(self, tmp_path, rng):
        path, tmodel, cfg, hp = make_reference_pth(tmp_path)
        out = tmp_path / "native.ckpt"
        main([str(path), "-o", str(out)])

        ckpt = load_checkpoint(out)
        assert ckpt["hyperparams"]["hidden_dim"] == 16
        assert ckpt["current_epoch"] == 4

        model = DiffusionPolicy(cfg)
        batch = make_batch(rng)
        noisy = rng.standard_normal((2, 5, 6)).astype(np.float32)
        steps = np.array([10, 50], dtype=np.int64)
        tmodel.eval()
        with torch.no_grad():
            expected = tmodel(
                {k: torch.tensor(np.asarray(v)) if k != "game_state"
                 else torch.tensor(np.asarray(v), dtype=torch.long)
                 for k, v in batch.items()},
                torch.tensor(noisy), torch.tensor(steps),
            )
        got = model.apply(
            {"params": jax.tree.map(jnp.asarray, ckpt["state"]["params"])},
            batch, jnp.asarray(noisy), jnp.asarray(steps),
        )
        np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=5e-4, atol=1e-5)

    def test_legacy_ema_checkpoint(self, tmp_path, rng):
        path, tmodel, cfg, hp = make_reference_pth(tmp_path, ema=True)
        import yaml

        cfg_path = tmp_path / "cfg.yaml"
        cfg_path.write_text(yaml.safe_dump(hp))
        out = tmp_path / "native.ckpt"
        main([str(path), "-o", str(out), "--hyperparams", str(cfg_path)])
        ckpt = load_checkpoint(out)
        assert "params" in ckpt["state"]

    def test_extract_ema_rejects_non_ema(self):
        try:
            extract_ema_state_dict({"foo": 1})
            assert False, "should raise"
        except ValueError:
            pass

    def test_convert_requires_hyperparams(self):
        try:
            convert({"some_weight": torch.zeros(1)})
            assert False, "should raise"
        except ValueError as e:
            assert "hyperparams" in str(e)


def make_torchvision_resnet18_sd():
    """Synthesize a resnet18 state dict with torchvision's exact key layout
    (torchvision is not installed in CI; shapes follow the standard
    architecture the reference instantiates, ml/model/encoder/image.py:64)."""
    torch.manual_seed(3)
    sd = {}

    # realistic magnitudes (fan-in scaled convs) so a forward pass through
    # all 8 blocks stays finite
    def conv(*shape):
        fan_in = shape[1] * shape[2] * shape[3]
        return torch.randn(*shape) / fan_in**0.5

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = 1.0 + 0.1 * torch.randn(c)
        sd[f"{prefix}.bias"] = 0.1 * torch.randn(c)
        sd[f"{prefix}.running_mean"] = 0.1 * torch.randn(c)
        sd[f"{prefix}.running_var"] = torch.rand(c) + 0.5
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(100)

    sd["conv1.weight"] = conv(64, 3, 7, 7)
    bn("bn1", 64)
    in_c = 64
    for stage, (blocks, width) in enumerate(zip((2, 2, 2, 2), (64, 128, 256, 512))):
        for i in range(blocks):
            p = f"layer{stage + 1}.{i}"
            stride_in = in_c if i == 0 else width
            sd[f"{p}.conv1.weight"] = conv(width, stride_in, 3, 3)
            bn(f"{p}.bn1", width)
            sd[f"{p}.conv2.weight"] = conv(width, width, 3, 3)
            bn(f"{p}.bn2", width)
            if i == 0 and stage > 0:
                sd[f"{p}.downsample.0.weight"] = conv(width, in_c, 1, 1)
                bn(f"{p}.downsample.1", width)
        in_c = width
    sd["fc.weight"] = torch.randn(1000, 512)
    sd["fc.bias"] = torch.randn(1000)
    return sd


class TestPretrainedBackbone:
    def test_apply_pretrained_backbone(self, tmp_path):
        from soccerdiffusion_tpu.training.trainer import create_train_state, make_optimizer
        from soccerdiffusion_tpu.utils.torch_port import apply_pretrained_backbone

        sd = make_torchvision_resnet18_sd()
        pth = tmp_path / "resnet18-imagenet.pth"
        torch.save(sd, pth)

        cfg = ModelConfig(
            num_joints=8, hidden_dim=16, trajectory_prediction_length=5,
            action_context_length=10, joint_state_context_length=10,
            imu_context_length=10, use_images=True,
            image_encoder_type="resnet18", image_sequence_encoder_type="transformer",
            image_context_length=2, image_resolution=32,
            num_action_history_encoder_layers=1, num_imu_encoder_layers=1,
            joint_state_encoder_layers=1, num_decoder_layers=1,
        )
        model = DiffusionPolicy(cfg)
        rng = np.random.default_rng(0)
        batch = make_batch(rng, b=2, cfg=cfg)
        batch["image_data"] = jnp.asarray(
            rng.random((2, cfg.image_context_length, 32, 32, 3), dtype=np.float32))
        batch["game_state"] = jnp.zeros((2,), jnp.int32)
        state = create_train_state(
            model, batch, make_optimizer(1e-4, 10), jax.random.key(0),
            cfg.trajectory_prediction_length, cfg.num_joints,
        )
        fresh_fc = np.asarray(
            state.params["image_sequence_encoder"]["image_encoder"]["fc"]["kernel"])

        state = apply_pretrained_backbone(state, cfg, str(pth))
        enc = state.params["image_sequence_encoder"]["image_encoder"]
        # conv1: torch (out,in,kh,kw) -> flax (kh,kw,in,out)
        np.testing.assert_allclose(
            np.asarray(enc["conv1"]["kernel"]),
            sd["conv1.weight"].numpy().transpose(2, 3, 1, 0))
        np.testing.assert_allclose(
            np.asarray(enc["layer3_0"]["downsample_conv"]["kernel"]),
            sd["layer3.0.downsample.0.weight"].numpy().transpose(2, 3, 1, 0))
        stats = state.batch_stats["image_sequence_encoder"]["image_encoder"]
        np.testing.assert_allclose(
            np.asarray(stats["layer4_1"]["bn2"]["mean"]),
            sd["layer4.1.bn2.running_mean"].numpy())
        # the replaced head keeps its fresh init (reference image.py:69-83)
        np.testing.assert_allclose(np.asarray(enc["fc"]["kernel"]), fresh_fc)

        # the merged tree still runs a forward pass
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, jnp.zeros((2, 5, 8)), jnp.zeros((2,), jnp.int32), False,
        )
        assert np.isfinite(np.asarray(out)).all()
