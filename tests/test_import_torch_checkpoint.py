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
