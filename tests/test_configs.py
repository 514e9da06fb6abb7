"""Every shipped YAML config must load through Config.from_dict and pass
validation (guards config typos; the five reference-named configs mirror
/root/reference/soccer_diffusion/ml/training/config/*.yaml key names)."""

import glob
import os

import pytest
import yaml

from soccerdiffusion_tpu.config import Config

CFG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "soccerdiffusion_tpu", "training", "configs")
CONFIGS = sorted(glob.glob(os.path.join(CFG_DIR, "*.yaml")))


def test_configs_present():
    names = {os.path.basename(p) for p in CONFIGS}
    # the five reference configs + the TPU-native flagship + the
    # TPU-recommended reference-parity variant
    assert {"default.yaml", "larger_model.yaml", "sim_scratch.yaml",
            "decoder_only.yaml", "vit_flagship.yaml",
            "default_tpu.yaml"} <= names


@pytest.mark.parametrize("path", CONFIGS, ids=os.path.basename)
def test_config_loads_and_validates(path):
    with open(path) as f:
        params = yaml.safe_load(f)
    config = Config.from_dict(params)
    assert config.model.num_joints > 0
    assert config.train.batch_size > 0


def test_flagship_tpu_native_knobs():
    with open(os.path.join(CFG_DIR, "vit_flagship.yaml")) as f:
        cfg = Config.from_dict(yaml.safe_load(f)).model
    # the recorded 49.6%-MFU geometry (docs/perf_notes.md): tile-aligned
    # patch 28 (T=64), fused fwd+bwd blocks at frames=16, quick-GELU
    assert cfg.vit_patch_size == 28
    assert (cfg.image_resolution // cfg.vit_patch_size) ** 2 % 8 == 0
    assert cfg.vit_fused_block and cfg.vit_fused_block_frames == 16
    assert cfg.vit_fused_gelu == "quick"
    assert cfg.compute_dtype == "bfloat16"
    # the flat-remainder attack (81.8 -> 76.9 ms/step, perf_notes):
    # whole-stack fused proprio encoders + fused fwd+bwd decoder layer
    assert cfg.encoder_fused_stack
    assert cfg.decoder_fused_block


def test_default_tpu_is_default_architecture():
    """default_tpu.yaml must be ARCHITECTURALLY identical to default.yaml
    (checkpoints interchange); only the measured training-efficiency knobs
    differ (docs/perf_notes.md round-4 ResNet MFU ladder: bf16 + remat +
    B=128 -> 42.5%)."""
    with open(os.path.join(CFG_DIR, "default.yaml")) as f:
        ref = yaml.safe_load(f)
    with open(os.path.join(CFG_DIR, "default_tpu.yaml")) as f:
        tpu = yaml.safe_load(f)
    allowed = {"compute_dtype", "remat_image_encoder", "batch_size"}
    diff = {k for k in set(ref) | set(tpu) if ref.get(k) != tpu.get(k)}
    assert diff <= allowed, f"unexpected divergence from default.yaml: {diff}"
    assert tpu["compute_dtype"] == "bfloat16"
    assert tpu["remat_image_encoder"] == "conv_only"
    assert tpu["batch_size"] == 128
