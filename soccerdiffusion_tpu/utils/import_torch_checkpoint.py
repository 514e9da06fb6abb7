"""Import a reference (torch) checkpoint into this framework's format.

Covers both checkpoint generations of the reference:

  * standard checkpoints ``{model_state_dict, hyperparams, ...}``
    (reference ml/training/train.py:242-250)
  * legacy EMA checkpoints wrapped by ``ema_pytorch.EMA`` whose weights live
    under ``ema_model.*`` (converted by reference utils/embed_parameters.py:
    50-62) — detected automatically, with ``--hyperparams config.yaml``
    supplying the architecture when the checkpoint has none embedded

Usage:
  python -m soccerdiffusion_tpu.utils.import_torch_checkpoint ref.pth -o out.ckpt
      [--hyperparams config.yaml]
"""

from __future__ import annotations

import argparse
from typing import Any, Mapping

import numpy as np

from soccerdiffusion_tpu import logger
from soccerdiffusion_tpu.config import Config
from soccerdiffusion_tpu.data.normalizer import Normalizer
from soccerdiffusion_tpu.utils import torch_port


def extract_ema_state_dict(sd: Mapping[str, Any]) -> dict[str, Any]:
    """Strip the ema_pytorch wrapper: keep ``ema_model.*`` keys
    (reference embed_parameters.py:50-54)."""
    out = {}
    for key, value in sd.items():
        if key.startswith("ema_model."):
            out[key[len("ema_model."):]] = value
    if not out:
        raise ValueError("no ema_model.* keys found; not an EMA checkpoint")
    # ema_pytorch adds bookkeeping buffers not part of the model.
    out.pop("initted", None)
    out.pop("step", None)
    return out


def convert(checkpoint: Mapping[str, Any], hyperparams: dict | None = None):
    """torch checkpoint dict -> (params, batch_stats, norm, hyperparams)."""
    if "model_state_dict" in checkpoint:
        sd = checkpoint["model_state_dict"]
        hyperparams = hyperparams or checkpoint.get("hyperparams")
    else:
        sd = checkpoint
    if any(k.startswith("ema_model.") for k in sd):
        logger.info("detected legacy EMA checkpoint; extracting ema_model weights")
        sd = extract_ema_state_dict(sd)
    if hyperparams is None:
        raise ValueError(
            "checkpoint embeds no hyperparams; pass --hyperparams config.yaml"
        )
    config = Config.from_dict(hyperparams)
    params, batch_stats, norm = torch_port.port_policy_state_dict(sd, config.model)
    return params, batch_stats, norm, dict(hyperparams)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Import a torch reference checkpoint")
    parser.add_argument("checkpoint", type=str)
    parser.add_argument("--output", "-o", type=str, required=True)
    parser.add_argument("--hyperparams", type=str, default=None,
                        help="YAML config if the checkpoint embeds none (legacy EMA)")
    args = parser.parse_args(argv)

    import torch

    raw = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
    hp = None
    if args.hyperparams:
        import yaml

        with open(args.hyperparams) as f:
            hp = yaml.safe_load(f)
    params, batch_stats, norm, hyperparams = convert(raw, hp)

    # Persist in the native checkpoint format (no optimizer state).
    from types import SimpleNamespace

    from soccerdiffusion_tpu.training.checkpoint import save_checkpoint

    state = SimpleNamespace(
        step=np.zeros((), np.int32), params=params, batch_stats=batch_stats,
        opt_state={},
    )
    normalizer = Normalizer(mean=np.asarray(norm["mean"]), std=np.asarray(norm["std"]))
    save_checkpoint(args.output, state, normalizer,
                    hyperparams, epoch=raw.get("current_epoch", 0) if isinstance(raw, dict) else 0)
    logger.info(f"imported -> {args.output}")


if __name__ == "__main__":
    main()
