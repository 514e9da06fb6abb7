"""Checkpointing with the reference's embedded-hyperparams contract.

The reference saves ``{model_state_dict, optimizer_state_dict,
lr_scheduler_state_dict, hyperparams, current_epoch}`` per epoch
(reference train.py:242-250) so inference can rebuild the exact architecture
from the checkpoint alone (reference ros.py:54-57). Here the same contract is
kept as a directory:

  <path>/state.msgpack     params / batch_stats / opt_state / norm / step
  <path>/hyperparams.json  the flat reference-key hyperparameter dict + epoch

msgpack (flax.serialization) keeps the format dependency-free and
byte-stable; checkpoints are written atomically via a temp dir rename.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
from flax import serialization

from soccerdiffusion_tpu.data.normalizer import Normalizer


def save_checkpoint(
    path: str | Path,
    state,
    normalizer: Normalizer,
    hyperparams: dict[str, Any],
    epoch: int,
) -> None:
    path = Path(path)
    tmp = path.with_name(path.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)

    host_state = jax.device_get(
        {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "norm": {"mean": normalizer.mean, "std": normalizer.std},
        }
    )
    # to_state_dict flattens optax namedtuples into msgpack-safe dicts.
    (tmp / "state.msgpack").write_bytes(
        serialization.msgpack_serialize(serialization.to_state_dict(host_state))
    )
    (tmp / "hyperparams.json").write_text(
        json.dumps({"hyperparams": hyperparams, "current_epoch": epoch}, indent=2)
    )
    if path.exists():
        shutil.rmtree(path)
    os.replace(tmp, path)


def load_checkpoint(path: str | Path, state_template=None) -> dict[str, Any]:
    """Returns {state, norm: Normalizer, hyperparams, current_epoch}.

    With ``state_template`` (a TrainState from ``create_train_state``), the
    raw state dict is restored into its exact pytree structure (optax
    namedtuples included); otherwise the raw nested dict is returned.
    """
    path = Path(path)
    raw = serialization.msgpack_restore((path / "state.msgpack").read_bytes())
    meta = json.loads((path / "hyperparams.json").read_text())
    norm = Normalizer(
        mean=np.asarray(raw["norm"]["mean"]), std=np.asarray(raw["norm"]["std"])
    )
    state: Any = raw
    if state_template is not None:
        template = {
            "step": state_template.step,
            "params": state_template.params,
            "batch_stats": state_template.batch_stats,
            "opt_state": state_template.opt_state,
        }
        restored = serialization.from_state_dict(
            template, {k: raw[k] for k in template}
        )
        state = state_template.replace(**restored)
    return {
        "state": state,
        "norm": norm,
        "hyperparams": meta["hyperparams"],
        "current_epoch": meta["current_epoch"],
    }
