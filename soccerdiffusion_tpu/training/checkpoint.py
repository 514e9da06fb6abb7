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
import jax.numpy as jnp
import numpy as np
from flax import serialization

from soccerdiffusion_tpu.data.normalizer import Normalizer


def save_checkpoint(
    path: str | Path,
    state,
    normalizer: Normalizer,
    hyperparams: dict[str, Any],
    epoch: int,
    backend: str = "msgpack",
) -> None:
    if backend == "orbax":
        return _save_checkpoint_orbax(path, state, normalizer, hyperparams, epoch)
    path = Path(path)
    tmp = path.with_name(path.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)

    host_state_dict = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "norm": {"mean": normalizer.mean, "std": normalizer.std},
    }
    # EMA rides in the checkpoint only when enabled, keeping the on-disk
    # format of non-EMA runs byte-identical to earlier releases.
    if getattr(state, "ema_params", None):
        host_state_dict["ema_params"] = state.ema_params
    host_state = jax.device_get(host_state_dict)
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
    meta = json.loads((path / "hyperparams.json").read_text())
    if meta.get("backend") == "orbax":
        return _load_checkpoint_orbax(path, state_template)
    raw = serialization.msgpack_restore((path / "state.msgpack").read_bytes())
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
        if raw.get("ema_params"):
            # structure-identical to params, so params is the template
            state = state.replace(ema_params=serialization.from_state_dict(
                state_template.params, raw["ema_params"]))
        elif getattr(state_template, "ema_params", None):
            # EMA newly enabled on resume from a non-EMA checkpoint:
            # seed the average from the restored params, not the init
            state = state.replace(
                ema_params=jax.tree.map(jnp.copy, state.params))
    return {
        "state": state,
        "norm": norm,
        "hyperparams": meta["hyperparams"],
        "current_epoch": meta["current_epoch"],
    }


def load_policy_checkpoint(path: str | Path,
                           prefer_ema: bool = True) -> tuple[dict, dict, Any, int, bool]:
    """Load a checkpoint for INFERENCE/EVAL: the single source of truth for
    how a checkpoint's sampler operating point is decoded.

    Returns ``(hyperparams, variables, normalizer, steps, distilled)``:
      * ``variables`` — ``{"params": ..., ["batch_stats": ...]}`` apply-ready
      * ``steps`` — the checkpoint's inference step count: few-step students
        carry ``distilled_num_steps`` (training/distill.py --student-steps);
        reference-style 1-step students carry only ``distilled_decoder``
        (reference ml/training/distill.py:49); teachers sample at the step
        count their students were distilled against
        (``distill_teacher_inference_steps``, default 30 — reference
        ml/inference/ros.py:301-310 samples with exactly this count).
      * ``distilled`` — the ``distilled_decoder`` flag (t=0 single forward).

    Shared by evaluation/report.py and cli serve so the step count a
    checkpoint is EVALUATED at is the one it is SERVED at.
    """
    ckpt = load_checkpoint(path)
    params = ckpt["hyperparams"]
    # A checkpoint carrying an EMA tree is SERVED with the EMA weights —
    # the reference's policy for its ema_pytorch checkpoints (reference
    # utils/embed_parameters.py:50-62 extracts the EMA model for serving).
    # ``prefer_ema=False`` serves the raw params (EMA-vs-raw ablations).
    weights = (ckpt["state"].get("ema_params") if prefer_ema else None) \
        or ckpt["state"]["params"]
    variables: dict = {"params": weights}
    if ckpt["state"].get("batch_stats"):
        variables["batch_stats"] = ckpt["state"]["batch_stats"]
    distilled = bool(params.get("distilled_decoder", False))
    steps = int(params.get("distilled_num_steps", 0)) or (
        1 if distilled
        else int(params.get("distill_teacher_inference_steps", 30)))
    return params, variables, ckpt["norm"], steps, distilled


# ---------------------------------------------------------------------------
# Orbax backend (async, multi-host-capable)
# ---------------------------------------------------------------------------

_ORBAX_CHECKPOINTER = None


def _orbax_checkpointer():
    """Process-wide async checkpointer (waits are per-save)."""
    global _ORBAX_CHECKPOINTER
    if _ORBAX_CHECKPOINTER is None:
        import orbax.checkpoint as ocp

        _ORBAX_CHECKPOINTER = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ORBAX_CHECKPOINTER


def _save_checkpoint_orbax(path, state, normalizer, hyperparams, epoch) -> None:
    """Async Orbax save of the array state; hyperparams ride alongside as
    JSON (same embedded-hyperparams contract). The previous async save is
    awaited before starting a new one."""
    path = Path(path).resolve()
    ckpt = _orbax_checkpointer()
    ckpt.wait_until_finished()
    arrays = {
        "step": state.step,
        "params": state.params,
        "batch_stats": dict(state.batch_stats) if state.batch_stats else {},
        "opt_state": serialization.to_state_dict(state.opt_state),
        "norm": {"mean": normalizer.mean, "std": normalizer.std},
    }
    if getattr(state, "ema_params", None):
        arrays["ema_params"] = state.ema_params
    array_dir = path / "arrays"
    if array_dir.exists():
        shutil.rmtree(array_dir)
    path.mkdir(parents=True, exist_ok=True)
    ckpt.save(array_dir, arrays)
    (path / "hyperparams.json").write_text(
        json.dumps({"hyperparams": hyperparams, "current_epoch": epoch,
                    "backend": "orbax"}, indent=2)
    )


def wait_for_async_saves() -> None:
    """Block until any in-flight orbax save has landed (call before exit)."""
    if _ORBAX_CHECKPOINTER is not None:
        _ORBAX_CHECKPOINTER.wait_until_finished()


def _load_checkpoint_orbax(path: Path, state_template=None) -> dict[str, Any]:
    import orbax.checkpoint as ocp

    wait_for_async_saves()
    meta = json.loads((path / "hyperparams.json").read_text())
    restored = ocp.StandardCheckpointer().restore(path.resolve() / "arrays")
    norm = Normalizer(
        mean=np.asarray(restored["norm"]["mean"]), std=np.asarray(restored["norm"]["std"])
    )
    state: Any = restored
    if state_template is not None:
        template = {
            "step": state_template.step,
            "params": state_template.params,
            "batch_stats": state_template.batch_stats,
            "opt_state": state_template.opt_state,
        }
        pieces = serialization.from_state_dict(
            template,
            {
                "step": restored["step"],
                "params": restored["params"],
                "batch_stats": restored.get("batch_stats") or {},
                "opt_state": restored["opt_state"],
            },
        )
        state = state_template.replace(**pieces)
        if restored.get("ema_params"):
            state = state.replace(ema_params=serialization.from_state_dict(
                state_template.params, restored["ema_params"]))
        elif getattr(state_template, "ema_params", None):
            state = state.replace(
                ema_params=jax.tree.map(jnp.copy, state.params))
    return {
        "state": state,
        "norm": norm,
        "hyperparams": meta["hyperparams"],
        "current_epoch": meta["current_epoch"],
    }
