"""soccerdiffusion_tpu — a TPU-native diffusion-policy framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
bit-bots/SoccerDiffusion (reference: /root/reference): multimodal conditional
diffusion transformers over robot action chunks, recording ingest, sampler
distillation, and batched closed-loop serving — built TPU-first (SPMD meshes,
functional transforms, fused kernels) rather than as a port.

Global constants mirror the reference's operating point
(reference soccer_diffusion/__init__.py:47-48).
"""

from __future__ import annotations

import logging
import os
import uuid

__version__ = "0.1.0"

# Operating-point constants (reference soccer_diffusion/__init__.py:47-48).
DEFAULT_RESAMPLE_RATE_HZ = 50
IMAGE_MAX_RESAMPLE_RATE_HZ = 10

# Env-overridable paths (reference soccer_diffusion/__init__.py:12-45).
LOGGING_PATH = os.environ.get("SOCCERDIFFUSION_TPU_LOG_DIR", os.path.join(os.getcwd(), "logs"))
DB_PATH = os.environ.get("SOCCERDIFFUSION_TPU_DB_PATH", os.path.join(os.getcwd(), "db.sqlite3"))

# Per-process session id stamped on every log line (reference __init__.py:41).
SESSION_ID = uuid.uuid4()

logger = logging.getLogger("soccerdiffusion_tpu")
if not logger.handlers:
    _handler = logging.StreamHandler()
    _handler.setFormatter(
        logging.Formatter(f"%(asctime)s [{str(SESSION_ID)[:8]}] %(name)s %(levelname)s: %(message)s")
    )
    logger.addHandler(_handler)
    logger.setLevel(os.environ.get("LOGLEVEL", "INFO").upper())
