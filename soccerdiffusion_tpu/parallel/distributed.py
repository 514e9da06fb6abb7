"""Multi-host (multi-slice) runtime initialization.

Single-slice training needs none of this — `make_mesh` over local devices
covers a v5e-8. Past one host, call ``initialize_distributed()`` once per
process before any other JAX call: gradient all-reduce then rides ICI
within a slice and DCN across slices, still expressed purely through
shardings (SURVEY.md §5.8 replacement plan).
"""

from __future__ import annotations

import os

import jax

from soccerdiffusion_tpu import logger


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Wrapper over ``jax.distributed.initialize``.

    With no arguments, relies on the TPU environment's auto-bootstrap
    (GKE/queued resources set the coordinator env vars). No-op when the
    environment describes a single process.
    """
    explicit = coordinator_address is not None
    auto = any(
        v in os.environ
        for v in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS")
    )
    if not explicit and not auto:
        logger.info("single-process run; skipping jax.distributed.initialize")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        f"distributed initialized: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )


def global_mesh(shape: dict[str, int] | None = None):
    """Mesh over ALL processes' devices (data axis spans hosts)."""
    from soccerdiffusion_tpu.parallel.mesh import make_mesh

    return make_mesh(shape, devices=jax.devices())
