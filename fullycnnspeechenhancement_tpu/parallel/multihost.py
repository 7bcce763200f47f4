"""Multi-host initialization and per-host input sharding glue.

The reference is strictly single-process (SURVEY.md SS2.3).  For pod
slices, JAX's runtime handles process grouping; this module wraps
`jax.distributed.initialize` with env-driven configuration and exposes the
host identity the data pipeline needs (each host reads every k-th manifest
entry -- `data.manifest.shard_for_host` -- and feeds only its local shard
of the global batch; XLA's SPMD partitioner handles everything on-device).

Enable with env FCSE_MULTIHOST=1 (coordinator/process counts resolve from
the standard JAX env vars or cloud TPU metadata), or call
`initialize_multihost` explicitly.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent jax.distributed.initialize with env fallbacks.

    NOTE: must run before anything initializes the XLA backend (jax
    requires distributed init first); the idempotency guard therefore uses
    `jax.distributed.is_initialized()`, which does NOT touch backends --
    `jax.process_count()` would initialize them and poison the init.
    """
    if jax.distributed.is_initialized():
        return  # already initialized
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"]
        )
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"]
        )
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None else os.environ["JAX_PROCESS_ID"]
        )
    try:
        jax.distributed.initialize(**kwargs)
        logger.info(
            "multi-host initialized: process %d/%d, %d local / %d global devices",
            jax.process_index(),
            jax.process_count(),
            jax.local_device_count(),
            jax.device_count(),
        )
    except Exception as e:  # noqa: BLE001
        if kwargs:
            # The pod was EXPLICITLY configured (args or JAX_* env): a
            # silent single-host fallback would train on 1/N of the data
            # with nobody noticing -- fail loudly instead.
            raise RuntimeError(
                f"jax.distributed.initialize({kwargs}) failed; refusing to "
                "fall back to single-host for an explicitly configured pod"
            ) from e
        # Auto-detection path (no explicit config): single host is the
        # expected outcome outside a pod.
        logger.warning("jax.distributed auto-init failed (%s); single host", e)


def maybe_initialize_from_env() -> None:
    if os.environ.get("FCSE_MULTIHOST") == "1":
        initialize_multihost()


def host_index() -> int:
    return jax.process_index()


def host_count() -> int:
    return jax.process_count()


def local_batch_size(global_batch: int) -> int:
    """Per-host slice of the global batch (must divide evenly)."""
    n = host_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    return global_batch // n
