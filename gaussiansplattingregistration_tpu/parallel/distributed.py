"""Multi-host setup (SURVEY.md §2.9 "Multi-host / multi-node").

On a TPU pod slice, call `initialize()` once per process before any JAX use;
it wraps `jax.distributed.initialize` (coordinator discovery is automatic on
TPU pods). Single-process runs are a no-op. Failure recovery follows the
standard JAX model: a lost host fails the collective, the job restarts and
resumes from the latest checkpoint (utils/checkpoint.py) — SURVEY.md §5.3.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax

logger = logging.getLogger("gsr_tpu.distributed")

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-op if already initialized or single-host."""
    global _initialized
    if _initialized:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
        logger.info(
            "distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    except (RuntimeError, ValueError) as e:
        logger.info("distributed init skipped (%s); running single-process", e)


def is_primary() -> bool:
    """True on the process that should write logs/checkpoints."""
    return jax.process_index() == 0


def global_mesh(data: int = 1):
    """Mesh over ALL global devices (multi-host aware)."""
    from gaussiansplattingregistration_tpu.parallel.mesh import make_mesh

    return make_mesh(data=data, devices=jax.devices())
