#!/bin/sh
# Pre-commit gate: CPU-mesh suite + on-chip TPU tier + BOTH driver contracts
# (multi-chip dryrun on virtual CPU devices, headline bench on the chip).
# The TPU tier self-skips when no chip is attached.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -x -q
python -m pytest tests_tpu/ -x -q
JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python __graft_entry__.py
python bench.py --headline-only
