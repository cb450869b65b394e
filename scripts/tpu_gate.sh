#!/bin/sh
# Pre-commit gate: CPU-mesh suite + on-chip TPU tier (+ bench smoke).
# The TPU tier self-skips when no chip is attached.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -x -q
python -m pytest tests_tpu/ -x -q
