#!/usr/bin/env bash
# Sanitizer tier for the native HEM library (SURVEY §5.2).
#
# Builds native/hem.cpp + the standalone driver twice — AddressSanitizer +
# UBSan, then ThreadSanitizer (the OpenMP `parallel for` regions are the only
# shared-memory parallelism in the framework outside XLA) — and runs the
# randomized driver under each. Any report is fatal (halt_on_error).
#
# Usage: scripts/native_sanitize.sh
set -euo pipefail
cd "$(dirname "$0")/../native"

BUILD=$(mktemp -d /tmp/gsr_sanitize.XXXXXX)
trap 'rm -rf "$BUILD"' EXIT

echo "== ASan + UBSan =="
g++ -O1 -g -fno-omit-frame-pointer -fopenmp \
    -fsanitize=address,undefined -fno-sanitize-recover=all \
    hem.cpp hem_sanitize_main.cpp -o "$BUILD/hem_asan"
ASAN_OPTIONS=detect_leaks=1 "$BUILD/hem_asan"

echo "== TSan =="
# TSan + libgomp: OMP barriers/reductions use futexes TSan can't model and
# would false-positive; the canonical mitigation is building the OpenMP
# program with TSan and suppressing the runtime itself.
g++ -O1 -g -fno-omit-frame-pointer -fopenmp \
    -fsanitize=thread \
    hem.cpp hem_sanitize_main.cpp -o "$BUILD/hem_tsan"
SUPP="$BUILD/tsan.supp"
printf 'race:^gomp_\nrace:libgomp.so\n' > "$SUPP"
TSAN_OPTIONS="halt_on_error=1 suppressions=$SUPP" "$BUILD/hem_tsan"

echo "SANITIZERS CLEAN"
