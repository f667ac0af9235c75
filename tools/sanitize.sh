#!/usr/bin/env bash
# Run the native-ingest-exercising test legs against an ASan+UBSan build of
# libneedle_ingest.so. The reference gets memory safety from Rust; this is
# the C++ layer's equivalent artifact (SURVEY §5 sanitizers row).
#
# Usage: tools/sanitize.sh [extra pytest args]
#
# ASan must be loaded before libpython (the interpreter itself is not
# instrumented), hence LD_PRELOAD. detect_leaks=0: CPython's arena
# allocator "leaks" by design at interpreter exit; we are after
# buffer/UB errors in needle_ingest.cpp, not Python's shutdown profile.
set -euo pipefail
cd "$(dirname "$0")/.."

make -C native asan

LIBASAN="$(g++ -print-file-name=libasan.so)"
LIBUBSAN="$(g++ -print-file-name=libubsan.so)"

NEEDLE_TPU_INGEST_LIB="$PWD/native/libneedle_ingest_asan.so" \
LD_PRELOAD="$LIBASAN $LIBUBSAN" \
ASAN_OPTIONS="detect_leaks=0:abort_on_error=1:strict_string_checks=1" \
UBSAN_OPTIONS="print_stacktrace=1:halt_on_error=1" \
JAX_PLATFORMS=cpu \
python -m pytest tests/test_containers.py tests/test_ingest_exact.py \
    tests/test_mixed_media.py tests/test_end_to_end.py -q "$@"
