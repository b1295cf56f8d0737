#!/bin/bash
# CPU-only unit tests. PALLAS_AXON_POOL_IPS= skips the per-process TPU claim
# in sitecustomize (which serializes concurrent python processes).
# Build the native C++ loader first so tests/test_native_dataload.py runs
# instead of skipping (the 2.7x-throughput claim stays guarded).
make -C "$(dirname "$0")/native/dataload" -s || echo "WARNING: native loader build failed; its tests will skip"
PALLAS_AXON_POOL_IPS= exec python -m pytest tests/ -q "$@"
