#!/bin/bash
# CPU-only unit tests. PALLAS_AXON_POOL_IPS= skips the per-process TPU claim
# in sitecustomize (which serializes concurrent python processes).
PALLAS_AXON_POOL_IPS= exec python -m pytest tests/ -q "$@"
