#!/bin/bash
# Test entry point: force the CPU backend with 8 virtual devices BEFORE any
# jax import (a pytest plugin may import jax before conftest.py runs).
export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS}"
exec python -m pytest "${@:-tests/}" -q
