"""Test harness: force the CPU backend with 8 virtual devices so multi-chip
sharding is exercised without TPU hardware (the reference faked distribution
with mocks, test_eval_hook.py:129-169 — we run the real SPMD program on
virtual devices).

This environment pre-imports jax and registers the TPU PJRT plugin in every
python process via sitecustomize, overriding JAX_PLATFORMS; only
``jax.config.update`` reliably forces CPU. Also: exactly one process can
hold the TPU at a time, so tests MUST stay off it.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
