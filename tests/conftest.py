"""Test harness: force CPU with 8 virtual devices so multi-chip sharding is
exercised without TPU hardware (the reference faked distribution with mocks,
test_eval_hook.py:129-169 — we run the real SPMD program on virtual devices).
"""
import os

# override (the session env pins JAX_PLATFORMS to the TPU tunnel)
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
