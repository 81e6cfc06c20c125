"""Environment setup: persistent XLA compilation cache.

The build host's disk is slow (heavy IO-wait); caching compiled XLA
executables under the repo makes repeated test/bench runs cheap. Mirrors
the reference's cudnn_benchmark autotune-cache role
(reference: configs/_base_/default_runtime.py:97).
"""
import os


def apply_platform_override():
    """Honor ``S4_PLATFORM`` (e.g. ``cpu``) before first device use.

    This image's sitecustomize force-registers the remote-TPU PJRT
    plugin and stomps ``JAX_PLATFORMS``, so a plain env var cannot force
    the CPU backend; ``jax.config.update`` before backend init can.
    Lets every CLI tool run when the TPU tunnel is absent/stale
    (``S4_PLATFORM=cpu python tools/train.py ...``)."""
    plat = os.environ.get('S4_PLATFORM')
    if not plat:
        return
    try:
        import jax
        jax.config.update('jax_platforms', plat)
    except Exception:
        pass


def setup_compilation_cache(path: str = None):
    try:
        import jax
        cache = path or os.environ.get(
            'JAX_COMPILATION_CACHE_DIR',
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), '.jax_cache'))
        os.makedirs(cache, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
