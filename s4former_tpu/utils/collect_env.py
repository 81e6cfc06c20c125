"""Environment collection for run logs.

TPU-native analog of the reference's env dump (mmseg/utils/collect_env.py:
1-18 wraps mmcv's collect_env and appends the mmseg version+git hash;
tools/train.py:179-182 logs the table at startup). Instead of
CUDA/GCC/torch rows we report the JAX/XLA stack and the device roster.
"""
import os
import subprocess
import sys
from collections import OrderedDict


def _git_hash() -> str:
    try:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        out = subprocess.run(
            ['git', 'rev-parse', '--short=7', 'HEAD'], cwd=root,
            capture_output=True, text=True, timeout=5)
        return out.stdout.strip() or 'unknown'
    except Exception:
        return 'unknown'


def collect_env() -> 'OrderedDict[str, str]':
    """Collect the information of the running environment.

    Device enumeration touches the JAX backend, so call this AFTER any
    platform forcing (sitecustomize registers the TPU plugin in every
    process; see CLAUDE.md / utils.env).
    """
    import jax

    import s4former_tpu

    info: 'OrderedDict[str, str]' = OrderedDict()
    info['sys.platform'] = sys.platform
    info['Python'] = sys.version.replace('\n', '')
    info['jax'] = jax.__version__
    try:
        import jaxlib
        info['jaxlib'] = jaxlib.__version__
    except Exception:
        pass
    import importlib
    for mod in ('flax', 'optax', 'orbax.checkpoint', 'numpy'):
        try:
            m = importlib.import_module(mod)
            info[mod.split('.')[0]] = getattr(m, '__version__', '?')
        except Exception:
            pass
    try:
        devs = jax.devices()
        info['JAX backend'] = jax.default_backend()
        info['devices'] = f'{len(devs)}x {devs[0].device_kind}' if devs \
            else 'none'
        info['process_count'] = str(jax.process_count())
    except Exception as e:  # backend init can fail (e.g. tunnel down)
        info['JAX backend'] = f'unavailable ({type(e).__name__})'
    info['XLA_FLAGS'] = os.environ.get('XLA_FLAGS', '')
    info['compile cache'] = jax.config.jax_compilation_cache_dir or ''
    info['s4former_tpu'] = f'{s4former_tpu.__version__}+{_git_hash()}'
    return info


if __name__ == '__main__':
    for name, val in collect_env().items():
        print(f'{name}: {val}')
