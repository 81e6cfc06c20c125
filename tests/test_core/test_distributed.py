"""Multi-host bootstrap tests (mocked env, like the reference's
tests/test_utils/test_util_distribution.py strategy: distributed wiring is
tested without a cluster)."""
import os
from unittest import mock

import pytest

from s4former_tpu.parallel.distributed import _first_host, init_distributed


def test_first_host_parsing():
    assert _first_host('node001') == 'node001'
    assert _first_host('n[001-004]') == 'n001'
    assert _first_host('n[007,012]') == 'n007'
    assert _first_host('gpu-a,gpu-b') == 'gpu-a'


def test_launcher_none_is_noop():
    assert init_distributed('none') is False
    assert init_distributed(None) is False


def test_unknown_launcher_raises():
    with pytest.raises(ValueError, match='unknown launcher'):
        init_distributed('pytorch')


def test_slurm_launcher_env_mapping():
    env = {'SLURM_NODELIST': 'tpu[042-043]', 'SLURM_NTASKS': '2',
           'SLURM_PROCID': '1'}
    with mock.patch.dict(os.environ, env), \
            mock.patch('jax.distributed.initialize') as init:
        assert init_distributed('slurm', coordinator_port=1234) is True
        init.assert_called_once_with(
            coordinator_address='tpu042:1234', num_processes=2,
            process_id=1)


def test_env_launcher_mapping():
    env = {'JAX_COORDINATOR_ADDRESS': 'h0:99', 'JAX_NUM_PROCESSES': '4',
           'JAX_PROCESS_ID': '3'}
    with mock.patch.dict(os.environ, env), \
            mock.patch('jax.distributed.initialize') as init:
        assert init_distributed('env') is True
        init.assert_called_once_with(coordinator_address='h0:99',
                                     num_processes=4, process_id=3)


def test_tpu_launcher_autodetect():
    with mock.patch('jax.distributed.initialize') as init:
        assert init_distributed('tpu') is True
        init.assert_called_once_with()
