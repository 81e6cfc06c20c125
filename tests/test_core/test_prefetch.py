"""_DevicePrefetcher: ordering, exception forwarding, shutdown."""
import time

import pytest

from s4former_tpu.core.runner import _DevicePrefetcher


def test_prefetch_preserves_order():
    pf = _DevicePrefetcher(iter(range(10)), lambda x: x * 2, depth=2)
    assert [pf.get() for _ in range(10)] == [i * 2 for i in range(10)]
    with pytest.raises(StopIteration):
        pf.get()


def test_prefetch_forwards_worker_exception():
    def bad(x):
        if x == 3:
            raise ValueError('boom at 3')
        return x

    pf = _DevicePrefetcher(iter(range(5)), bad, depth=1)
    assert pf.get() == 0
    assert pf.get() == 1
    assert pf.get() == 2
    with pytest.raises(ValueError, match='boom at 3'):
        pf.get()


def test_prefetch_close_stops_worker():
    def slow_iter():
        for i in range(1000):
            yield i

    pf = _DevicePrefetcher(slow_iter(), lambda x: x, depth=1)
    assert pf.get() == 0
    pf.close()
    deadline = time.time() + 5.0
    while pf._thread.is_alive() and time.time() < deadline:
        time.sleep(0.05)
    assert not pf._thread.is_alive()
