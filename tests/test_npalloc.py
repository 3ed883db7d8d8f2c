"""Caching numpy data allocator (native/parelag_npalloc.c).

The allocator is installed process-wide at parelag_tpu import (so this
whole test session already runs on it — every other test doubles as a
stress test); here we pin the cache mechanics: calloc-from-cache stays
zeroed, resize (realloc) preserves data, hits actually occur, and trim
returns memory."""

import numpy as np
import pytest

from parelag_tpu.ops import npalloc


pytestmark = pytest.mark.skipif(
    npalloc.stats() is None, reason="npalloc extension unavailable")


def test_cache_hit_and_zeroing():
    npalloc.trim()
    base = npalloc.stats()
    a = np.empty(2_000_000)          # 16 MB
    a[:] = 7.0
    del a
    b = np.zeros(2_000_000)          # same class: must be served zeroed
    assert b.max() == 0.0
    st = npalloc.stats()
    assert st["hits"] > base["hits"]
    del b


def test_cross_class_best_fit():
    npalloc.trim()
    a = np.empty(3_000_000)          # ~24 MB class
    del a
    base = npalloc.stats()
    b = np.empty(2_500_000)          # smaller class: served from above
    st = npalloc.stats()
    assert st["hits"] == base["hits"] + 1
    del b


def test_realloc_preserves_data():
    d = np.arange(1000)
    d.resize(2_000_000, refcheck=False)
    assert d[999] == 999 and d[1_500_000] == 0
    d.resize(10, refcheck=False)
    assert list(d) == list(range(10))


def test_trim_empties_cache():
    a = np.zeros(2_000_000)
    del a
    npalloc.trim()
    assert npalloc.stats()["cached_bytes"] == 0


def test_small_allocations_roundtrip():
    xs = [np.full(17, i, dtype=np.int64) for i in range(500)]
    assert all(int(x[3]) == i for i, x in enumerate(xs))
