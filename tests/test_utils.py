"""Shared runtime utilities: the bounded batched-dispatch pipeline and
the identity-keyed device-table memo."""

import numpy as np

from gpy_dla_detection_tpu.utils.memo import memo_by_identity
from gpy_dla_detection_tpu.utils.pipeline import pipelined_batches


def test_pipelined_batches_order_padding_and_aux():
    dispatched = []

    def dispatch_fn(chunk, chunk_aux):
        assert len(chunk) == 4  # every batch padded to one shape
        assert chunk_aux is not None and len(chunk_aux) == 4
        dispatched.append((list(chunk), list(chunk_aux)))
        return np.asarray(chunk) * 10 + np.asarray(chunk_aux)

    def finalize_fn(n_real, out):
        for i in range(n_real):
            yield int(out[i])

    items = list(range(10))
    aux = iter(range(100, 200))  # consumed lazily, one per item
    results = pipelined_batches(
        items, batch_size=4, max_in_flight=1,
        dispatch_fn=dispatch_fn, finalize_fn=finalize_fn, aux=aux,
    )
    # per-item results in stream order, padding results dropped
    assert results == [i * 10 + 100 + i for i in range(10)]
    assert len(dispatched) == 3
    # the short final batch repeats its last item AND its last aux
    assert dispatched[-1][0] == [8, 9, 9, 9]
    assert dispatched[-1][1] == [108, 109, 109, 109]
    # aux was consumed exactly once per real item
    assert next(aux) == 110


def test_pipelined_batches_without_aux():
    calls = []

    def dispatch_fn(chunk, chunk_aux):
        assert chunk_aux is None
        calls.append(list(chunk))
        return list(chunk)

    results = pipelined_batches(
        [1, 2, 3], batch_size=2, max_in_flight=8,
        dispatch_fn=dispatch_fn,
        finalize_fn=lambda n, out: out[:n],
    )
    assert results == [1, 2, 3]
    assert calls == [[1, 2], [3, 3]]


def test_memo_by_identity_hit_rebuild_and_eviction():
    cache: dict = {}
    owner_a = object()
    builds = []

    def build(tag):
        def _b():
            builds.append(tag)
            return tag
        return _b

    key_a = (id(owner_a), "x")
    assert memo_by_identity(cache, key_a, owner_a, build("a")) == "a"
    # hit: same key, same owner -> no rebuild
    assert memo_by_identity(cache, key_a, owner_a, build("a2")) == "a"
    assert builds == ["a"]
    # id() reuse: same key but a DIFFERENT owner object must rebuild
    owner_b = object()
    assert memo_by_identity(cache, key_a, owner_b, build("b")) == "b"
    assert builds == ["a", "b"]
    # FIFO eviction bounds the cache
    for i in range(20):
        o = object()
        memo_by_identity(cache, (id(o), i), o, build(i), max_entries=4)
    assert len(cache) <= 5  # 4 + the one just inserted before eviction
