"""Identity-keyed memoization for per-model device tables.

The zQSO heads precompute large device-resident scan/FFT tables per
learned model (models/zqso.py, models/zqso_corr.py).  Keys include
``id(model)`` — cheap and hashable for arbitrary array pytrees — so a
hit must re-check identity (an id can be reused after the original
object is garbage collected).  FIFO eviction bounds the resident
tables.
"""

from __future__ import annotations


def memo_by_identity(cache: dict, key: tuple, owner, build, max_entries: int = 8):
    """Return ``cache[key]`` if present AND still owned by ``owner``
    (identity check guards against id() reuse), else ``build()`` and
    store, evicting the oldest entry past ``max_entries``.

    ``key`` must include ``id(owner)``; ``build`` takes no arguments.
    """
    hit = cache.get(key)
    if hit is not None and hit[0] is owner:
        return hit[1]
    entry = build()
    cache[key] = (owner, entry)
    if len(cache) > max_entries:
        cache.pop(next(iter(cache)))
    return entry
