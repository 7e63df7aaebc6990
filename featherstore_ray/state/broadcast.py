"""Broadcast-small-side helpers.

Pattern (SURVEY.md J4 + ray guide): ``ray.put`` ONCE on the driver, read the
ref in each actor's ``__init__`` (zero-copy from the node-local object
store) — never re-ship per batch, never shuffle a small side.
"""

from __future__ import annotations

import ray


class Broadcast:
    """Lazily-fetched broadcast value usable inside map_batches closures.

    The object ref pickles into the task closure; the value is fetched once
    per worker process and cached on the instance.
    """

    def __init__(self, value):
        self._ref = ray.put(value)
        self._cache = None
        self._have = False

    def get(self):
        if not self._have:
            self._cache = ray.get(self._ref)
            self._have = True
        return self._cache

    def __reduce__(self):
        b = Broadcast.__new__(Broadcast)
        b._ref = self._ref
        b._cache = None
        b._have = False
        return (_rebuild, (self._ref,))


def _rebuild(ref):
    b = Broadcast.__new__(Broadcast)
    b._ref = ref
    b._cache = None
    b._have = False
    return b
