"""Paired-release discipline for operator-created caches.

Several operators cache an intermediate DataFrame that the returned
(lazy) plan consumes more than once — e.g. the shingle table feeding
both sides of a verify join. Those caches must stay alive until the
caller materializes the result, so the operator cannot ``unpersist()``
before returning; but a long-running pipeline that calls these
operators repeatedly must not accumulate executor storage either.

``release_after(result, *cached)`` pairs every operator cache with an
explicit release handle: it attaches an idempotent ``release_caches()``
callable to the returned DataFrame. Callers that are done with a result
(collected it, wrote it out) call ``result.release_caches()``; sweeps
that run many operator queries back-to-back can instead call
``spark.catalog.clearCache()`` between queries (the bench harness
does). Either way, no operator ``.cache()`` is left without a paired
release path.

Deliberately NOT garbage-collection-driven: callers routinely wrap the
result in further transformations (``op(df).orderBy(...)``) and drop
the intermediate Python object immediately, while the derived plan
still reuses the cached data — releasing on GC would silently undo the
cache exactly where it matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_after(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Attach ``result.release_caches()`` which unpersists ``cached``.

    An item that itself carries a ``release_caches`` handle (the result
    of another paired-release operator, consumed as an input here) has
    that inner handle chained as well — composing operators never needs
    hand-rolled release closures at the call site.

    Idempotent; swallows errors from an already-stopped session (there
    is nothing left to release then)."""
    released = False

    def _release() -> None:
        nonlocal released
        if released:
            return
        released = True
        for df in cached:
            inner = getattr(df, "release_caches", None)
            if callable(inner):
                try:
                    inner()
                except Exception:
                    pass
            try:
                df.unpersist()  # no-op when the item was never persisted
            except Exception:
                pass  # session already stopped — nothing to release

    result.release_caches = _release
    return result
