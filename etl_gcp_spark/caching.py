"""Cache bookkeeping for operators that pin intermediate frames.

Several operators ``persist()`` a narrow intermediate because multiple
output subtrees would otherwise recompute it (curation_funnel's
survivor sets, LSH candidate pairs, the connected-components edge
list). The pin is correct, but a ``persist()`` with no matching
``unpersist()`` accumulates cached frames for the lifetime of a
long-lived session.

Contract: any public operator that persists an intermediate tags the
returned DataFrame via :func:`tag_pinned`. Callers that materialize
the result and keep the session alive should release the pins::

    result = curation_funnel(docs)
    rows = result.collect()
    unpersist_pinned(result)

One-shot harnesses (the bench loop calls ``spark.catalog.clearCache()``
between queries) need not bother.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_etl_pinned_frames"


def tag_pinned(result: DataFrame, *frames: DataFrame) -> DataFrame:
    """Record ``frames`` (already persisted) on ``result`` for later
    release; returns ``result`` for chaining."""
    existing = tuple(getattr(result, _ATTR, ()))
    setattr(result, _ATTR, existing + frames)
    return result


def unpersist_pinned(df: DataFrame, blocking: bool = False) -> DataFrame:
    """Release every intermediate frame an operator pinned while
    building ``df``. Safe to call on any DataFrame (no-op when
    nothing was tagged) and idempotent."""
    for f in getattr(df, _ATTR, ()):
        f.unpersist(blocking)
    if hasattr(df, _ATTR):
        setattr(df, _ATTR, ())
    return df
