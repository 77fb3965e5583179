"""Crash-atomic staging guard shared by every streaming harness.

Each run_streaming_* stages its input waves as parquet under
``root/in`` and skips the write when resuming from a checkpoint. A
bare ``os.path.exists(dir)`` guard is NOT crash-atomic: the directory
exists from the moment the write starts, so a run killed mid-staging
would resume against a partial (or empty) input set and silently
serve results over missing records (review r7). Spark's committer
writes the ``_SUCCESS`` marker only after every task commits — that
marker, not the directory, is the completion signal; incomplete
leftovers are simply overwritten.
"""

from __future__ import annotations

import os


def staged_ready(path: str) -> bool:
    """True iff a previous staging run COMPLETED, so a resume may
    reuse it: either Spark's committer marker (single-write staging)
    or this module's sibling marker (multi-wave staging, written by
    :func:`mark_staged` after the last wave). The sibling marker
    lives OUTSIDE the directory so ``load(staged/*)`` globs never
    see it."""
    return os.path.exists(path + "._ok") or os.path.exists(
        os.path.join(path, "_SUCCESS")
    )


def mark_staged(path: str) -> None:
    """Record that multi-wave staging finished — call strictly AFTER
    the last wave's write returns. Wave writes themselves must use
    overwrite mode so a partial earlier attempt is replaced, not
    appended to."""
    with open(path + "._ok", "w"):
        pass
