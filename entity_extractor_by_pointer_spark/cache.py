"""Shared persist registry — the operators' caching contract.

Several operators persist an intermediate that feeds two downstream branches
(the shingle table in dedup, the first-mention table in triples, the edge set
in PageRank). Before round 3 each called ``DataFrame.persist()`` ad hoc and
never unpersisted, so a long-lived session running many queries accumulated
cached blocks (bench.py worked around it with ``clearCache``; notebooks and
the pipeline got silent memory pressure).

Contract:

- operators persist through :func:`cached`, which uses MEMORY_AND_DISK (so an
  oversized intermediate degrades to disk instead of evicting its siblings or
  OOMing the executor) and records the frame in a module-level registry;
- callers that are done with every outstanding operator result call
  :func:`release_all` (bench.py does, between timed queries; tests do in
  fixtures). ``release_all`` is safe at any time — Spark recomputes an
  unpersisted frame from lineage if it is used again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LIVE: list[DataFrame] = []


def cached(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK) and register it for release."""
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    _LIVE.append(out)
    return out


def release_all() -> int:
    """Unpersist every registered frame (BLOCKING). Returns the count.

    Blocking matters: an async unpersist returns immediately and the block
    manager frees the (potentially hundreds of MB of) cached batches WHILE
    the caller's next query runs — measured as a 25-40% inflation of
    whichever cache-heavy query follows. Completing the release before
    returning charges cleanup to the releaser, not the next workload."""
    n = len(_LIVE)
    while _LIVE:
        try:
            _LIVE.pop().unpersist(blocking=True)
        except Exception:
            pass  # session already stopped — nothing to release
    return n
