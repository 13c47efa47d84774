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
    """Unpersist every registered frame (non-blocking). Returns the count."""
    n = len(_LIVE)
    while _LIVE:
        try:
            _LIVE.pop().unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    return n
