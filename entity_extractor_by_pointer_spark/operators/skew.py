"""Explicit skew-handling join: salt-and-replicate.

AQE's skew-join splitting (enabled globally in ``session.get_spark``) covers
most cases at runtime; this operator is the explicit fallback for joins AQE
cannot rebalance — e.g. when one key holds a double-digit percentage of all
rows ("中国"-grade entities at crawl scale) or when the build side must stay
a shuffle join (too big to broadcast).

Technique: the fact side gets a uniform random-ish salt in [0, K) appended
to the join key; the dim side is replicated K× with every salt value; the
join key becomes (key, salt) so a hot key's rows spread over K reducers.
Exactly one dim replica matches each fact row → result is row-identical to
the unsalted join (asserted in tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_hot_keys(
    df: DataFrame,
    key: str,
    min_share: float = 0.01,
    top_k: int = 20,
) -> list[tuple[str, int]]:
    """First-pass hot-key detection (SURVEY.md §4 item 1): keys holding more
    than ``min_share`` of all rows, by exact count-by-key (map-side combined
    — one row per key per partition crosses the shuffle). The pipeline logs
    these to ``_metrics`` so skew decisions are observable per run; callers
    route detected keys through ``salted_join``/``salted_count``."""
    total = df.count()
    if total == 0:
        return []
    rows = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= total * min_share)
        .orderBy(F.desc("n"), F.asc(key))
        .limit(top_k)
        .collect()
    )
    return [(r[key], int(r["n"])) for r in rows]


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` (large, possibly skewed on ``key``) with ``dim``
    (smaller, but above the broadcast threshold) on ``key``.

    Only fact-preserving join types are row-identical to the unsalted join:
    the dim side is replicated ``salt_buckets`` times, so right/full joins
    would emit each unmatched dim row once per replica."""
    if how not in ("inner", "left", "left_semi", "left_anti", "left_outer"):
        raise ValueError(
            f"salted_join supports fact-preserving join types only, got {how!r}: "
            "the salt-replicated dim side would duplicate unmatched dim rows "
            "under right/full joins"
        )
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets)).cast("int")
    )
    replicas = dim.crossJoin(
        F.broadcast(
            fact.sparkSession.range(salt_buckets).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    out = salted_fact.join(replicas, [key, "_salt"], how)
    return out.drop("_salt")
