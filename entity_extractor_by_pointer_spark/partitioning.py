"""Scan-parallelism guard for CPU-heavy map stages.

The benchmark tables are written as SINGLE-row-group parquet files, and a
row group is the unit Spark can split a parquet scan at — so a scan of
e.g. ``documents.parquet`` yields ONE partition no matter what
``spark.sql.files.maxPartitionBytes``/``minPartitionNum`` say, and every
expression pipelined onto that scan (regex normalization, shingle hashing,
md5 signatures, vector folds) runs on one core while the rest idle.
(Round-5 code mostly dodged this by accident: early shuffles like
``dropDuplicates`` spread the data before the heavy work. Removing those
shuffles exposed the single-task scans.)

:func:`spread_small_scan` repartitions ONLY when the frame has fewer
partitions than the session's default parallelism — the unsplittable-input
fix of guide §2.5 ("one huge unsplittable file … repartition immediately
after the read"). At production scale a 100 TB corpus scans as tens of
thousands of row groups, the condition is false, and the call is a plan
no-op — this is explicitly NOT a local-mode constant baked into operators
(the target tracks ``defaultParallelism``, i.e. the cluster size).

Call it on a NARROW projection (id + the columns the stage needs) so the
exchange ships only those bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition ``df`` up to ``factor * defaultParallelism``
    partitions iff it currently has fewer — a no-op on well-split inputs."""
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
