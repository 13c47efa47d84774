"""Bucketed co-located joins: the triples table is written bucketed by
subject so repeated graph joins/aggregations shuffle nothing (SURVEY.md §4
item 3 — parquet/managed-table stand-in for Iceberg bucket(N, subj))."""

import pyspark.sql.functions as F


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    left = spark.range(0, 10_000).select(
        F.concat(F.lit("E"), F.col("id") % 500).alias("subj"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, 2_000).select(
        F.concat(F.lit("E"), F.col("id") % 500).alias("subj"),
        (F.col("id") * 7).alias("score"),
    )
    import shutil

    for t in ("t_left", "t_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)  # stale dirs
    left.write.bucketBy(8, "subj").sortBy("subj").saveAsTable("t_left")
    right.write.bucketBy(8, "subj").sortBy("subj").saveAsTable("t_right")
    # force the sort-merge path (the broadcast planner ignores buckets for
    # tiny sides): pre-bucketed tables sort-merge with NO Exchange
    joined = spark.table("t_left").hint("merge").join(spark.table("t_right"), "subj")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    assert joined.count() > 0


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join without bucketing plans at least one
    exchange — proving the bucketed variant's absence is meaningful."""
    left = spark.range(0, 10_000).select(
        F.concat(F.lit("E"), F.col("id") % 500).alias("subj"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, 2_000).select(
        F.concat(F.lit("E"), F.col("id") % 500).alias("subj"),
        (F.col("id") * 7).alias("score"),
    )
    # force a sort-merge path (no broadcast) to compare like for like
    joined = left.hint("merge").join(right, "subj")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
