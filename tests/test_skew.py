"""Skew handling (SURVEY.md §4 item 1 / §5 invariant 4): the salted
two-phase aggregation must be correct under a pathological hot key and must
actually spread the hot key's rows across reducers."""

from pyspark.sql import functions as F

from entity_extractor_by_pointer_spark.operators.triples import salted_count


def _skewed(spark, hot=50_000, cold=50):
    hot_df = spark.range(hot).select(
        F.lit("中国").alias("subj"), F.lit("near").alias("pred"), F.lit("北京").alias("obj")
    )
    cold_df = spark.range(cold).select(
        F.concat(F.lit("e"), F.col("id")).alias("subj"),
        F.lit("near").alias("pred"),
        F.lit("x").alias("obj"),
    )
    return hot_df.union(cold_df)


def test_salted_count_correct_under_skew(spark):
    df = _skewed(spark)
    got = {
        (r["subj"], r["pred"], r["obj"]): r["n_docs"]
        for r in salted_count(df, ["subj", "pred", "obj"], salt_buckets=16).collect()
    }
    assert got[("中国", "near", "北京")] == 50_000
    assert got[("e7", "near", "x")] == 1
    assert len(got) == 51


def test_salted_join_equals_plain_join(spark):
    """Salt-and-replicate join must be row-identical to the plain join,
    including duplicate dim keys and (for inner) unmatched fact keys."""
    from entity_extractor_by_pointer_spark.operators.skew import salted_join

    fact = _skewed(spark, hot=20_000, cold=30).repartition(8)
    dim = spark.createDataFrame(
        [("中国", "CN"), ("e1", "E1"), ("e1", "E1b"), ("e7", "E7"), ("zz", "ZZ")],
        "subj string, label string",
    )
    plain = sorted(tuple(r) for r in fact.join(dim, "subj").collect())
    salted = sorted(tuple(r) for r in salted_join(fact, dim, "subj", 8).collect())
    assert salted == plain
    assert len(plain) == 20_000 + 2 + 1  # hot + dup-key e1 + e7


def test_salt_spreads_hot_key_partials(spark):
    """The salt must split a single hot key into multiple phase-1 partial
    groups, so no one reducer owns the full hot stream. (Regression test: a
    salt derived from the key itself is constant per key and spreads
    nothing.)"""
    df = _skewed(spark, hot=10_000, cold=0).repartition(8)
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(16)))
    n_groups = salted.select("subj", "_salt").distinct().count()
    assert n_groups > 1, "salt must vary within a hot key"
