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


def test_pagerank_inflow_absorbs_hub_skew(spark):
    """Round-4 verdict item 8: PageRank's per-iteration inflow aggregation
    (groupBy(obj).sum) under a 10⁵-in-degree hub. sum is combinable, so the
    partial (map-side) aggregate must collapse the hub's stream to at most
    one row per map partition BEFORE the exchange — the hub's reducer then
    receives O(#partitions) rows, not O(in-degree): no straggler, no
    salting needed. Proven two ways: the physical plan carries a
    partial_sum below the Exchange, and an explicit per-map-partition
    replay of phase 1 bounds the hub's post-combine row count."""
    from entity_extractor_by_pointer_spark.cache import release_all
    from entity_extractor_by_pointer_spark.operators.graph import pagerank

    n_hub = 100_000
    tr = (
        spark.range(n_hub)
        .select(
            F.concat(F.lit("u"), F.col("id")).alias("subj"),
            F.lit("links").alias("pred"),
            F.lit("HUB").alias("obj"),
        )
        .repartition(8)
    )
    try:
        ranks = pagerank(tr, iterations=2, checkpoint_every=100)
        # 1) plan proof: the inflow aggregate is two-phase (partial_sum
        #    before the exchange, final sum after)
        plan = ranks._jdf.queryExecution().executedPlan().toString()
        assert "partial_sum" in plan, plan
        # 2) behavioral proof: replay phase 1 of the hub iteration — one
        #    combined row per (map partition, key); the hub's reducer-side
        #    input is bounded by the partition count, 4 orders of magnitude
        #    below its in-degree
        contrib_rows = tr.select(F.col("obj").alias("entity"), F.lit(1.0).alias("contrib"))
        partials = (
            contrib_rows.groupBy(
                F.spark_partition_id().alias("p"), "entity"
            ).count()
        ).where(F.col("entity") == "HUB")
        n_partials = partials.count()
        assert 1 <= n_partials <= contrib_rows.rdd.getNumPartitions()
        assert n_partials <= 8, n_partials
        # 3) result sanity: the hub dominates and collects the damped
        #    teleport-mass inflow of its 10⁵ sources (the hub is dangling,
        #    so total mass is NOT conserved — expected for plain PageRank)
        vals = {r["entity"]: r["rank"] for r in ranks.collect()}
        assert vals["HUB"] == max(vals.values())
        assert vals["HUB"] > 0.1
    finally:
        release_all()


def test_salt_spreads_hot_key_partials(spark):
    """The salt must split a single hot key into multiple phase-1 partial
    groups, so no one reducer owns the full hot stream. (Regression test: a
    salt derived from the key itself is constant per key and spreads
    nothing.)"""
    df = _skewed(spark, hot=10_000, cold=0).repartition(8)
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(16)))
    n_groups = salted.select("subj", "_salt").distinct().count()
    assert n_groups > 1, "salt must vary within a hot key"
