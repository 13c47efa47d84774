"""Sketch-operator accuracy: HLL++ distinct counts and GK quantiles must
track exact answers within tight bounds on the testdata. The driver queries
themselves now emit tolerance VERDICTS (oracle-hash-checkable booleans);
these tests pin the underlying numeric accuracy AND that the verdicts come
out all-true."""

import __spark_entry__ as E

SF = "/root/testdata/sf0.01"


def test_hll_distinct_within_5pct_of_exact(spark):
    import pyspark.sql.functions as F

    rows = {
        r["event_type"]: (r["exact"], r["approx"])
        for r in E._t(spark, SF, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .collect()
    }
    assert rows
    for et, (ex, ap) in rows.items():
        assert abs(ap - ex) / ex < 0.05, (et, ap, ex)


def test_sketch_distinct_verdict_query_all_ok(spark):
    rows = E.q_sketch_distinct_users(spark, SF).collect()
    assert rows
    assert all(r["approx_ok"] for r in rows), rows


def test_quantiles_bracket_exact_percentiles(spark):
    import pyspark.sql.functions as F

    rows = {
        r["event_type"]: r["qa"]
        for r in E._t(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("qa"))
        .collect()
    }
    exact = {
        r["event_type"]: r["q"]
        for r in E._t(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.5, 0.95, 0.99))").alias("q"))
        .collect()
    }
    for et, qs in rows.items():
        for approx_v, exact_v in zip(qs, exact[et]):
            assert abs(approx_v - exact_v) <= max(0.05 * abs(exact_v), 1e-6), (et, qs, exact[et])


def test_sketch_quantile_verdict_query_all_ok(spark):
    rows = E.q_sketch_value_quantiles(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["p50_ok"] and r["p95_ok"] and r["p99_ok"], rows
