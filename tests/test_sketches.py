"""Sketch-operator accuracy: HLL++ distinct counts and GK quantiles must
track exact answers within tight bounds on the testdata (the driver's check
for these is rows-only since the values are inherently approximate)."""

import __spark_entry__ as E

SF = "/root/testdata/sf0.01"


def test_hll_distinct_within_5pct_of_exact(spark):
    import pyspark.sql.functions as F

    approx = {
        r["event_type"]: r["approx_users"]
        for r in E.q_sketch_distinct_users(spark, SF).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in E._t(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        assert abs(approx[et] - ex) / ex < 0.05, (et, approx[et], ex)


def test_quantiles_bracket_exact_percentiles(spark):
    import pyspark.sql.functions as F

    rows = {
        r["event_type"]: (r["p50"], r["p95"], r["p99"])
        for r in E.q_sketch_value_quantiles(spark, SF).collect()
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
