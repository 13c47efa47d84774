"""One-pass table profiling — the data-quality census an ingest pipeline
runs before trusting a new crawl drop or table snapshot.

``profile_table`` computes per-column null counts, exact distinct counts,
and min/max in a SINGLE aggregation job (one row of fused aggregates,
unpivoted driver-side into one output row per column). At 100 TB this is
one scan + one map-side-combined aggregate — the multiple DISTINCT
aggregates expand the input once per distinct column (Spark's Expand
operator), which is the exact-count price; swap ``approx_distinct=True``
for HLL++ sketches when ±2% is acceptable and the expand is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_val, max_val) — one row per
    profiled column; min/max rendered as strings so heterogeneous column
    types share one schema (timestamps/dates via ISO cast, floats via
    plain string cast — deterministic and SQL-mirrorable)."""
    cols = columns or df.columns
    distinct_fn = F.approx_count_distinct if approx_distinct else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"_nulls_{c}"),
            distinct_fn(c).alias(f"_dist_{c}"),
            # min/max on the NATIVE type (string-cast first would compare
            # lexicographically — "10" < "9"), rendered to string after
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    # unpivot the single aggregate row into per-column rows with stack —
    # stays one job, no second scan
    stack_args = ", ".join(
        f"'{c}', _nulls_{c}, _dist_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return one.select(
        F.col("_n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args})"
            " AS (col_name, n_nulls, n_distinct, min_val, max_val)"
        ),
    ).select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_val",
        "max_val",
    )
