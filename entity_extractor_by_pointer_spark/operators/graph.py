"""Graph analytics over the materialized (subj, pred, obj) triple table.

The north rule materializes the KG as a subject-hash-bucketed graph table;
these operators are the downstream consumers that prove the table is
queryable as a graph, not just storable:

- ``entity_degrees``: in/out/total degree per canonical entity — two
  map-side-combined aggregations + one outer merge; at 100 TB this is the
  canonical "hot entity" census feeding the skew toolkit.
- ``pagerank``: fixed-iteration damped PageRank via iterative DataFrame
  joins (one hash join + one aggregation per iteration, the textbook
  Spark shape). Dangling nodes keep their damped base mass (absorbing
  variant — no global redistribution term), which keeps every iteration a
  pure join+agg and makes the recursion SQL-expressible (the oracle unrolls
  the same fixed iterations as chained CTEs). Every ``checkpoint_every``
  iterations the plan is truncated with ``localCheckpoint`` so lineage
  doesn't grow unboundedly — same pattern as connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import cached


def entity_degrees(triples: DataFrame) -> DataFrame:
    """(entity, out_deg, in_deg, degree) over DISTINCT (subj, obj) edges."""
    edges = triples.select("subj", "obj").distinct()
    out_d = edges.groupBy(F.col("subj").alias("entity")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    in_d = edges.groupBy(F.col("obj").alias("entity")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    return (
        out_d.join(in_d, "entity", "full_outer")
        .fillna(0, subset=["out_deg", "in_deg"])
        .withColumn("degree", F.col("out_deg") + F.col("in_deg"))
    )


def pagerank(
    triples: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """(entity, rank) after ``iterations`` damped PageRank steps.

    rank₀ = 1/N; rank_{t+1}(v) = (1−d)/N + d·Σ_{u→v} rank_t(u)/outdeg(u).
    """
    edges = cached(triples.select("subj", "obj").distinct())
    nodes = (
        edges.select(F.col("subj").alias("entity"))
        .unionAll(edges.select(F.col("obj").alias("entity")))
        .distinct()
    )
    nodes = cached(nodes)
    n = nodes.count()
    out_deg = edges.groupBy(F.col("subj").alias("entity")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for it in range(iterations):
        contribs = (
            ranks.join(out_deg, "entity")
            .join(edges, ranks["entity"] == edges["subj"])
            .select(
                F.col("obj").alias("entity"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
            .groupBy("entity")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "entity", "left")
            .fillna(0.0, subset=["inflow"])
            .select(
                "entity",
                (F.lit(base) + F.lit(damping) * F.col("inflow")).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("entity", F.round("rank", 6).alias("rank"))


def entity_pmi_edges(
    canon_mentions: DataFrame,
    id_col: str = "doc_id",
    entity_col: str = "canon_id",
) -> DataFrame:
    """Pointwise-mutual-information edge weights for the co-occurrence KG:
    (entity_a, entity_b, co_docs, pmi) for every unordered canonical-entity
    pair that co-occurs in at least one document, with

        pmi = ln( co_docs · N / (df_a · df_b) ),  rounded to 6 dp,

    N = #docs carrying ≥1 canonical mention. PMI is the standard weighting
    that separates genuinely associated entity pairs from pairs that merely
    co-occur because both are frequent — the edge score a raw ``n_docs``
    triple count (``triple_counts``) cannot provide.

    Scale shape: the per-doc entity sets are bounded (a page mentions a
    handful of canonical entities), so the doc-keyed self-join fans out
    O(k²) per doc, not O(n²) over the corpus; the df table has one row per
    canonical ENTITY (millions at most) and is broadcast; N rides the same
    broadcast as a 1-row aggregate. Nothing in the plan scales worse than
    the mention table itself."""
    cm = cached(canon_mentions.select(id_col, entity_col).distinct())
    n_corpus = cm.select(F.countDistinct(id_col).alias("n_corpus"))
    dfe = cm.groupBy(entity_col).agg(F.count(F.lit(1)).alias("df"))
    a = cm.select(F.col(id_col).alias("_d"), F.col(entity_col).alias("entity_a"))
    b = cm.select(F.col(id_col).alias("_d"), F.col(entity_col).alias("entity_b"))
    pairs = (
        a.join(b, "_d")
        .where(F.col("entity_a") < F.col("entity_b"))
        .groupBy("entity_a", "entity_b")
        .agg(F.count(F.lit(1)).alias("co_docs"))
    )
    df_a = dfe.select(F.col(entity_col).alias("entity_a"), F.col("df").alias("df_a"))
    df_b = dfe.select(F.col(entity_col).alias("entity_b"), F.col("df").alias("df_b"))
    return (
        pairs.join(F.broadcast(df_a), "entity_a")
        .join(F.broadcast(df_b), "entity_b")
        .crossJoin(F.broadcast(n_corpus))
        .select(
            "entity_a",
            "entity_b",
            "co_docs",
            F.round(
                F.log(
                    (F.col("co_docs") * F.col("n_corpus"))
                    / (F.col("df_a") * F.col("df_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )
