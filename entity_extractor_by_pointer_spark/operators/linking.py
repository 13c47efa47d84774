"""Entity linking: mentions × alias dictionary broadcast join.

North-rule stage "salted-broadcast entity linking against an alias
dictionary". The alias dict is small (≤ millions of rows) → a plain
broadcast hash join with **zero shuffle** of the mention fact table; skew in
mention surfaces is irrelevant under broadcast because no partitioning by
key happens. (Salting only matters for the downstream *aggregations* over
hot canonical entities — see ``triples.salted_count``.) Surfaces are
normalized (lower/trim) on both sides before matching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def alias_df(spark, alias_pairs: list[tuple[str, str]]) -> DataFrame:
    return spark.createDataFrame(alias_pairs, "surface string, entity_id string")


def link_mentions(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """mentions + (entity_id, link_conf); unlinked mentions keep NULL id."""
    # deterministic pick when two alias entries normalize to one surface:
    # min(entity_id) — dropDuplicates keeps an arbitrary row and would make
    # linking partitioning-dependent (round-1 ADVICE)
    dim = (
        aliases.select(
            F.lower(F.trim(F.col("surface"))).alias("_norm_surface"),
            "entity_id",
        )
        .groupBy("_norm_surface")
        .agg(F.min("entity_id").alias("entity_id"))
    )
    fact = mentions.withColumn("_norm_surface", F.lower(F.trim(F.col("entity"))))
    linked = fact.join(F.broadcast(dim), "_norm_surface", "left").drop("_norm_surface")
    return linked.withColumn(
        "link_conf", F.when(F.col("entity_id").isNotNull(), F.lit(1.0)).otherwise(F.lit(0.0))
    )


def linked_only(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """Semi-join flavor: mentions whose surface is in the dictionary."""
    dim = aliases.select(F.lower(F.trim(F.col("surface"))).alias("_norm_surface"))
    fact = mentions.withColumn("_norm_surface", F.lower(F.trim(F.col("entity"))))
    return fact.join(F.broadcast(dim), "_norm_surface", "left_semi").drop("_norm_surface")


def unlinked_only(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """Anti-join flavor: out-of-dictionary mentions (NIL candidates)."""
    dim = aliases.select(F.lower(F.trim(F.col("surface"))).alias("_norm_surface"))
    fact = mentions.withColumn("_norm_surface", F.lower(F.trim(F.col("entity"))))
    return fact.join(F.broadcast(dim), "_norm_surface", "left_anti").drop("_norm_surface")
