"""Corpus curation: the composite filter a training-data pipeline actually
ships — exact dedup + language filter + quality floor in ONE narrow pass
plus a single fingerprint aggregation.

Verdict precedence (first matching reason wins, so every doc gets exactly
one row and the policy is order-deterministic):
  1. ``exact_dup``  — another doc with the same normalized-text fingerprint
     has a smaller doc_id (keep-first-by-id, same rule as ``dedup_exact``)
  2. ``lang``       — document language not in the keep set
  3. ``quality``    — quality_score below the floor
  4. ``kept``

Scale shape: fingerprint keep-ids come from ONE map-side-combined groupBy
(min(doc_id) per fingerprint); everything else is per-row expressions. The
join back is on the fingerprint — at crawl scale this is the same shuffle
the exact-dedup operator already pays, so curation is dedup + free filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import fingerprint64, quality_score

DEFAULT_KEEP_LANGS = ("en", "de", "fr", "es", "zh")
DEFAULT_QUALITY_FLOOR = 0.5


def curate_corpus(
    docs: DataFrame,
    keep_langs: tuple[str, ...] = DEFAULT_KEEP_LANGS,
    quality_floor: float = DEFAULT_QUALITY_FLOOR,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """(doc_id, verdict) — one row per input document."""
    fp = docs.select(
        F.col(id_col), fingerprint64(F.col(text_col)).alias("_fp")
    )
    keep_ids = fp.groupBy("_fp").agg(F.min(id_col).alias("_keep_id"))
    with_keep = fp.join(keep_ids, "_fp").select(id_col, "_keep_id")
    scored = docs.select(
        F.col(id_col),
        F.col(lang_col),
        quality_score(F.col(text_col)).alias("_q"),
    )
    verdict = (
        F.when(F.col(id_col) != F.col("_keep_id"), F.lit("exact_dup"))
        .when(~F.col(lang_col).isin(*keep_langs), F.lit("lang"))
        .when(F.col("_q") < F.lit(quality_floor), F.lit("quality"))
        .otherwise(F.lit("kept"))
    )
    return (
        scored.join(with_keep, id_col)
        .select(F.col(id_col), verdict.alias("verdict"))
    )
