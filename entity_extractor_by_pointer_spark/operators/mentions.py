"""Mention detection: pages → mentions, as one fused mapInPandas stage.

SURVEY.md §3.1: tokenize → encode → pointer head → span decode are fused per
Arrow batch; mention detection is embarrassingly parallel per page, so the
stage induces **no shuffle** — the plan is Scan → (whole-stage project) →
MapInPandas. The (C, L, L) GlobalPointer score matrix lives only inside the
UDF (never serialized, SURVEY.md §4 row 1).

Output schema (SURVEY.md §1.2 ``mentions``):
``(url, type, entity, start_idx, end_idx, score, model)`` — one row per
decoded span occurrence. The reference's per-(doc, class) surface-form SET
semantics (``engines/data.py:105,114``) is applied by downstream views via
``dropDuplicates`` (operator D3), keeping positions available for triples.

Two scorers:
- model path (``detect_mentions``): deterministic pointer-NER model
  (SeededTinyEncoder + GP/BP head) — exercised by the pytest parity suite;
- gazetteer path (``detect_mentions_gazetteer``): closed-form token-aligned
  matcher sharing the decode char conventions — used where the output must
  be semantically meaningful *and* SQL-oracle-checkable (driver contract).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.gazetteer import make_matcher
from ..functions.model import MODEL_CACHE, NerConfig

MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("entity", T.StringType(), False),
        T.StructField("start_idx", T.IntegerType(), False),
        T.StructField("end_idx", T.IntegerType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("model", T.StringType(), False),
    ]
)

_COLS = [f.name for f in MENTIONS_SCHEMA.fields]


def detect_mentions(
    df: DataFrame,
    config: NerConfig,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Model-path mention detection. Narrow stage, no shuffle."""
    classes = list(config.classes)
    model_tag = config.model_type

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = MODEL_CACHE.get(config)  # one model per executor worker
        for pdf in batches:
            texts = pdf[text_col].fillna("").tolist()
            ids = pdf[id_col].tolist()
            rows = []
            for rid, spans in zip(ids, model.predict_batch(texts)):
                for sp in spans:
                    rows.append(
                        (rid, classes[sp.class_id], sp.entity, sp.start_idx, sp.end_idx, sp.score, model_tag)
                    )
            yield pd.DataFrame(rows, columns=_COLS)

    return df.select(id_col, text_col).mapInPandas(run, MENTIONS_SCHEMA)


def detect_mentions_gazetteer(
    df: DataFrame,
    gazetteer: list[tuple[str, str, str]],
    id_col: str = "url",
    text_col: str = "text",
    max_tokens: int | None = None,
    id_type: T.DataType = T.StringType(),
) -> DataFrame:
    """Gazetteer-path mention detection (deterministic, oracle-checkable).

    The id column keeps its input name (``id_col``)."""
    schema = T.StructType(
        [T.StructField(id_col, id_type, False)] + list(MENTIONS_SCHEMA.fields[1:])
    )
    cols = [id_col] + _COLS[1:]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        match = make_matcher(gazetteer)  # built once per task, not per doc
        for pdf in batches:
            rows = []
            for rid, text in zip(pdf[id_col], pdf[text_col].fillna("")):
                for etype, surface, s, e in match(text, max_tokens):
                    rows.append((rid, etype, surface, s, e, 1.0, "gazetteer"))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, text_col).mapInPandas(run, schema)


def mention_sets(mentions: DataFrame, id_col: str = "url") -> DataFrame:
    """Reference set semantics: distinct surface per (doc, class)
    (operator D3, ``engines/data.py:105,114``)."""
    return mentions.select(id_col, "type", "entity").dropDuplicates([id_col, "type", "entity"])
