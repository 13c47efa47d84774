"""Custom stateful streaming operator: first-seen dedup across micro-batches.

Crawl ingest keeps the FIRST page per content fingerprint and drops every
later near-identical re-crawl — classic streaming exact-dedup. Implemented
with ``applyInPandasWithState`` (arbitrary stateful processing): state is one
boolean per fingerprint group ("seen"), so memory is O(distinct
fingerprints) and survives restarts via the checkpoint.

The fingerprint is the same md5-int64 of normalized text used by the batch
dedup operator (`operators/dedup.py`), so batch and stream agree on what a
duplicate is.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.textstats import fingerprint64
from ..sources.pages import PAGES_SCHEMA

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("fingerprint", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType(), False)])


def _first_seen(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        return  # fingerprint already emitted in an earlier micro-batch
    first = None
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        # deterministic pick: lexicographically smallest url across ALL
        # Arrow chunks of the group (a group can span multiple chunks when
        # it exceeds maxRecordsPerBatch — comparing only the first chunk
        # would make the pick chunk-order-dependent)
        head = pdf.sort_values("url").iloc[0]
        if first is None or head["url"] < first["url"]:
            first = head
    if first is not None:
        state.update((True,))
        yield pd.DataFrame(
            [{"fingerprint": key[0], "url": first["url"], "text": first["text"]}]
        )


def stream_dedup_first_seen(pages: DataFrame) -> DataFrame:
    """pages stream → one row per distinct content fingerprint (first seen)."""
    keyed = pages.select(
        fingerprint64(F.col("text")).alias("fingerprint"), "url", "text"
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _first_seen,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_stream_once(
    spark: SparkSession,
    pages_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    max_files_per_trigger: int = 4,
) -> None:
    """Drain new pages files into a deduped parquet sink (exactly-once via
    checkpoint; the memory sink can't recover from a checkpoint, a file sink
    can — this is also the production shape)."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )
    q = (
        stream_dedup_first_seen(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
