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


def _make_first_seen(ttl_ms: int | None):
    def _first_seen(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL eviction: forget the fingerprint; a later re-crawl of the
            # same content is treated as new (bounded-state trade-off)
            state.remove()
            return
        if state.exists:
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)  # sliding TTL on re-touch
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
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame(
                [{"fingerprint": key[0], "url": first["url"], "text": first["text"]}]
            )

    return _first_seen


def stream_dedup_first_seen(pages: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """pages stream → one row per distinct content fingerprint (first seen).

    ``ttl_ms`` bounds state at crawl scale: with no TTL the state table is
    O(all distinct fingerprints ever seen), which on a 10^12-page crawl is
    itself petabyte-class. A processing-time TTL evicts fingerprints idle
    longer than the re-crawl horizon — re-crawls inside the horizon are
    still deduped exactly; older re-crawls re-emit (the standard bounded-
    state trade-off, made explicit here)."""
    keyed = pages.select(
        fingerprint64(F.col("text")).alias("fingerprint"), "url", "text"
    )
    timeout = (
        GroupStateTimeout.NoTimeout if ttl_ms is None else GroupStateTimeout.ProcessingTimeTimeout
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _make_first_seen(ttl_ms),
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def run_dedup_stream_once(
    spark: SparkSession,
    pages_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    max_files_per_trigger: int = 4,
    ttl_ms: int | None = None,
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
        stream_dedup_first_seen(stream, ttl_ms=ttl_ms)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
