"""Multi-format source/sink support for the pages table.

Crawl archives arrive in many containers; the pipeline is format-agnostic
behind one reader. Supported here with no extra packages: parquet (default),
ORC, JSON-lines, CSV (html base64-encoded — CSV has no binary type). The
reference's list-of-records JSON is handled by
``sources.pages.reference_dataset_as_pages``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pages import PAGES_SCHEMA

_TEXTUAL_SCHEMA = (
    "url string, warc_ts timestamp, html_b64 string, text string, lang string"
)


def write_pages(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    if fmt in ("parquet", "orc"):
        df.write.format(fmt).mode("overwrite").save(path)
    elif fmt in ("json", "csv"):
        textual = df.select(
            "url",
            F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("warc_ts"),
            F.base64("html").alias("html_b64"),
            "text",
            "lang",
        )
        w = textual.write.format(fmt).mode("overwrite")
        if fmt == "csv":
            w = w.option("header", "true").option("escape", '"').option("multiLine", "true")
        w.save(path)
    else:
        raise ValueError(f"unsupported pages format: {fmt}")


def read_pages(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt in ("parquet", "orc"):
        return spark.read.format(fmt).schema(PAGES_SCHEMA).load(path)
    if fmt in ("json", "csv"):
        r = spark.read.format(fmt).schema(_TEXTUAL_SCHEMA)
        if fmt == "csv":
            r = r.option("header", "true").option("escape", '"').option("multiLine", "true")
        df = r.load(path)
        return df.select(
            "url",
            F.to_timestamp("warc_ts", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("warc_ts"),
            F.unbase64("html_b64").alias("html"),
            "text",
            "lang",
        )
    raise ValueError(f"unsupported pages format: {fmt}")
