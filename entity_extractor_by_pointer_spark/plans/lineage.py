"""Per-stage / per-partition lineage and metrics tables.

North rule: "resumable from checkpoint with per-partition lineage +
metrics". Stage outputs are materialized tables (parquet here; Iceberg
snapshots on a real cluster — the sandbox has no Iceberg runtime jar, see
SURVEY.md §7.5, so the writer abstracts over both). Lineage rows record one
entry per output partition (Spark partition id → row count), appended
atomically AFTER the stage's data write succeeds, so a killed run re-executes
any stage whose lineage is missing — stage-level idempotent resume.

Schemas (SURVEY.md §1.2):
  _lineage: run_id, stage, part_id, rows_out, started_at, finished_at, status
  _metrics: run_id, stage, key, value
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "run_id string, stage string, part_id int, rows_out long, "
    "started_at double, finished_at double, status string"
)
METRICS_SCHEMA = "run_id string, stage string, key string, value double"


class StageWriter:
    def __init__(self, spark: SparkSession, workdir: str, run_id: str):
        self.spark = spark
        self.workdir = workdir
        self.run_id = run_id

    def _stage_path(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def is_done(self, stage: str) -> bool:
        path = self._stage_path(stage)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            return False
        lineage = self.read_lineage()
        if lineage is None:
            return False
        return (
            lineage.where(
                (F.col("stage") == stage) & (F.col("status") == "done")
            ).limit(1).count()
            > 0
        )

    def list_snapshots(self) -> list[str]:
        """Committed increment snapshot ids in commit order.

        An increment is committed once its *pages* snapshot (written LAST by
        ``run_incremental``) has a ``_SUCCESS`` marker; commit order is the
        marker's mtime — the parquet stand-in for Iceberg's snapshot log."""
        root = os.path.join(self.workdir, "pages_inc")
        if not os.path.exists(root):
            return []
        done = [
            d
            for d in os.listdir(root)
            if os.path.exists(os.path.join(root, d, "_SUCCESS"))
        ]
        return sorted(done, key=lambda d: os.path.getmtime(os.path.join(root, d, "_SUCCESS")))

    def read_stage(self, stage: str, as_of: str | None = None) -> DataFrame:
        """Base stage table ∪ committed increment snapshots (optionally
        time-traveled).

        Increments (``run_incremental``) live under ``<stage>_inc/<inc_id>``.
        A snapshot becomes visible only once its own ``_SUCCESS`` marker AND
        the same increment's pages commit marker exist (pages is written
        last), so readers never observe a partially-written or uncommitted
        increment — the parquet emulation of Iceberg snapshot isolation.
        ``as_of=<inc_id>`` reads the table as of that committed snapshot
        (inclusive), Iceberg-time-travel style; ``None`` reads latest.
        Roots are read separately and unioned by name so partition-column
        layouts stay per-root."""
        base = self._stage_path(stage)
        schema_path = os.path.join(base, "_stage_schema.json")
        if os.path.exists(schema_path):
            import json

            from pyspark.sql.types import StructType

            with open(schema_path) as f:
                schema = StructType.fromJson(json.load(f))
            reader = self.spark.read.schema(schema)
        else:
            reader = self.spark.read
        df = reader.parquet(base)
        snapshots = self.list_snapshots()
        if as_of is not None:
            if as_of not in snapshots:
                raise ValueError(f"unknown or uncommitted snapshot {as_of!r}")
            snapshots = snapshots[: snapshots.index(as_of) + 1]
        inc_root = base + "_inc"
        for d in snapshots:
            p = os.path.join(inc_root, d)
            if os.path.isdir(p) and os.path.exists(os.path.join(p, "_SUCCESS")):
                df = df.unionByName(reader.parquet(p))
        return df

    def write_stage(
        self,
        stage: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        validate=None,
    ) -> DataFrame:
        """Materialize a stage, then append per-partition lineage rows.

        ``validate`` (optional callable) runs after the data write but
        BEFORE the lineage commit — if it raises, the stage has no lineage
        row, ``is_done`` stays false, and a resume recomputes it (used for
        single-pass Observation invariant checks)."""
        started = time.time()
        path = self._stage_path(stage)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        if validate is not None:
            validate()
        # persist the stage schema in the manifest: a zero-row partitioned
        # write leaves no data files, so later schema inference would fail
        # (hit by pipelines whose scorer links no entities → zero triples)
        with open(os.path.join(path, "_stage_schema.json"), "w") as f:
            f.write(df.schema.json())
        out = self.spark.read.schema(df.schema).parquet(path)
        per_part = (
            out.groupBy(F.spark_partition_id().alias("part_id"))
            .agg(F.count(F.lit(1)).alias("rows_out"))
            .collect()
        )
        finished = time.time()
        rows = [
            (self.run_id, stage, int(r["part_id"]), int(r["rows_out"]), started, finished, "done")
            for r in per_part
        ] or [(self.run_id, stage, 0, 0, started, finished, "done")]
        self.spark.createDataFrame(rows, LINEAGE_SCHEMA).write.mode("append").parquet(
            os.path.join(self.workdir, "_lineage")
        )
        total = sum(r["rows_out"] for r in per_part)
        self.log_metrics(
            stage,
            {"rows_out": float(total), "seconds": finished - started},
        )
        return out

    def log_metrics(self, stage: str, kv: dict[str, float]) -> None:
        rows = [(self.run_id, stage, k, float(v)) for k, v in kv.items()]
        self.spark.createDataFrame(rows, METRICS_SCHEMA).write.mode("append").parquet(
            os.path.join(self.workdir, "_metrics")
        )

    def read_lineage(self) -> DataFrame | None:
        path = os.path.join(self.workdir, "_lineage")
        if not os.path.exists(path):
            return None
        return self.spark.read.parquet(path)

    def read_metrics(self) -> DataFrame | None:
        path = os.path.join(self.workdir, "_metrics")
        if not os.path.exists(path):
            return None
        return self.spark.read.parquet(path)
