"""Checkpoint-resumable stage boundaries + lineage metrics.

The reference makes every stage content-addressed and resumable through a
SQLite response cache keyed ``(document_id, chunk_index, config_id)``
(``graph_extractor/src/sqlite_support.py:275-330``; skip-if-cached at
``graph_generator.py:183,227,260``). The distributed equivalent:

- each stage writes a parquet (Iceberg in production) table under
  ``<workdir>/<stage>/config_id=<id>/`` — partitioned by config so reruns
  with different configs never collide;
- resume = ``left_anti`` join of the incoming keys against the already-
  checkpointed keys (J4 in SURVEY.md §2.6) — only misses are recomputed, then
  the union of cached + fresh is returned;
- every materialization appends per-partition lineage rows
  ``(stage, config_id, partition_id, rows_out, wall_ms, ts)`` to
  ``<workdir>/_metrics`` (the build contract's lineage requirement).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageCheckpoint:
    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)

    def _path(self, stage: str, config_id: str) -> str:
        return os.path.join(self.workdir, stage, f"config_id={config_id}")

    def exists(self, stage: str, config_id: str) -> bool:
        p = self._path(stage, config_id)
        return os.path.exists(os.path.join(p, "_SUCCESS"))

    def read(self, stage: str, config_id: str) -> DataFrame:
        return self.spark.read.parquet(self._path(stage, config_id))

    def write(self, df: DataFrame, stage: str, config_id: str) -> DataFrame:
        """Materialize a full stage table (overwrite) + metrics; returns the
        re-read DataFrame so downstream reads the files, cutting lineage."""
        t0 = time.monotonic()
        path = self._path(stage, config_id)
        df.write.mode("overwrite").parquet(path)
        out = self.read(stage, config_id)
        self._record_metrics(out, stage, config_id, time.monotonic() - t0)
        return out

    def resume(
        self,
        incoming_keys: DataFrame,
        stage: str,
        config_id: str,
        key_cols: list[str],
        compute,
    ) -> DataFrame:
        """Process only keys without a checkpointed result.

        ``compute(missing_keys_df) -> DataFrame`` produces rows for the
        missing keys; they are appended to the stage table. Returns the
        complete stage table. Mirrors ``optimization_on`` semantics
        (``graph_generator.py:183``).
        """
        path = self._path(stage, config_id)
        if self.exists(stage, config_id):
            cached = self.read(stage, config_id)
            missing = incoming_keys.join(
                cached.select(*key_cols).distinct(), key_cols, "left_anti"
            )
            if missing.limit(1).count() == 0:
                return cached
            t0 = time.monotonic()
            fresh = compute(missing)
            fresh.write.mode("append").parquet(path)
            out = self.read(stage, config_id)
            self._record_metrics(out, stage, config_id, time.monotonic() - t0)
            return out
        t0 = time.monotonic()
        fresh = compute(incoming_keys)
        fresh.write.mode("overwrite").parquet(path)
        out = self.read(stage, config_id)
        self._record_metrics(out, stage, config_id, time.monotonic() - t0)
        return out

    def _record_metrics(
        self, df: DataFrame, stage: str, config_id: str, wall_s: float
    ) -> None:
        """Per-partition lineage rows: rows_out by file partition."""
        metrics = (
            df.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .agg(F.count(F.lit(1)).alias("rows_out"))
            .select(
                F.lit(stage).alias("stage"),
                F.lit(config_id).alias("config_id"),
                F.col("_pid").alias("partition_id"),
                "rows_out",
                F.lit(round(wall_s * 1000)).alias("wall_ms"),
                F.current_timestamp().alias("recorded_at"),
            )
        )
        metrics.write.mode("append").parquet(os.path.join(self.workdir, "_metrics"))

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.workdir, "_metrics"))
