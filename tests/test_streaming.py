"""Structured Streaming ingestion vs the equivalent batch computation.

AvailableNow catch-up over a landing dir must produce exactly the batch
result, and a second run against the same checkpoint must process nothing
new (streaming resume semantics — the streaming twin of the
checkpoint-resume test)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from text_to_graph_spark.streaming.ingest import (
    run_to_parquet,
    stream_extract_triples,
    stream_pages,
    streaming_hourly_rollup,
)


@pytest.fixture()
def landing_dir(spark, pages_smoke, tmp_path):
    d = str(tmp_path / "landing")
    # split the smoke pages into several files to simulate arrivals
    pages_smoke.repartition(4).write.mode("overwrite").parquet(d)
    return d


def _triple_set(rows):
    return {(r["url"], r["chunk_index"], r["pos"], r["subj"], r["pred"], r["obj"]) for r in rows}


def test_stream_catchup_equals_batch(spark, pages_smoke, landing_dir, tmp_path):
    from text_to_graph_spark.operators.extraction import extract_triples_from_pages

    out = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")
    q = run_to_parquet(
        stream_extract_triples(stream_pages(spark, landing_dir)), out, ckpt
    )
    q.awaitTermination(300)
    got = _triple_set(spark.read.parquet(out).collect())
    # batch over the SAME landing files (partition-count independent)
    exp = _triple_set(
        extract_triples_from_pages(spark.read.parquet(landing_dir)).collect()
    )
    assert got == exp
    assert len(got) > 0


def test_stream_resume_processes_nothing_new(spark, landing_dir, tmp_path):
    out = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")
    q = run_to_parquet(
        stream_extract_triples(stream_pages(spark, landing_dir)), out, ckpt
    )
    q.awaitTermination(300)
    n_files_first = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    n_rows_first = spark.read.parquet(out).count()
    # rerun against the same checkpoint: backlog already committed
    q2 = run_to_parquet(
        stream_extract_triples(stream_pages(spark, landing_dir)), out, ckpt
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == n_rows_first
    n_files_second = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_files_second == n_files_first


def test_streaming_hourly_rollup_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    d = str(tmp_path / "events_landing")
    events.repartition(3).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(events.schema)
        .parquet(d)
    )
    rolled = streaming_hourly_rollup(stream)
    q = (
        rolled.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value_cents"])
        for r in spark.sql("select * from rollup_test").collect()
    }
    exp = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value_cents"])
        for r in (
            events.groupBy(
                F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                    "sum_value_cents"
                ),
            )
            .collect()
        )
    }
    assert got == exp
    assert len(got) > 0
