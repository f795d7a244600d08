"""Checkpoint-resume semantics (reference `optimization_on`,
graph_generator.py:183): kill-and-rerun produces identical output and
recomputes only missing keys; lineage metrics rows are recorded."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_to_graph_spark.sources.checkpoint import StageCheckpoint


def _keys(spark, n):
    return spark.range(n).select(F.col("id").alias("k"))


def test_write_read_roundtrip(spark, tmp_path):
    cp = StageCheckpoint(spark, str(tmp_path))
    df = _keys(spark, 10).withColumn("v", F.col("k") * 2)
    out = cp.write(df, "stage_a", "cfg1")
    assert out.count() == 10
    assert cp.exists("stage_a", "cfg1")
    assert not cp.exists("stage_a", "cfg2")  # config isolation
    again = cp.read("stage_a", "cfg1")
    assert again.orderBy("k").collect() == out.orderBy("k").collect()


def test_resume_computes_only_missing(spark, tmp_path):
    cp = StageCheckpoint(spark, str(tmp_path))
    calls = []

    def compute(keys_df):
        pdf = keys_df.toPandas()
        calls.append(sorted(pdf["k"].tolist()))
        return keys_df.withColumn("v", F.col("k") * 10)

    # first run: everything computed
    out1 = cp.resume(_keys(spark, 5), "s", "c", ["k"], compute)
    assert out1.count() == 5
    assert calls == [[0, 1, 2, 3, 4]]

    # superset rerun: only the 3 new keys hit compute
    out2 = cp.resume(_keys(spark, 8), "s", "c", ["k"], compute)
    assert out2.count() == 8
    assert calls[1] == [5, 6, 7]
    got = {r["k"]: r["v"] for r in out2.collect()}
    assert got == {k: k * 10 for k in range(8)}

    # identical rerun ("kill and restart"): zero recompute, identical output
    out3 = cp.resume(_keys(spark, 8), "s", "c", ["k"], compute)
    assert len(calls) == 2
    assert {r["k"]: r["v"] for r in out3.collect()} == got


def test_metrics_lineage_rows(spark, tmp_path):
    cp = StageCheckpoint(spark, str(tmp_path))
    cp.write(_keys(spark, 100).withColumn("v", F.lit("x")), "stage_m", "cfg")
    m = cp.metrics().toPandas()
    assert set(m.columns) >= {
        "stage", "config_id", "partition_id", "rows_out", "wall_ms", "recorded_at",
    }
    bystage = m[m["stage"] == "stage_m"]
    assert bystage["rows_out"].sum() == 100


def test_different_config_recomputes(spark, tmp_path):
    cp = StageCheckpoint(spark, str(tmp_path))
    calls = []

    def compute(keys_df):
        calls.append(keys_df.count())
        return keys_df.withColumn("v", F.lit(1))

    cp.resume(_keys(spark, 3), "s", "cfgA", ["k"], compute)
    cp.resume(_keys(spark, 3), "s", "cfgB", ["k"], compute)
    assert calls == [3, 3]  # cfgB must not see cfgA's cache


def test_run_pipeline_checkpointed_resume_and_salted_parity(spark, pages_smoke, tmp_path):
    from pyspark.sql import functions as F

    from text_to_graph_spark.operators.canonicalize import (
        triples_to_canonical_edges,
    )
    from text_to_graph_spark.pipeline import (
        PipelineConfig,
        run_pipeline_checkpointed,
    )

    wd = str(tmp_path / "stages")
    first = run_pipeline_checkpointed(spark, pages_smoke, wd, PipelineConfig())
    n_triples = first["triples"].count()
    key = lambda df: {
        (r["subj_key"], r["pred_key"], r["obj_key"], r["n_occurrences"])
        for r in df.collect()
    }
    edges_first = key(first["edges"].select("subj_key", "pred_key", "obj_key", "n_occurrences"))

    # second run resumes: identical outputs, no new triple rows appended
    second = run_pipeline_checkpointed(spark, pages_smoke, wd, PipelineConfig())
    assert second["triples"].count() == n_triples
    assert key(second["edges"].select("subj_key", "pred_key", "obj_key", "n_occurrences")) == edges_first

    # lineage metrics recorded for every materialized stage
    stages = {
        r["stage"] for r in first["checkpoint"].metrics().select("stage").distinct().collect()
    }
    assert {"extracted", "chunks", "triples", "edges", "nodes"} <= stages

    # salted two-phase aggregation is value-identical to the unsalted path
    t = first["triples"]
    unsalted = triples_to_canonical_edges(t)
    salted = triples_to_canonical_edges(t, salt_buckets=8)
    cols = ["subj_key", "pred_key", "obj_key", "subj_label", "pred_label",
            "obj_label", "n_docs", "n_occurrences"]
    as_set = lambda df: {tuple(r) for r in df.select(*cols).collect()}
    assert as_set(salted) == as_set(unsalted)
    docs_eq = (
        unsalted.select("subj_key", "pred_key", "obj_key", "doc_ids")
        .join(
            salted.select(
                "subj_key", "pred_key", "obj_key",
                F.col("doc_ids").alias("doc_ids_s"),
            ),
            ["subj_key", "pred_key", "obj_key"],
        )
        .where(F.col("doc_ids") != F.col("doc_ids_s"))
        .count()
    )
    assert docs_eq == 0
