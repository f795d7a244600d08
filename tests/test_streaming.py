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


# ---------------------------------------------------------------------------
# custom stateful operator: applyInPandasWithState sessionization
# ---------------------------------------------------------------------------


def _loop_fold(user_id, secs, carry, gap):
    """Reference per-row loop for the vectorized _fold_batch."""
    closed = []
    for sec in sorted(secs):
        sec = int(sec)
        if carry is None:
            carry = (sec, sec, 1)
        elif sec - carry[1] > gap:
            closed.append(
                (user_id, carry[0], carry[1], carry[2], carry[1] - carry[0])
            )
            carry = (sec, sec, 1)
        else:
            carry = (carry[0], sec, carry[2] + 1)
    return closed, carry


def test_fold_batch_matches_loop_reference():
    import random

    import pandas as pd

    from text_to_graph_spark.streaming.stateful import _fold_batch

    rng = random.Random(7)
    for trial in range(200):
        secs = sorted(rng.randrange(0, 20_000) for _ in range(rng.randrange(0, 25)))
        carry = None
        if rng.random() < 0.6 and secs:
            start = rng.randrange(0, 500)
            carry = (start, start + rng.randrange(0, 300), rng.randrange(1, 5))
            secs = [s + carry[1] for s in secs]  # keep in-order arrival
        got_closed, got_carry = _fold_batch(
            9, pd.Series(secs, dtype="int64"), carry, 1800
        )
        exp_closed, exp_carry = _loop_fold(9, secs, carry, 1800)
        assert got_closed == exp_closed, (trial, secs, carry)
        assert got_carry == exp_carry, (trial, secs, carry)


def test_stateful_sessionize_stream_equals_batch_closed_sessions(
    spark, tmp_path
):
    """The streamed closed-session set over a chronologically sliced backlog
    must equal the batch sessionization minus each user's last session —
    state must genuinely carry across the one-file-per-trigger batches."""
    from pyspark.sql import Window

    from text_to_graph_spark.operators.events import epoch_seconds_ntz
    from text_to_graph_spark.streaming.stateful import (
        stream_event_seconds,
        streaming_sessionize_stateful,
        write_time_sliced_landing,
    )

    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    ev = events.select(
        "user_id", "event_id", epoch_seconds_ntz("ts").alias("sec")
    )
    landing = str(tmp_path / "landing")
    n = write_time_sliced_landing(ev, landing, n_slices=5)
    assert n == 5

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        streaming_sessionize_stateful(stream_event_seconds(spark, landing))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_start_s"], r["session_end_s"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }

    # batch oracle: all sessions except each user's last
    w = Window.partitionBy("user_id").orderBy("sec")
    flagged = ev.withColumn("prev", F.lag("sec").over(w)).withColumn(
        "nf",
        (F.col("prev").isNull() | (F.col("sec") - F.col("prev") > 1800)).cast("int"),
    )
    sess = flagged.withColumn(
        "sid",
        F.sum("nf").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per = sess.groupBy("user_id", "sid").agg(
        F.min("sec").alias("st"), F.max("sec").alias("en"),
        F.count(F.lit(1)).alias("n"),
    )
    last = per.groupBy("user_id").agg(F.max("sid").alias("last_sid"))
    exp = {
        (r["user_id"], r["st"], r["en"], r["n"])
        for r in per.join(last, "user_id")
        .where(F.col("sid") < F.col("last_sid"))
        .collect()
    }
    assert got == exp
    assert got, "no closed sessions at smoke scale — fixture too sparse"


def test_streaming_exact_dedup_across_micro_batches(spark, tmp_path):
    """Duplicates delivered in DIFFERENT micro-batches must still collapse:
    state carries the seen-hash set across triggers."""
    from text_to_graph_spark.streaming.ingest import (
        run_to_parquet,
        stream_docs,
        streaming_exact_dedup,
    )

    a = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "doc_id bigint, text string"
    )
    b = spark.createDataFrame(
        [(4, "beta"), (5, "gamma"), (6, "alpha")], "doc_id bigint, text string"
    )
    landing = str(tmp_path / "landing")
    # two separate writes -> at least two files -> maxFilesPerTrigger=1
    # guarantees the dups in `b` arrive after `a`'s state is committed
    a.coalesce(1).write.mode("overwrite").parquet(landing)
    b.coalesce(1).write.mode("append").parquet(landing)
    q = run_to_parquet(
        streaming_exact_dedup(stream_docs(spark, landing)),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    got = {
        r.content_hash
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    import hashlib

    want = {hashlib.md5(t.encode()).hexdigest() for t in ["alpha", "beta", "gamma"]}
    assert got == want


def test_streaming_dedup_watermark_variant_bounded_state(spark, tmp_path):
    """The watermarked variant also collapses in-window duplicates (and its
    plan uses the evicting dropDuplicatesWithinWatermark operator)."""
    from text_to_graph_spark.streaming.ingest import (
        run_to_parquet,
        streaming_exact_dedup,
    )

    rows = spark.createDataFrame(
        [
            (1, "alpha", "2024-01-01 10:00:00"),
            (2, "alpha", "2024-01-01 10:01:00"),
            (3, "beta", "2024-01-01 10:02:00"),
        ],
        "doc_id bigint, text string, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    landing = str(tmp_path / "landing")
    rows.select("doc_id", "text", "ts").coalesce(1).write.parquet(landing)
    stream = (
        spark.readStream.schema("doc_id bigint, text string, ts timestamp")
        .parquet(landing)
    )
    q = run_to_parquet(
        streaming_exact_dedup(stream, watermark_col="ts"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    got = {
        r.content_hash
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert len(got) == 2


class TestStreamingIncrementalEdges:
    def test_multi_batch_merge_equals_batch_table(self, spark, tmp_path):
        from text_to_graph_spark.operators.canonicalize import (
            triples_to_canonical_edges,
        )
        from text_to_graph_spark.operators.extraction import (
            extract_triples_from_pages,
        )
        from text_to_graph_spark.sources.pages import synthesize_pages
        from text_to_graph_spark.streaming.ingest import (
            streaming_incremental_edges,
        )

        sf = "/root/testdata/sf0.001"
        pages = synthesize_pages(spark, sf)
        landing = str(tmp_path / "landing")
        pages.repartition(8).write.mode("overwrite").parquet(landing)

        q, state = streaming_incremental_edges(
            spark, landing, str(tmp_path / "out"), str(tmp_path / "ckpt"),
            max_files_per_trigger=2,
        )
        q.awaitTermination(600)
        assert state["n_batches"] > 1  # genuinely incremental, not one shot

        got = {
            (r.subj_key, r.pred_key, r.obj_key): (r.n_docs, r.n_occurrences)
            for r in spark.read.parquet(state["path"]).collect()
        }
        want = {
            (r.subj_key, r.pred_key, r.obj_key): (r.n_docs, r.n_occurrences)
            for r in triples_to_canonical_edges(
                extract_triples_from_pages(pages)
            ).collect()
        }
        assert got == want


class TestStreamingKillAndRestart:
    def test_checkpoint_recovery_and_replay_idempotence(self, spark, tmp_path):
        """Mid-stream kill evidence: a restarted query must (a) resume
        from the checkpoint offsets (never re-extract already-committed
        files), (b) merge into the on-disk snapshot lineage rather than
        an empty in-memory state, and (c) under foreachBatch replay of an
        uncommitted batch, re-derive the identical snapshot instead of
        double-adding n_occurrences."""
        import os
        import shutil

        from text_to_graph_spark.operators.canonicalize import (
            triples_to_canonical_edges,
        )
        from text_to_graph_spark.operators.extraction import (
            extract_triples_from_pages,
        )
        from text_to_graph_spark.sources.pages import synthesize_pages
        from text_to_graph_spark.streaming.ingest import (
            streaming_incremental_edges,
        )

        pages = synthesize_pages(spark, "/root/testdata/sf0.001")
        staging = str(tmp_path / "staging")
        pages.repartition(8).write.mode("overwrite").parquet(staging)
        parts = sorted(
            f for f in os.listdir(staging) if f.endswith(".parquet")
        )
        assert len(parts) == 8
        landing = tmp_path / "landing"
        landing.mkdir()
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

        def run():
            q, state = streaming_incremental_edges(
                spark, str(landing), out, ckpt, max_files_per_trigger=2
            )
            q.awaitTermination(600)
            return state

        def table(path):
            return {
                (r.subj_key, r.pred_key, r.obj_key): (
                    r.n_docs, r.n_occurrences,
                )
                for r in spark.read.parquet(path).collect()
            }

        # phase 1: half the corpus lands, job runs to quiescence, "dies"
        for f in parts[:4]:
            shutil.copy(f"{staging}/{f}", landing / f)
        s1 = run()
        assert s1["n_batches"] == 2  # 4 files / maxFilesPerTrigger=2

        # phase 2: rest of the corpus lands; RESTART with same checkpoint
        for f in parts[4:]:
            shutil.copy(f"{staging}/{f}", landing / f)
        s2 = run()
        # offsets recovered: only the 4 NEW files were processed
        assert s2["n_batches"] == 2
        want = {
            (r.subj_key, r.pred_key, r.obj_key): (r.n_docs, r.n_occurrences)
            for r in triples_to_canonical_edges(
                extract_triples_from_pages(pages)
            ).collect()
        }
        assert table(s2["path"]) == want

        # phase 3: forge a mid-commit kill — drop the newest checkpoint
        # commit so Structured Streaming replays the last (already
        # written) batch on restart; counts must not double.
        commits = sorted(
            (f for f in os.listdir(f"{ckpt}/commits") if f.isdigit()),
            key=int,
        )
        os.remove(f"{ckpt}/commits/{commits[-1]}")
        crc = f"{ckpt}/commits/.{commits[-1]}.crc"  # hadoop checksum sidecar
        if os.path.exists(crc):
            os.remove(crc)
        s3 = run()
        assert s3["n_batches"] == 1  # exactly the replayed batch
        assert table(s3["path"]) == want

        # time travel: the first snapshot is the as-of state of batch 0
        # (2 files' pages), monotonically contained in the final table
        from text_to_graph_spark.streaming.ingest import (
            list_edge_snapshots,
            read_edge_snapshot,
        )

        ids = list_edge_snapshots(out)
        assert len(ids) >= 4  # 2 batches per phase, 2 ingest phases
        first = {
            (r.subj_key, r.pred_key, r.obj_key): r.n_occurrences
            for r in read_edge_snapshot(spark, out, ids[0]).collect()
        }
        latest = {
            (r.subj_key, r.pred_key, r.obj_key): (r.n_docs, r.n_occurrences)
            for r in read_edge_snapshot(spark, out).collect()
        }
        assert latest == want  # default read = the as-of-latest state
        for k, n in first.items():
            assert k in want and n <= want[k][1]  # counts only ever grow
        import pytest as _pytest

        with _pytest.raises(ValueError, match="no snapshot"):
            read_edge_snapshot(spark, out, 10_000)


class TestStreamStreamJoin:
    def test_cross_micro_batch_pairs_join_and_window_is_enforced(
        self, spark, tmp_path
    ):
        # planted corpus over a 2 h span sliced into 4 chronological files
        # (2 micro-batches at maxFilesPerTrigger=2): the (view@20min,
        # purchase@70min) pair spans the micro-batch boundary and must
        # still join (view state survives the watermark); the purchase at
        # 100min is 100min after its user's view — outside the 1 h window
        from pyspark.sql import functions as F

        from text_to_graph_spark.streaming.ingest import (
            run_to_parquet,
            stream_events,
            streaming_view_purchase_join,
        )
        from text_to_graph_spark.streaming.stateful import (
            write_time_sliced_landing,
        )

        base = 1_700_000_000
        rows = [
            # (event_id, sec offset min, user, type, value)
            (1, 20, 1, "view", 0.0),
            (2, 70, 1, "purchase", 5.0),   # 50 min after view 1 -> pair
            (3, 0, 2, "view", 0.0),
            (4, 100, 2, "purchase", 7.0),  # 100 min after view 3 -> no pair
            (5, 95, 3, "purchase", 9.0),   # user 3 never viewed -> no pair
        ]
        ev = spark.createDataFrame(
            [
                (eid, base + m * 60, u, t, val, "{}")
                for eid, m, u, t, val in rows
            ],
            "event_id long, sec long, user_id long, event_type string, "
            "value double, props string",
        ).select(
            "event_id",
            F.to_timestamp(F.from_unixtime("sec")).cast("timestamp_ntz").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
            "sec",
        )
        landing = str(tmp_path / "landing")
        assert write_time_sliced_landing(ev, landing, n_slices=4) == 4

        q = run_to_parquet(
            streaming_view_purchase_join(
                stream_events(spark, landing), stream_events(spark, landing)
            ),
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(600)
        import os

        n_batches = len(
            [
                n
                for n in os.listdir(str(tmp_path / "ckpt/offsets"))
                if not n.startswith(".")
            ]
        )
        assert n_batches >= 2, "expected the backlog to span micro-batches"
        got = {
            (r.view_id, r.purchase_id, r.value_cents)
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        }
        assert got == {(1, 2, 500)}

    def test_left_outer_emits_closed_unmatched_views_and_withholds_open(
        self, spark, tmp_path
    ):
        # measured flush semantics: availableNow runs a final state-flush
        # batch at watermark = min(per-side max event time) - delay, so an
        # unmatched view emits a NULL row iff its window end is below that
        # horizon. view 3 (window closes at 60 min < 90 min horizon)
        # emits; view 5 (closes 260 min) is still open and is withheld
        from pyspark.sql import functions as F

        from text_to_graph_spark.streaming.ingest import (
            run_to_parquet,
            stream_events,
            streaming_view_purchase_join,
        )
        from text_to_graph_spark.streaming.stateful import (
            write_time_sliced_landing,
        )

        base = 1_700_000_000
        rows = [
            (1, 20, 1, "view", 0.0),
            (2, 70, 1, "purchase", 5.0),   # matches view 1
            (3, 0, 2, "view", 0.0),        # unmatched, closed -> NULL row
            (4, 100, 2, "purchase", 7.0),  # outside view 3's window
            (5, 200, 3, "view", 0.0),      # unmatched, still open -> withheld
        ]
        ev = spark.createDataFrame(
            [
                (eid, base + m * 60, u, t, val, "{}")
                for eid, m, u, t, val in rows
            ],
            "event_id long, sec long, user_id long, event_type string, "
            "value double, props string",
        ).select(
            "event_id",
            F.to_timestamp(F.from_unixtime("sec"))
            .cast("timestamp_ntz")
            .alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
            "sec",
        )
        landing = str(tmp_path / "landing")
        write_time_sliced_landing(ev, landing, n_slices=4)
        q = run_to_parquet(
            streaming_view_purchase_join(
                stream_events(spark, landing),
                stream_events(spark, landing),
                delay="10 minutes",
                how="left_outer",
            ),
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(600)
        got = {
            (r.view_id, r.purchase_id)
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        }
        assert got == {(1, 2), (3, None)}

    def test_join_state_survives_kill_and_restart(self, spark, tmp_path):
        """The state-store recovery property: a view ingested before the
        job 'dies' must still join a purchase that only arrives after the
        restart — proving buffered join state is recovered from the
        checkpoint, not rebuilt from the (already-consumed) source."""
        import os
        import shutil
        import time as _time

        from pyspark.sql import functions as F

        from text_to_graph_spark.streaming.ingest import (
            run_to_parquet,
            stream_events,
            streaming_view_purchase_join,
        )
        from text_to_graph_spark.streaming.stateful import (
            write_time_sliced_landing,
        )

        base = 1_700_000_000
        rows = [
            (1, 0, 9, "view", 0.0),       # slice 0 filler
            (2, 20, 1, "view", 0.0),      # phase-1 view …
            (3, 70, 1, "purchase", 5.0),  # … joined by a PHASE-2 purchase
            (4, 95, 2, "purchase", 7.0),  # phase-2, no view -> no pair
        ]
        ev = spark.createDataFrame(
            [
                (eid, base + m * 60, u, t, val, "{}")
                for eid, m, u, t, val in rows
            ],
            "event_id long, sec long, user_id long, event_type string, "
            "value double, props string",
        ).select(
            "event_id",
            F.to_timestamp(F.from_unixtime("sec"))
            .cast("timestamp_ntz")
            .alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
            "sec",
        )
        staging = str(tmp_path / "staging")
        write_time_sliced_landing(ev, staging, n_slices=4)
        slices = sorted(
            f for f in os.listdir(staging) if f.endswith(".parquet")
        )
        landing = tmp_path / "landing"
        landing.mkdir()
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

        def run():
            q = run_to_parquet(
                streaming_view_purchase_join(
                    stream_events(spark, str(landing)),
                    stream_events(spark, str(landing)),
                ),
                out,
                ckpt,
            )
            q.awaitTermination(600)

        # phase 1: the first two slices land (both views, no purchase yet),
        # the job drains and "dies"
        for f in slices[:2]:
            shutil.copy(f"{staging}/{f}", landing / f)
            _time.sleep(0.05)
        run()
        assert spark.read.parquet(out).count() == 0  # nothing matched yet

        # phase 2: the purchases land; RESTART against the same checkpoint
        for f in slices[2:]:
            shutil.copy(f"{staging}/{f}", landing / f)
            _time.sleep(0.05)
        run()
        got = {
            (r.view_id, r.purchase_id)
            for r in spark.read.parquet(out).collect()
        }
        # the cross-restart pair exists iff phase-1 view state survived
        assert got == {(2, 3)}

    def test_streamed_pairs_equal_batch_interval_join(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from text_to_graph_spark.operators.events import epoch_seconds_ntz
        from text_to_graph_spark.streaming.ingest import (
            run_to_parquet,
            stream_events,
            streaming_view_purchase_join,
        )
        from text_to_graph_spark.streaming.stateful import (
            write_time_sliced_landing,
        )

        sf = "/root/testdata/sf0.001"
        events = spark.read.parquet(f"{sf}/events.parquet")
        landing = str(tmp_path / "landing")
        write_time_sliced_landing(
            events.withColumn("sec", epoch_seconds_ntz("ts")),
            landing,
            n_slices=4,
        )
        q = run_to_parquet(
            streaming_view_purchase_join(
                stream_events(spark, landing), stream_events(spark, landing)
            ),
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(600)
        got = {
            (r.view_id, r.purchase_id)
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        }
        v = events.where("event_type = 'view'").select(
            F.col("event_id").alias("view_id"),
            "user_id",
            F.col("ts").alias("v_ts"),
        )
        p = events.where("event_type = 'purchase'").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        want = {
            (r.view_id, r.purchase_id)
            for r in v.join(
                p,
                (F.col("user_id") == F.col("p_user"))
                & (F.col("p_ts") >= F.col("v_ts"))
                & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
            ).collect()
        }
        assert got == want and want, "streamed pairs must equal batch join"


class TestStreamStaticEnrichment:
    def test_joined_stream_matches_batch_enrichment(self, spark, tmp_path):
        from text_to_graph_spark.operators.events import enrich_with_customer
        from text_to_graph_spark.streaming.ingest import (
            run_to_parquet,
            stream_events,
            streaming_enriched_events,
        )

        sf = "/root/testdata/sf0.001"
        events = spark.read.parquet(f"{sf}/events.parquet")
        customer = spark.read.parquet(f"{sf}/customer.parquet")
        landing = str(tmp_path / "landing")
        events.repartition(4).write.mode("overwrite").parquet(landing)

        q = run_to_parquet(
            streaming_enriched_events(stream_events(spark, landing), customer),
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(600)

        from pyspark.sql import functions as F

        got = {
            r.c_mktsegment: (r.n_events, r.n_users, r.sum_value_cents)
            for r in spark.read.parquet(str(tmp_path / "out"))
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.count_distinct("user_id").alias("n_users"),
                F.sum("value_cents").alias("sum_value_cents"),
            )
            .collect()
        }
        want = {
            r.c_mktsegment: (r.n_events, r.n_users, r.sum_value_cents)
            for r in enrich_with_customer(events, customer).collect()
        }
        assert got == want


def test_streaming_dsir_admission_equals_batch(spark, tmp_path):
    """Stream admission against the frozen DSIR model must equal the
    batch operator row for row, and restarting the checkpointed query
    must not re-admit already-processed files."""
    from text_to_graph_spark.operators.curation import (
        dsir_admit,
        dsir_bucket_ratios,
    )
    from text_to_graph_spark.streaming.ingest import (
        run_dsir_admission,
        stream_docs,
    )

    fit = spark.createDataFrame(
        [(i, "the quick brown fox jumps over a lazy dog", "en")
         for i in range(6)]
        + [(i, "unrelated words entirely here", "de") for i in range(6, 10)],
        "doc_id long, text string, lang string",
    )
    model = dsir_bucket_ratios(fit).localCheckpoint(eager=True)

    a = spark.createDataFrame(
        [(100, "the quick brown fox"), (101, "zz yy xx ww")],
        "doc_id bigint, text string",
    )
    b = spark.createDataFrame(
        [(102, "a lazy dog jumps")], "doc_id bigint, text string"
    )
    landing = str(tmp_path / "landing")
    a.coalesce(1).write.mode("overwrite").parquet(landing)
    b.coalesce(1).write.mode("append").parquet(landing)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = run_dsir_admission(stream_docs(spark, landing), model, out, ckpt)
    q.awaitTermination(300)

    got = {
        r.doc_id: (r.n_grams, r.weight_ppm, r.admitted)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.doc_id: (r.n_grams, r.weight_ppm, r.admitted)
        for r in dsir_admit(a.unionByName(b), model).collect()
    }
    assert got == want
    assert got[100][2] and not got[101][2]

    # restart with the same checkpoint: no new files -> no new rows
    q2 = run_dsir_admission(stream_docs(spark, landing), model, out, ckpt)
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == len(want)
