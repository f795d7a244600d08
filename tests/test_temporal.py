"""As-of / range join: semantics vs a brute-force pandas oracle, plus the
plan shapes that make them scale-safe (no cartesian, bounded shuffles)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from text_to_graph_spark.operators.temporal import asof_join, range_join
from text_to_graph_spark.plans.introspect import count_exchanges, plan_str

LEFT = [
    # (event_id, user_id, sec)
    (1, 10, 100),
    (2, 10, 200),
    (3, 10, 50),   # before any right row for user 10
    (4, 20, 500),
    (5, 30, 10),   # user with no right rows at all
    (6, 10, 150),  # exactly at a right timestamp (tie: same-instant match)
]
RIGHT = [
    # (user_id, sec, event_id, value_cents)
    (10, 90, 101, 5),
    (10, 150, 102, 7),
    (10, 150, 103, 9),   # duplicate timestamp: greatest event_id must win
    (20, 500, 201, 11),  # same-instant as left row 4
    (20, 100, 202, 13),
]


def _dfs(spark):
    l = spark.createDataFrame(LEFT, "event_id bigint, user_id bigint, sec bigint")
    r = spark.createDataFrame(
        RIGHT, "user_id bigint, sec bigint, event_id bigint, value_cents bigint"
    )
    return l, r


def _brute_asof(tolerance=None):
    rows = {}
    for eid, uid, sec in LEFT:
        cands = [r for r in RIGHT if r[0] == uid and r[1] <= sec]
        if tolerance is not None:
            cands = [r for r in cands if r[1] >= sec - tolerance]
        if cands:
            best = max(cands, key=lambda r: (r[1], r[2]))
            rows[eid] = (best[2], best[3], sec - best[1])
        else:
            rows[eid] = (None, None, None)
    return rows


class TestAsofJoin:
    def _run(self, spark, tolerance=None):
        l, r = _dfs(spark)
        out = asof_join(
            l, r, on="user_id", left_time="sec", right_time="sec",
            right_id="event_id", payload_cols=["event_id", "value_cents"],
            tolerance=tolerance,
        ).toPandas()
        return {
            int(row.event_id): (
                None if pd.isna(row.asof_event_id) else int(row.asof_event_id),
                None if pd.isna(row.asof_value_cents) else int(row.asof_value_cents),
                None if pd.isna(row.asof_lag_s) else int(row.asof_lag_s),
            )
            for row in out.itertuples()
        }

    def test_matches_brute_force(self, spark):
        assert self._run(spark) == _brute_asof()

    def test_tolerance_nulls_stale_matches(self, spark):
        got = self._run(spark, tolerance=60)
        assert got == _brute_asof(tolerance=60)
        # row 2 (sec=200) only has clicks at 150 within 60s; row 1 (sec=100)
        # keeps its 90s match; stale-only users go null
        assert got[2][0] == 103 and got[1][0] == 101

    def test_same_instant_and_duplicate_ts_ties(self, spark):
        got = self._run(spark)
        assert got[6] == (103, 9, 0)   # same-instant + max event_id wins
        assert got[4] == (201, 11, 0)  # same-instant match included
        assert got[3] == (None, None, None)
        assert got[5] == (None, None, None)

    def test_plan_is_one_window_pass_no_join(self, spark):
        l, r = _dfs(spark)
        out = asof_join(
            l, r, on="user_id", left_time="sec", right_time="sec",
            right_id="event_id", payload_cols=["event_id"],
        )
        p = plan_str(out, "simple")
        assert "Join" not in p  # union + window, not a join at all
        assert "CartesianProduct" not in p
        # one hash-partition exchange for the window (local[n] test master
        # adds no input repartition for createDataFrame)
        assert count_exchanges(out) == 1


class TestRangeJoin:
    def test_matches_brute_force(self, spark):
        l, r = _dfs(spark)
        out = range_join(
            l, r, on="user_id", left_time="sec", right_time="sec", window=60
        ).toPandas()
        got = {
            (int(t.event_id), int(t.event_id_r))
            for t in out.itertuples()
        }
        want = {
            (le, re_)
            for le, lu, ls in LEFT
            for ru, rs, re_, _ in RIGHT
            if lu == ru and abs(ls - rs) <= 60
        }
        assert got == want
        # exactly-once per qualifying pair (bucket explode must not dup)
        assert len(out) == len(want)

    def test_boundary_inclusive_and_negative_times(self, spark):
        l = spark.createDataFrame(
            [(1, 1, -30), (2, 1, 30)], "event_id bigint, user_id bigint, sec bigint"
        )
        r = spark.createDataFrame(
            [(1, -90, 9, 1), (1, 90, 8, 1), (1, -91, 7, 1)],
            "user_id bigint, sec bigint, event_id bigint, value_cents bigint",
        )
        out = range_join(
            l, r, on="user_id", left_time="sec", right_time="sec", window=60
        ).toPandas()
        got = {(int(t.event_id), int(t.event_id_r)) for t in out.itertuples()}
        assert got == {(1, 9), (2, 8)}  # |dt|=60 inclusive; 61 excluded

    def test_plan_is_equi_join_no_cartesian(self, spark):
        l, r = _dfs(spark)
        out = range_join(
            l, r, on="user_id", left_time="sec", right_time="sec", window=60
        )
        p = plan_str(out, "simple")
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


class TestSnapshotDelta:
    def test_status_labels(self, spark):
        import datetime as dt

        from text_to_graph_spark.operators.temporal import snapshot_delta

        # 4 pages over 0..90s -> cutoff at 45s (midpoint)
        pages = spark.createDataFrame(
            [
                (f"u{i}", dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s))
                for i, s in enumerate([0, 30, 60, 90])
            ],
            "url string, warc_ts timestamp_ntz",
        )
        triples = spark.createDataFrame(
            [
                ("u0", "a", "p", "b"),  # before cutoff only -> stable
                ("u1", "c", "p", "d"),  # before cutoff...
                ("u3", "c", "p", "d"),  # ...and after -> grown
                ("u2", "e", "p", "f"),  # after cutoff only -> new
            ],
            "url string, subj string, pred string, obj string",
        )
        got = {
            (r.subj, r.obj): (r.n_docs, r.n_docs_asof, r.status)
            for r in snapshot_delta(triples, pages).collect()
        }
        assert got == {
            ("a", "b"): (1, 1, "stable"),
            ("c", "d"): (2, 1, "grown"),
            ("e", "f"): (1, 0, "new"),
        }


class TestEntityTimeline:
    def test_daily_counts_per_endpoint_role(self, spark):
        import datetime as dt

        from text_to_graph_spark.operators.temporal import entity_timeline

        pages = spark.createDataFrame(
            [
                ("u1", dt.datetime(2025, 1, 1, 5)),
                ("u2", dt.datetime(2025, 1, 1, 9)),
                ("u3", dt.datetime(2025, 1, 2, 5)),
            ],
            "url string, warc_ts timestamp_ntz",
        )
        triples = spark.createDataFrame(
            [
                ("u1", "a", "b"),
                ("u2", "a", "c"),
                ("u3", "a", "b"),
            ],
            "url string, subj string, obj string",
        )
        got = {
            (r.node, r.day): r.n_docs
            for r in entity_timeline(triples, pages).collect()
        }
        assert got[("a", "2025-01-01")] == 2
        assert got[("a", "2025-01-02")] == 1
        assert got[("b", "2025-01-01")] == 1
        assert got[("c", "2025-01-01")] == 1


class TestFactHistory:
    def test_window_and_support(self, spark):
        import datetime as dt

        from text_to_graph_spark.operators.temporal import fact_history

        def ts(sec):
            return dt.datetime(2025, 1, 1) + dt.timedelta(seconds=sec)

        pages = spark.createDataFrame(
            [("u1", ts(100)), ("u2", ts(200)), ("u3", ts(350))],
            "url string, warc_ts timestamp",
        )
        triples = spark.createDataFrame(
            [
                ("u1", "a", "p", "x"),
                ("u1", "a", "p", "x"),  # same-doc repeat: one support
                ("u2", "a", "p", "x"),
                ("u3", "b", "p", "y"),
            ],
            "url string, subj string, pred string, obj string",
        )
        got = {
            (r.subj, r.pred, r.obj): (
                r.first_seen, r.last_seen, r.span_s, r.n_docs
            )
            for r in fact_history(triples, pages).collect()
        }
        base = int(dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc).timestamp())
        assert got == {
            ("a", "p", "x"): (base + 100, base + 200, 100, 2),
            ("b", "p", "y"): (base + 350, base + 350, 0, 1),
        }


class TestFactValidityIntervals:
    def test_gaps_and_islands(self, spark):
        from text_to_graph_spark.operators.temporal import fact_validity_intervals

        # fact (s,p,o) captured at epochs 100,110,150,155,300; max_gap=20
        # -> islands [100,110], [150,155], [300,300]
        epochs = [100, 110, 150, 155, 300]
        pages = spark.createDataFrame(
            [(f"u{i}", e) for i, e in enumerate(epochs)], "url string, sec long"
        ).select("url", F.timestamp_seconds("sec").alias("warc_ts"))
        triples = spark.createDataFrame(
            [(f"u{i}", "s", "p", "o") for i in range(len(epochs))],
            "url string, subj string, pred string, obj string",
        )
        got = sorted(
            fact_validity_intervals(triples, pages, max_gap_s=20).collect(),
            key=lambda r: r.interval_id,
        )
        assert [
            (r.interval_id, r.first_seen, r.last_seen, r.n_captures) for r in got
        ] == [(1, 100, 110, 2), (2, 150, 155, 2), (3, 300, 300, 1)]

    def test_duplicate_captures_collapse(self, spark):
        from text_to_graph_spark.operators.temporal import fact_validity_intervals

        # two urls at the SAME epoch are one observation (distinct epochs)
        pages = spark.createDataFrame(
            [("u0", 100), ("u1", 100)], "url string, sec long"
        ).select("url", F.timestamp_seconds("sec").alias("warc_ts"))
        triples = spark.createDataFrame(
            [("u0", "s", "p", "o"), ("u1", "s", "p", "o")],
            "url string, subj string, pred string, obj string",
        )
        rows = fact_validity_intervals(triples, pages, max_gap_s=20).collect()
        assert len(rows) == 1 and rows[0].n_captures == 1


class TestActiveFacts:
    def test_staleness_gate(self, spark):
        from text_to_graph_spark.operators.temporal import active_facts

        # fact A last asserted at the frontier (active); fact B went silent
        # at 100 while the corpus frontier is 300 (stale); A has 2 islands
        epochs = {"u0": 100, "u1": 290, "u2": 300, "u3": 100}
        pages = spark.createDataFrame(
            list(epochs.items()), "url string, sec long"
        ).select("url", F.timestamp_seconds("sec").alias("warc_ts"))
        triples = spark.createDataFrame(
            [("u0", "a", "p", "o"), ("u1", "a", "p", "o"), ("u2", "a", "p", "o"),
             ("u3", "b", "p", "o")],
            "url string, subj string, pred string, obj string",
        )
        got = {r.subj: r for r in active_facts(triples, pages, max_gap_s=20).collect()}
        assert got["a"].active is True
        assert (got["a"].last_seen, got["a"].n_intervals) == (300, 2)
        assert got["b"].active is False and got["b"].n_intervals == 1
