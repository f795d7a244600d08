"""Z-order clustering keys and compaction bin-packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from text_to_graph_spark.operators.layout import (
    compaction_plan,
    zorder_file_stats,
    zorder_key_expr,
)


def _morton_py(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b + 1)
        z |= ((y >> b) & 1) << (2 * b)
    return z


class TestZorderKey:
    def test_matches_python_bit_interleave(self, spark):
        cases = [(0, 0), (1, 0), (0, 1), (3, 1), (65535, 65535), (4660, 43981)]
        df = spark.createDataFrame(cases, "x long, y long")
        got = df.select(
            "x", "y",
            F.expr(zorder_key_expr("x", "y")).alias("z"),
        ).collect()
        for r in got:
            assert r.z == _morton_py(r.x, r.y), (r.x, r.y)

    def test_file_stats_cover_all_pages(self, spark):
        import datetime as dt

        pages = spark.createDataFrame(
            [
                (
                    f"https://h{i % 7}.test/p/{i}",
                    dt.datetime(2025, 1, 1) + dt.timedelta(seconds=i * 100),
                )
                for i in range(200)
            ],
            "url string, warc_ts timestamp_ntz",
        )
        stats = zorder_file_stats(pages, n_files=8).collect()
        assert sum(r.n_pages for r in stats) == 200
        for r in stats:
            assert 0 <= r.file_id < 8
            assert r.min_z <= r.max_z
        # file ranges must not overlap: files are Z-ranges
        spans = sorted((r.min_z, r.max_z) for r in stats)
        for (_, hi), (lo, _) in zip(spans, spans[1:]):
            assert hi < lo


class TestCompactionPlan:
    def test_bins_sequential_and_bounded(self, spark):
        files = spark.createDataFrame(
            [(f"f{i:03d}", 300) for i in range(10)],
            "file_name string, bytes long",
        )
        got = {
            r.bin_id: (r.n_files, r.total_bytes, r.first_file, r.last_file)
            for r in compaction_plan(files, target_bytes=1000).collect()
        }
        # cum_before of f0..f9 = 0,300,...,2700 -> bins 0,0,0,0(900->bin0? no:
        # 900//1000=0),1200//1000=1...: bins {0: f0-f3, 1: f4-f6, 2: f7-f9}
        assert got == {
            0: (4, 1200, "f000", "f003"),
            1: (3, 900, "f004", "f006"),
            2: (3, 900, "f007", "f009"),
        }

    def test_overflow_at_most_one_file(self, spark):
        sizes = [(f"g{i:02d}", 100 + 37 * i) for i in range(25)]
        files = spark.createDataFrame(sizes, "file_name string, bytes long")
        target = 1500
        plan = compaction_plan(files, target_bytes=target).collect()
        assert sum(r.n_files for r in plan) == 25
        by_bin = sorted(plan, key=lambda r: r.bin_id)
        # every bin except possibly the last holds >= target - max_file + 1
        # bytes... the invariant from the closed form: a bin's span of
        # cum_before values fits in [bin*target, (bin+1)*target)
        for r in by_bin:
            assert r.total_bytes <= target + max(s for _, s in sizes)


class TestZoneMapPruning:
    def test_zorder_prunes_hash_does_not(self, spark):
        import datetime as dt

        from text_to_graph_spark.operators.layout import zone_map_pruning

        pages = spark.createDataFrame(
            [
                (
                    f"https://h{i % 9}.test/p/{i}",
                    dt.datetime(2025, 1, 1) + dt.timedelta(seconds=i * 50),
                )
                for i in range(600)
            ],
            "url string, warc_ts timestamp_ntz",
        )
        rows = zone_map_pruning(pages).collect()
        skipped = {"url_hash": 0, "zorder": 0}
        pages_total = {"url_hash": 0, "zorder": 0}
        for r in rows:
            pages_total[r.layout] += r.n_pages
            skipped[r.layout] += int(r.is_skipped)
            assert r.min_sec <= r.max_sec
        # both layouts account for every page
        assert pages_total["url_hash"] == 600 == pages_total["zorder"]
        # the point of the operator: hash layout cannot skip, Z-order can
        assert skipped["url_hash"] == 0
        assert skipped["zorder"] > 0


class TestRobotsFilter:
    def test_disallowed_prefixes_removed(self, spark):
        from text_to_graph_spark.operators.weblinks import robots_filter

        links = spark.createDataFrame(
            [
                ("https://s.test/x", 0, "https://a.test/keep/1", "k"),
                ("https://s.test/x", 1, "https://a.test/private/1", "p"),
                ("https://s.test/x", 2, "https://b.test/private/2", "p"),
            ],
            "src_url string, pos int, href string, anchor string",
        )
        # only host a.test disallows /private
        rules = spark.createDataFrame(
            [("a.test", "/private")], "host string, disallow_prefix string"
        )
        got = {r.norm_href for r in robots_filter(links, rules).collect()}
        assert got == {
            "https://a.test/keep/1",
            "https://b.test/private/2",  # b.test has no rule
        }


class TestNtriplesExport:
    def test_escaping_and_line_shapes(self, spark):
        """Adversarial labels (backslash/quote/newline/tab) escape to valid
        N-Triples; edge and label lines parse back losslessly."""
        from text_to_graph_spark.sinks.graph_tables import render_ntriples

        edges = spark.createDataFrame(
            [('a"b', "p", "c\\d"), ("e\nf", "p", "g\th")],
            "subj_key string, pred_key string, obj_key string",
        )
        lines = [r.ntriple for r in render_ntriples(edges).collect()]
        assert len(lines) == 2 + 4  # 2 edges + 4 distinct node labels
        for ln in lines:
            assert ln.endswith(" .")
            assert "\n" not in ln and "\t" not in ln  # raw control chars escaped
        labels = sorted(ln for ln in lines if ":label> " in ln)
        assert any('"a\\"b"' in ln for ln in labels)
        assert any('"c\\\\d"' in ln for ln in labels)
        assert any('"e\\nf"' in ln for ln in labels)
        assert any('"g\\th"' in ln for ln in labels)

    def test_pure_projection_no_shuffle_for_edge_lines(self, spark):
        from text_to_graph_spark.plans.introspect import count_exchanges
        from text_to_graph_spark.sinks.graph_tables import render_ntriples

        edges = spark.createDataFrame(
            [("a", "p", "b")], "subj_key string, pred_key string, obj_key string"
        )
        # one distinct for the label map is the only exchange
        assert count_exchanges(render_ntriples(edges)) <= 1


class TestSnapshotRetention:
    def test_expiry_plan_policy(self, spark):
        """24-tail + day-head retention: exact survivor set on a 3-day
        hourly snapshot log."""
        import datetime as dt

        from text_to_graph_spark.operators.layout import snapshot_expiry_plan

        t0 = dt.datetime(2024, 1, 1)
        snaps = spark.createDataFrame(
            [(i, t0 + dt.timedelta(hours=i)) for i in range(72)],
            "snapshot_id long, committed_at timestamp_ntz",
        )
        got = {r["snapshot_id"]: r for r in snapshot_expiry_plan(snaps).collect()}
        assert len(got) == 72
        for i in range(72):
            r = got[i]
            if i >= 48:  # last 24 by time
                assert (r["survives"], r["reason"]) == (True, "tail")
            elif i in (0, 24):  # first snapshot of day 1 and day 2
                assert (r["survives"], r["reason"]) == (True, "day_head")
            else:
                assert (r["survives"], r["reason"]) == (False, "expired")

    def test_physical_expiry_and_expired_read_raises(self, spark, tmp_path):
        import pytest

        from text_to_graph_spark.streaming.ingest import (
            expire_edge_snapshots,
            list_edge_snapshots,
            read_edge_snapshot,
        )

        base = str(tmp_path / "edges")
        for i in range(5):
            spark.createDataFrame([(i,)], "batch long").write.parquet(
                f"{base}/v{i}"
            )
        assert list_edge_snapshots(base) == [0, 1, 2, 3, 4]
        res = expire_edge_snapshots(base, keep_last=2)
        assert res == {"kept": [3, 4], "removed": [0, 1, 2]}
        assert list_edge_snapshots(base) == [3, 4]
        # kept snapshots read fine; expired ids raise, never misread
        assert read_edge_snapshot(spark, base, 3).first()["batch"] == 3
        with pytest.raises(ValueError, match="no snapshot v1"):
            read_edge_snapshot(spark, base, 1)
        # idempotent
        assert expire_edge_snapshots(base, keep_last=2)["removed"] == []

    def test_manifest_compaction_per_spec_bins(self, spark):
        from text_to_graph_spark.operators.layout import manifest_compaction_plan

        rows = [("a", f"m{i:02d}", 100) for i in range(5)] + [
            ("b", f"m{i:02d}", 100) for i in range(3)
        ]
        out = manifest_compaction_plan(
            spark.createDataFrame(rows, "spec string, manifest string, n_entries long"),
            target_entries=256,
        ).collect()
        by_key = {(r["spec"], r["bin_id"]): r for r in out}
        # spec a: cum_before 0,100,200 -> bin 0; 300,400 -> bin 1
        assert by_key[("a", 0)]["n_manifests"] == 3
        assert by_key[("a", 1)]["n_manifests"] == 2
        # spec b packs independently (specs never mix)
        assert by_key[("b", 0)]["n_manifests"] == 3
        assert ("b", 1) not in by_key


class TestSchemaEvolution:
    def test_pre_evolution_snapshot_reads_null_not_error(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from text_to_graph_spark.operators.layout import evolved_scan

        v0 = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        v1 = spark.createDataFrame(
            [(2, "b", "en")], "doc_id long, text string, lang string"
        )
        v0.write.parquet(str(tmp_path / "v0"))
        v1.write.parquet(str(tmp_path / "v1"))
        got = {
            r.doc_id: r.lang
            for r in evolved_scan(
                spark, [str(tmp_path / "v0"), str(tmp_path / "v1")]
            ).collect()
        }
        # the old snapshot's rows surface the new column as NULL, both
        # snapshots' rows survive, and no file was rewritten
        assert got == {1: None, 2: "en"}
        assert len(list((tmp_path / "v0").glob("*.parquet"))) >= 1


class TestPartitionEvolution:
    def test_new_spec_prunes_directories_old_spec_row_filters(
        self, spark, tmp_path
    ):
        from pyspark.sql import functions as F

        from text_to_graph_spark.operators.layout import (
            evolved_partition_scan,
        )

        rows = [
            (1, "s1", "en", "a"),
            (2, "s1", "fr", "b"),
            (3, "s2", "en", "c"),
            (4, "s2", "fr", "d"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, lang string, text string"
        )
        df.where("doc_id <= 2").write.partitionBy("source").parquet(
            str(tmp_path / "v0")
        )
        df.where("doc_id >= 3").write.partitionBy("source", "lang").parquet(
            str(tmp_path / "v1")
        )
        u = evolved_partition_scan(
            spark, [str(tmp_path / "v0"), str(tmp_path / "v1")]
        )
        q = u.where(F.col("lang") == "en")
        got = sorted(r.doc_id for r in q.collect())
        assert got == [1, 3]
        # the new-spec scan prunes on lang as a PARTITION filter; the
        # old-spec side can only row-filter (lang is a data column there)
        import re

        plan = q._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"PartitionFilters: \[[^\]]*lang", plan), (
            "new-spec scan did not prune on lang as a partition filter"
        )


class TestConstraintAudit:
    def test_each_kind_counts_violations_exactly(self, spark):
        from text_to_graph_spark.operators.profile import constraint_audit

        parent = spark.createDataFrame(
            [(1,), (2,)], "pk long"
        )
        child = spark.createDataFrame(
            [(1, 1, 5), (2, 1, -3), (3, 9, 2), (4, None, 1), (4, 2, 0)],
            "ck long, fk long, v long",
        )
        got = {
            r.constraint: (r.n_checked, r.n_violations, r.passed)
            for r in constraint_audit(
                {"c": child, "p": parent},
                [
                    {"kind": "unique", "table": "c", "col": "ck"},
                    {"kind": "not_null", "table": "c", "col": "fk"},
                    {"kind": "check", "table": "c", "name": "v_pos",
                     "expr": "v > 0"},
                    {"kind": "foreign_key", "table": "c", "col": "fk",
                     "ref_table": "p", "ref_col": "pk"},
                ],
            ).collect()
        }
        assert got["unique:c.ck"] == (5, 1, False)       # ck=4 twice
        assert got["not_null:c.fk"] == (5, 1, False)     # one null fk
        assert got["check:c.v_pos"] == (5, 2, False)     # -3 and 0
        # fk=9 is an orphan; the null fk is not checked by the FK rule
        assert got["foreign_key:c.fk->p.pk"] == (4, 1, False)

    def test_unknown_kind_and_empty_list_raise(self, spark):
        import pytest

        from text_to_graph_spark.operators.profile import constraint_audit

        df = spark.createDataFrame([(1,)], "x long")
        with pytest.raises(ValueError, match="unknown constraint kind"):
            constraint_audit({"t": df}, [{"kind": "nope", "table": "t"}])
        with pytest.raises(ValueError, match="empty constraint list"):
            constraint_audit({"t": df}, [])


class TestExecutedRewrites:
    def test_execute_compaction_invariants_hold(self, spark, tmp_path):
        from text_to_graph_spark.operators.layout import execute_compaction

        df = spark.createDataFrame(
            [(i, f"text {i} " * 20, "en", f"s{i % 3}") for i in range(200)],
            "doc_id long, text string, lang string, source string",
        )
        row = execute_compaction(
            spark, df, str(tmp_path / "c"), target_bytes=16 * 1024, fragments=16
        ).collect()[0]
        assert row.rows_total == 200
        assert row.rows_match and row.content_match
        assert row.one_file_per_bin and row.bins_contiguous

    def test_table_hash_detects_single_row_mutation(self, spark):
        from text_to_graph_spark.operators.layout import _table_hash

        a = spark.createDataFrame(
            [(i, f"v{i}") for i in range(50)], "id long, v string"
        )
        b = spark.createDataFrame(
            [(i, "vX" if i == 17 else f"v{i}") for i in range(50)],
            "id long, v string",
        )
        ha = _table_hash(a, "t").collect()[0]
        hb = _table_hash(b, "t").collect()[0]
        assert ha.rows_t == hb.rows_t == 50
        assert ha.hash_t != hb.hash_t
        # column order does not matter (sorted internally)
        hc = _table_hash(a.select("v", "id"), "t").collect()[0]
        assert hc.hash_t == ha.hash_t

    def test_execute_zorder_matches_planner_assignment(self, spark, tmp_path):
        """The physical rewrite must realize the planner's zone-map story:
        per-file min/max from the files READ BACK equal the planned
        Z-range assignment's, and a mid-range predicate skips files."""
        from text_to_graph_spark.operators.layout import (
            execute_zorder,
            zone_map_pruning,
        )
        from text_to_graph_spark.sources.pages import synthesize_pages

        pages = synthesize_pages(spark, SF_SMOKE)
        physical = {
            r.file_id: (r.n_pages, r.min_sec, r.max_sec, r.is_skipped)
            for r in execute_zorder(spark, pages, str(tmp_path / "z")).collect()
        }
        planned = {
            r.file_id: (r.n_pages, r.min_sec, r.max_sec, r.is_skipped)
            for r in zone_map_pruning(pages).collect()
            if r.layout == "zorder"
        }
        assert physical == planned
        assert any(v[3] for v in physical.values())  # some files skipped
