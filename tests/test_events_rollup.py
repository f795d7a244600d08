"""Hypertable rollup + KMV sketch: semantic invariants, sketch accuracy and
fallback branches, and the single-Expand plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_to_graph_spark.operators.events import hypertable_rollup, kmv_distinct
from text_to_graph_spark.plans.introspect import plan_str


def _events(spark, n_users=200, n_events=2000):
    # deterministic synthetic events across 3 days / 2 types
    return spark.range(n_events).select(
        F.col("id").alias("event_id"),
        (F.col("id") % n_users).alias("user_id"),
        F.when(F.col("id") % 2 == 0, "click").otherwise("view").alias("event_type"),
        F.timestamp_seconds(
            F.lit(1700000000) + (F.col("id") % 259200)
        ).cast("timestamp_ntz").alias("ts"),
        (F.col("id") % 97).cast("double").alias("value"),
    )


class TestHypertableRollup:
    def test_grain_consistency(self, spark):
        ev = _events(spark)
        out = hypertable_rollup(ev).cache()
        total = ev.count()
        # every grain x event_type cut partitions the event set
        for grain in ["hour", "day", "month"]:
            got = (
                out.filter((F.col("grain") == grain) & (F.col("event_type") != "*"))
                .agg(F.sum("n_events"))
                .first()[0]
            )
            assert got == total, grain
        allrow = out.filter(F.col("grain") == "all").collect()
        assert len(allrow) == 1
        assert allrow[0].n_events == total
        assert allrow[0].bucket == "*" and allrow[0].event_type == "*"
        # day cut without event_type exists too (bucket='day value', type='*')
        day_star = out.filter(
            (F.col("grain") == "day") & (F.col("event_type") == "*")
        )
        assert day_star.agg(F.sum("n_events")).first()[0] == total

    def test_single_expand_plan(self, spark):
        out = hypertable_rollup(_events(spark))
        p = plan_str(out, "simple")
        # grouping sets compile to Expand, not a union of aggregates
        assert p.count("Expand") >= 1
        assert "Union" not in p


class TestKmvDistinct:
    def test_estimate_accuracy(self, spark):
        # event_type splits ids by parity, so each type sees exactly 100
        # distinct users; k=64 KMV's ~1/sqrt(k-1) ≈ 13% relative error band
        # makes 40% a loose but non-flaky bound
        out = {r.event_type: r for r in kmv_distinct(_events(spark)).collect()}
        for t in ["click", "view"]:
            truth = 100
            assert out[t].is_estimate
            assert abs(out[t].est_distinct - truth) / truth < 0.40

    def test_exact_fallback_under_k(self, spark):
        # parity split: each type sees 5 of the 10 users — well under k
        ev = _events(spark, n_users=10)
        out = {r.event_type: r for r in kmv_distinct(ev).collect()}
        for t in ["click", "view"]:
            assert not out[t].is_estimate
            assert out[t].est_distinct == 5

    def test_salting_does_not_change_result(self, spark):
        # the two-level tournament must equal a direct global top-k: compare
        # against k=8 on a small set computed by brute force
        ev = _events(spark, n_users=50, n_events=500)
        got = {
            r.event_type: r.est_distinct
            for r in kmv_distinct(ev, k=8).collect()
        }
        import hashlib

        rows = ev.select("event_type", "user_id").distinct().collect()
        by_type = {}
        for r in rows:
            h = int(hashlib.md5(str(r.user_id).encode()).hexdigest()[:13], 16)
            by_type.setdefault(r.event_type, set()).add(h)
        for t, hs in by_type.items():
            hk = sorted(hs)[7]
            assert got[t] == (7 * 16**13) // hk


class TestExactPercentiles:
    def test_matches_numpy_type1_quantile(self, spark):
        from text_to_graph_spark.operators.events import exact_percentiles

        ev = _events(spark)
        got = {
            (r["event_type"], r["pct"]): (r["value"], r["n"])
            for r in exact_percentiles(ev).collect()
        }
        rows = ev.select("event_type", "value", "event_id").collect()
        by_type: dict[str, list] = {}
        for r in rows:
            by_type.setdefault(r["event_type"], []).append((r["value"], r["event_id"]))
        for t, vals in by_type.items():
            vals.sort()
            n = len(vals)
            for p in (50, 90, 99):
                # type-1 quantile: value at integer rank ceil(p*n/100)
                want = vals[-(-p * n // 100) - 1][0]
                assert got[(t, p)] == (want, n), (t, p)

    def test_single_element_group(self, spark):
        from text_to_graph_spark.operators.events import exact_percentiles

        ev = spark.createDataFrame(
            [(1, "x", 7.5)], "event_id long, event_type string, value double"
        )
        got = exact_percentiles(ev).collect()
        assert {(r["pct"], r["value"]) for r in got} == {(50, 7.5), (90, 7.5), (99, 7.5)}


class TestHistogramQuantiles:
    def test_sketch_brackets_exact_quantile(self, spark):
        import numpy as np

        from text_to_graph_spark.operators.events import histogram_quantiles

        ev = _events(spark)
        got = {
            (r.event_type, r.pct): (r.bin_lo_cents, r.n)
            for r in histogram_quantiles(ev, bin_cents=100).collect()
        }
        vals = {
            t: np.sort(
                np.array(
                    [r.value for r in ev.where(F.col("event_type") == t).collect()]
                )
            )
            for t in ("click", "view")
        }
        for (t, p), (lo, n) in got.items():
            assert n == len(vals[t])
            exact = vals[t][int(np.ceil(p * n / 100)) - 1] * 100  # cents
            # the true type-1 quantile lies inside the reported bin
            assert lo <= exact < lo + 100

    def test_bin_width_bounds_error(self, spark):
        from text_to_graph_spark.operators.events import histogram_quantiles

        ev = _events(spark)
        fine = {
            (r.event_type, r.pct): r.bin_lo_cents
            for r in histogram_quantiles(ev, bin_cents=1).collect()
        }
        coarse = {
            (r.event_type, r.pct): r.bin_lo_cents
            for r in histogram_quantiles(ev, bin_cents=1000).collect()
        }
        for k, lo in fine.items():
            # coarse bin must contain the fine estimate
            assert coarse[k] <= lo < coarse[k] + 1000


class TestRetentionCohorts:
    def test_python_mirror_parity(self, spark):
        from text_to_graph_spark.operators.events import retention_cohorts

        ev = _events(spark, n_users=40, n_events=400)
        got = {
            (r.cohort_day, r.day_offset): (r.n_users, r.n_events)
            for r in retention_cohorts(ev).collect()
        }
        rows = ev.select(
            "user_id", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("d")
        ).collect()
        first = {}
        for r in rows:
            first[r.user_id] = min(first.get(r.user_id, r.d), r.d)
        from datetime import date

        def _off(a, b):
            return (date.fromisoformat(b) - date.fromisoformat(a)).days

        exp: dict[tuple, set] = {}
        cnt: dict[tuple, int] = {}
        for r in rows:
            k = (first[r.user_id], _off(first[r.user_id], r.d))
            exp.setdefault(k, set()).add(r.user_id)
            cnt[k] = cnt.get(k, 0) + 1
        assert got == {k: (len(v), cnt[k]) for k, v in exp.items()}

    def test_offset_zero_covers_every_user(self, spark):
        from text_to_graph_spark.operators.events import retention_cohorts

        ev = _events(spark, n_users=25, n_events=300)
        df = retention_cohorts(ev)
        day0 = (
            df.where(F.col("day_offset") == 0)
            .agg(F.sum("n_users"))
            .first()[0]
        )
        assert day0 == 25  # every user is active on their cohort day


class TestFunnel:
    def test_python_mirror_parity(self, spark):
        from text_to_graph_spark.operators.events import funnel

        ev = _events(spark, n_users=30, n_events=600).withColumn(
            "event_type",
            F.element_at(
                F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
                (F.col("event_id") % 3 + 1).cast("int"),
            ),
        )
        got = {
            (r.step_index, r.step_name): r.n_users for r in funnel(ev).collect()
        }
        rows = ev.select(
            "user_id",
            "event_type",
            F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01', ts)").alias(
                "sec"
            ),
        ).collect()
        by_type: dict[str, dict] = {"view": {}, "click": {}, "purchase": {}}
        for r in rows:
            by_type[r.event_type].setdefault(r.user_id, []).append(r.sec)
        front = {u: min(ts) for u, ts in by_type["view"].items()}
        exp = {(1, "view"): len(front)}
        for i, step in enumerate(("click", "purchase"), start=2):
            nxt = {}
            for u, t in front.items():
                cand = [s for s in by_type[step].get(u, []) if t < s <= t + 86400]
                if cand:
                    nxt[u] = min(cand)
            exp[(i, step)] = len(nxt)
            front = nxt
        assert got == exp

    def test_funnel_monotone_and_window(self, spark):
        from text_to_graph_spark.operators.events import funnel

        # one user converts fully, one stalls after click, one clicks too late
        rows = [
            (1, "view", 0), (1, "click", 10), (1, "purchase", 20),
            (2, "view", 0), (2, "click", 50),
            (3, "view", 0), (3, "click", 90000),  # outside 1-day window
        ]
        ev = spark.createDataFrame(
            [(u, t, s) for u, t, s in rows],
            "user_id bigint, event_type string, sec bigint",
        ).select(
            "user_id",
            "event_type",
            F.timestamp_seconds("sec").cast("timestamp_ntz").alias("ts"),
        )
        got = {r.step_name: r.n_users for r in funnel(ev).collect()}
        assert got == {"view": 3, "click": 2, "purchase": 1}


class TestCountMinSketch:
    def test_estimate_never_undercounts(self, spark):
        from text_to_graph_spark.operators.events import (
            cms_heavy_hitters,
            count_min_sketch,
        )

        ev = _events(spark, n_users=50, n_events=1500)
        true = {
            str(r.user_id): r.c
            for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        est = {
            r.key: r.est_count
            for r in cms_heavy_hitters(ev, threshold=0).collect()
        }
        assert set(est) == set(true)
        assert all(est[k] >= true[k] for k in true)

    def test_heavy_hitters_superset(self, spark):
        from text_to_graph_spark.operators.events import cms_heavy_hitters

        # user 0 gets ~half the stream, everyone else a handful
        ev = _events(spark, n_users=1, n_events=500).union(
            _events(spark, n_users=100, n_events=500)
        )
        hh = {r.key for r in cms_heavy_hitters(ev, threshold=400).collect()}
        assert "0" in hh

    def test_sketch_grid_is_bounded(self, spark):
        from text_to_graph_spark.operators.events import (
            CMS_DEPTH,
            CMS_WIDTH,
            count_min_sketch,
        )

        sk = count_min_sketch(_events(spark), depth=CMS_DEPTH, width=CMS_WIDTH)
        rows = sk.collect()
        assert len(rows) <= CMS_DEPTH * CMS_WIDTH
        assert all(0 <= r.d < CMS_DEPTH and 0 <= r.w < CMS_WIDTH for r in rows)


class TestHourlyAnomalies:
    def test_spike_flagged_causally(self, spark):
        from text_to_graph_spark.operators.events import hourly_anomalies

        # 5 calm hours of 10 events then an hour of 30: only the spike
        # hour flags (the detector is causal — no lookahead)
        rows = []
        eid = 0
        for h in range(6):
            n = 30 if h == 5 else 10
            for _ in range(n):
                rows.append((eid, 1700000000 + h * 3600))
                eid += 1
        ev = spark.createDataFrame(
            rows, "event_id bigint, sec bigint"
        ).select(
            "event_id",
            F.lit(7).alias("user_id"),
            F.lit("click").alias("event_type"),
            F.timestamp_seconds("sec").cast("timestamp_ntz").alias("ts"),
        )
        got = {
            r.hour: (r.n_events, r.trailing_n, r.trailing_sum, r.dev_pct,
                     r.is_anomaly)
            for r in hourly_anomalies(ev, trailing=24, threshold_pct=150).collect()
        }
        by_hour = sorted(got)
        first, spike = by_hour[0], by_hour[-1]
        assert got[first] == (10, 0, 0, None, False)  # no history -> no flag
        assert got[spike] == (30, 5, 50, 30 * 100 * 5 // 50, True)
        assert [got[h][4] for h in by_hour] == [False] * 5 + [True]

    def test_trailing_frame_is_bounded(self, spark):
        from text_to_graph_spark.operators.events import hourly_anomalies

        ev = _events(spark, n_users=10, n_events=500)
        df = hourly_anomalies(ev, trailing=3)
        assert df.agg(F.max("trailing_n")).first()[0] <= 3


class TestCovisitation:
    def _ev(self, spark, rows):
        # rows: (user_id, sec_offset, item)
        import datetime as dt

        data = [
            (
                i,
                dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec),
                u,
                "view",
                1.0,
                '{"k": %d}' % item,
            )
            for i, (u, sec, item) in enumerate(rows)
        ]
        return spark.createDataFrame(
            data,
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        )

    def test_pairs_within_session_only(self, spark):
        from text_to_graph_spark.operators.events import covisitation

        ev = self._ev(
            spark,
            [
                (1, 0, 10),
                (1, 60, 20),  # same session as above
                (1, 60 + 3600, 30),  # new session (gap > 1800)
                (2, 0, 10),
                (2, 10, 30),
            ],
        )
        got = {
            (r.item_a, r.item_b): (r.n_sessions, r.n_a, r.n_b, r.jaccard_e6)
            for r in covisitation(ev).collect()
        }
        # (10,20) co-occur in user1/session1; (10,30) in user2's only session;
        # (20,30) never share a session
        assert got == {
            (10, 20): (1, 2, 1, 500000),
            (10, 30): (1, 2, 2, 333333),
        }

    def test_duplicate_item_in_session_counts_once(self, spark):
        from text_to_graph_spark.operators.events import covisitation

        ev = self._ev(spark, [(1, 0, 5), (1, 1, 5), (1, 2, 7)])
        got = covisitation(ev).collect()
        assert len(got) == 1
        r = got[0]
        assert (r.item_a, r.item_b, r.n_sessions, r.jaccard_e6) == (
            5, 7, 1, 1000000,
        )


class TestHllDistinct:
    def test_estimate_within_hll_error(self, spark):
        from text_to_graph_spark.operators.events import hll_distinct

        ev = _events(spark, n_users=150, n_events=3000)
        exact = {
            r.event_type: r.n
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        got = {
            r.event_type: r.est_distinct_hll
            for r in hll_distinct(ev).collect()
        }
        for t, n in exact.items():
            # raw HLL with m=64: ~13% std error; allow 3 sigma + small bias
            assert abs(got[t] - n) <= max(0.5 * n, 20), (t, got[t], n)

    def test_deterministic_across_partitionings(self, spark):
        from text_to_graph_spark.operators.events import hll_distinct

        ev = _events(spark, n_users=80, n_events=1000)
        a = {r.event_type: r.est_distinct_hll for r in hll_distinct(ev).collect()}
        b = {
            r.event_type: r.est_distinct_hll
            for r in hll_distinct(ev.repartition(11)).collect()
        }
        assert a == b

    def test_null_keys_ignored(self, spark):
        """A null key must not occupy a register (it would understate the
        empty-bucket correction): estimates with and without null keys
        present are identical."""
        from text_to_graph_spark.operators.events import hll_distinct

        ev = _events(spark, n_users=80, n_events=1000)
        nulled = ev.unionByName(
            ev.limit(25).withColumn("user_id", F.lit(None).cast("long"))
        )
        a = {
            r.event_type: (r.est_distinct_hll, r.n_empty_buckets)
            for r in hll_distinct(ev).collect()
        }
        b = {
            r.event_type: (r.est_distinct_hll, r.n_empty_buckets)
            for r in hll_distinct(nulled).collect()
        }
        assert a == b


class TestInversePredicates:
    def test_symmetric_and_inverse_detection(self, spark):
        from text_to_graph_spark.operators.graphq import inverse_predicates

        edges = spark.createDataFrame(
            [
                ("a", "b", "links"), ("b", "a", "linked_by"),
                ("c", "d", "links"), ("d", "c", "linked_by"),
                ("e", "f", "links"),                 # no reverse
                ("g", "h", "knows"), ("h", "g", "knows"),  # symmetric
            ],
            "subj_key string, obj_key string, pred_key string",
        )
        got = {
            (r.pred, r.pred_rev): (r.n_pairs, r.n_pred, r.frac_e6)
            for r in inverse_predicates(edges).collect()
        }
        assert got[("links", "linked_by")] == (2, 3, 666666)
        assert got[("linked_by", "links")] == (2, 2, 1000000)
        assert got[("knows", "knows")] == (2, 2, 1000000)
        assert ("links", "links") not in got


class TestFirstTouchAttribution:
    def test_conversion_credits_session_opener(self, spark):
        import datetime as dt

        from text_to_graph_spark.operators.events import first_touch_attribution

        base = dt.datetime(2024, 1, 1)
        rows = [
            # user 1, session 1 opened by 'view': purchase inside
            (1, base, 1, "view", 1.0),
            (2, base + dt.timedelta(seconds=60), 1, "purchase", 5.0),
            # user 1, session 2 opened by 'click': two purchases
            (3, base + dt.timedelta(seconds=9000), 1, "click", 1.0),
            (4, base + dt.timedelta(seconds=9060), 1, "purchase", 2.5),
            (5, base + dt.timedelta(seconds=9120), 1, "purchase", 1.5),
            # user 2: session with no purchase
            (6, base, 2, "view", 1.0),
        ]
        ev = spark.createDataFrame(
            [(i, ts, u, t, v, "{}") for i, ts, u, t, v in rows],
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        )
        got = {
            r.first_touch_type: (r.n_conversions, r.n_users, r.sum_value_cents)
            for r in first_touch_attribution(ev).collect()
        }
        assert got == {"view": (1, 1, 500), "click": (2, 1, 400)}

    def test_purchase_opening_its_own_session_self_credits(self, spark):
        import datetime as dt

        from text_to_graph_spark.operators.events import first_touch_attribution

        ev = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1), 7, "purchase", 3.0, "{}")],
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        )
        got = first_touch_attribution(ev).collect()
        assert len(got) == 1 and got[0].first_touch_type == "purchase"


class TestCountMin:
    def test_never_underestimates_and_merges(self, spark):
        from pyspark.sql import functions as F

        from text_to_graph_spark.operators.events import (
            countmin_estimate,
            countmin_registers,
        )

        rows = [(i, f"u{i % 7}") for i in range(200)]
        ev = spark.createDataFrame(rows, "event_id long, user_id string")
        regs = countmin_registers(ev, key="user_id", depth=4, width=16)
        keys = ev.select("user_id").distinct()
        est = {
            r.key: r.est
            for r in countmin_estimate(regs, keys, key="user_id", width=16).collect()
        }
        exact = {
            r.user_id: r.n
            for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
        }
        assert set(est) == set(exact)
        # CMS guarantee: estimate is never below the true count
        for k in exact:
            assert est[k] >= exact[k]
        # registers are sum-mergeable: sketching two halves then summing
        # registers equals sketching the whole
        a = countmin_registers(ev.where("event_id < 100"), "user_id", 4, 16)
        b = countmin_registers(ev.where("event_id >= 100"), "user_id", 4, 16)
        merged = (
            a.unionByName(b)
            .groupBy("row", "bucket")
            .agg(F.sum("c").cast("long").alias("c"))
        )
        whole = {(r.row, r.bucket): r.c for r in regs.collect()}
        got = {(r.row, r.bucket): r.c for r in merged.collect()}
        assert got == whole

    def test_null_keys_excluded(self, spark):
        from text_to_graph_spark.operators.events import countmin_registers

        ev = spark.createDataFrame(
            [(1, "u"), (2, None)], "event_id long, user_id string"
        )
        total = sum(
            r.c
            for r in countmin_registers(ev, "user_id", 2, 8).collect()
            if r.row == 0
        )
        assert total == 1


class TestBloom:
    def test_registers_match_pure_python_and_or_merge(self, spark):
        import hashlib

        from pyspark.sql import functions as F

        from text_to_graph_spark.operators.events import bloom_registers

        rows = [(i, i * 37 % 211, "g%d" % (i % 3)) for i in range(300)]
        ev = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")

        # pure-python reference sketch (same md5 split)
        expect: dict[tuple[str, int], int] = {}
        for _, uid, grp in rows:
            h = int(hashlib.md5(str(uid).encode()).hexdigest()[:13], 16)
            bucket, bit = h % 64, (h // 64) % 63
            k = (grp, bucket)
            expect[k] = expect.get(k, 0) | (1 << bit)

        got = {
            (r.event_type, r.bucket): r.bits
            for r in bloom_registers(ev).collect()
        }
        assert got == expect
        # popcount column agrees with the register
        for r in bloom_registers(ev).collect():
            assert r.n_bits == bin(r.bits & ((1 << 63) - 1)).count("1")

        # registers OR-merge: sketching two halves then bit_or-folding
        # equals sketching the whole (the mergeability contract)
        a = bloom_registers(ev.where("event_id < 150"))
        b = bloom_registers(ev.where("event_id >= 150"))
        merged = {
            (r.event_type, r.bucket): r.bits
            for r in a.unionByName(b)
            .groupBy("event_type", "bucket")
            .agg(F.bit_or("bits").alias("bits"))
            .collect()
        }
        assert merged == got

    def test_membership_no_false_negatives_and_fp_only_on_collisions(self, spark):
        from text_to_graph_spark.operators.events import bloom_membership

        rows = [(i, i * 37 % 211) for i in range(400)]
        ev = spark.createDataFrame(rows, "event_id long, user_id long")
        # tiny filter (2 buckets x 63 bits) so collisions actually occur
        out = bloom_membership(
            ev, key="user_id", member_pred="user_id % 5 = 0", n_buckets=2
        ).collect()
        assert len(out) == len({u for _, u in rows})
        n_member = sum(1 for r in out if r.is_member)
        n_non = len(out) - n_member
        assert n_member > 0 and n_non > 0
        for r in out:
            # Bloom invariant: a member is NEVER reported absent
            if r.is_member:
                assert r.maybe_member
            assert r.false_positive == (r.maybe_member and not r.is_member)
        # at 126 bits vs ~40 members, non-member collisions must appear —
        # the sketch is doing approximate (not exact) membership
        assert any(r.false_positive for r in out)

    def test_sign_bit_never_set(self, spark):
        from pyspark.sql import functions as F

        from text_to_graph_spark.operators.events import bloom_registers

        rows = [(i, i) for i in range(5000)]
        ev = spark.createDataFrame(rows, "event_id long, user_id long").withColumn(
            "event_type", F.lit("g")
        )
        for r in bloom_registers(ev, n_buckets=4).collect():
            # bit positions are 0..62 by construction: registers stay
            # non-negative, so the DuckDB oracle's checked 1<<bit works
            assert r.bits >= 0


class TestKmvIntersection:
    def test_exact_path_below_k_and_disjoint_pairs(self, spark):
        from pyspark.sql import functions as F

        from text_to_graph_spark.operators.events import kmv_intersection

        # A = {1..10}, B = {6..15} (overlap 5), C = {100..104} (disjoint)
        rows = (
            [(u, "a") for u in range(1, 11)]
            + [(u, "b") for u in range(6, 16)]
            + [(u, "c") for u in range(100, 105)]
        )
        ev = spark.createDataFrame(
            rows, "user_id long, event_type string"
        )
        got = {
            (r.grp_a, r.grp_b): r
            for r in kmv_intersection(ev, k=64).collect()
        }
        ab = got[("a", "b")]
        assert not ab.is_estimate  # union 15 < k: sketches are complete
        assert ab.est_union == 15 and ab.est_intersection == 5
        assert ab.jaccard_sketch_ppm == 5 * 1_000_000 // 15
        ac = got[("a", "c")]
        assert (ac.est_union, ac.est_intersection) == (15, 0)

    def test_estimate_quality_on_planted_overlap(self, spark):
        from text_to_graph_spark.operators.events import kmv_intersection

        # |A| = 2000, |B| = 2000, |A ∩ B| = 1000 -> union 3000. The k=64
        # KMV estimate must land within the sketch's error envelope
        # (~1/sqrt(k) ≈ 12.5%; allow 3 sigma)
        rows = [(u, "a") for u in range(0, 2000)] + [
            (u, "b") for u in range(1000, 3000)
        ]
        ev = spark.createDataFrame(rows, "user_id long, event_type string")
        r = kmv_intersection(ev, k=64).collect()[0]
        assert r.is_estimate
        assert abs(r.est_union - 3000) / 3000 < 0.4
        assert abs(r.est_intersection - 1000) / 1000 < 0.5

    def test_deterministic_across_partitionings(self, spark):
        from text_to_graph_spark.operators.events import kmv_intersection

        rows = [(u % 500, f"t{u % 3}") for u in range(3000)]
        ev = spark.createDataFrame(rows, "user_id long, event_type string")
        a = sorted(map(tuple, kmv_intersection(ev).collect()))
        b = sorted(map(tuple, kmv_intersection(ev.repartition(11)).collect()))
        assert a == b and a
