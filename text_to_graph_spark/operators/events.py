"""Event-stream operators (batch over the events table; the Structured
Streaming twins live in ``streaming/``).

The events table is TIMESTAMP_NTZ; all time arithmetic is done on formatted
strings or tz-free deltas so results are independent of any session timezone
(portable across engines and driver configs).

- ``hourly_rollup``: tumbling 1h window count + exact integer sum (values as
  cents, so the aggregate is order-independent — a raw double sum is not
  reproducible under shuffle).
- ``sessionize``: 30-minute-gap sessionization via lag + running sum — the
  classic stateful-shaped computation expressed with window functions.
- ``enrich_with_customer``: broadcast dimension join (events.user_id ->
  customer.c_custkey) + per-segment rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_EPOCH_NTZ = "timestamp_ntz'1970-01-01 00:00:00'"


def epoch_seconds_ntz(col: str):
    """tz-free seconds since epoch for a TIMESTAMP_NTZ column."""
    return F.expr(f"timestampdiff(SECOND, {_EPOCH_NTZ}, {col})")


def hourly_rollup(events: DataFrame) -> DataFrame:
    hour = F.date_format("ts", "yyyy-MM-dd HH").alias("hour")
    return events.groupBy(hour, "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_value_cents"),
        F.countDistinct("user_id").alias("n_users"),
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Per-user sessions: a new session starts when the gap from the previous
    event exceeds ``gap_seconds``. Returns per-user session stats."""
    sec = epoch_seconds_ntz("ts")
    w = Window.partitionBy("user_id").orderBy("sec")
    with_gap = events.select(
        "user_id",
        "event_id",
        sec.alias("sec"),
    ).withColumn("prev_sec", F.lag("sec").over(w))
    flagged = with_gap.withColumn(
        "new_session",
        (F.col("prev_sec").isNull() | (F.col("sec") - F.col("prev_sec") > gap_seconds))
        .cast("int"),
    )
    with_session = flagged.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_session = with_session.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("sec") - F.min("sec")).alias("duration_s"),
    )
    return per_session.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.max("duration_s").alias("max_session_duration_s"),
    )


def covisitation(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Within-session item co-visitation — the item-to-item graph behind
    "users who viewed X also viewed Y" and behavioral link prediction.

    Items are the ``k`` key of the event ``props`` blob (extracted with a
    portable regex, no engine JSON functions). Sessions are the same
    30-minute-gap lag+running-sum assignment as :func:`sessionize`; the
    per-(user, session) item set is deduplicated, then pairs are formed by
    a self-equi-join on the session key with ``item_a < item_b`` so each
    unordered pair appears once per session.

    Affinity is exact-integer session Jaccard (``n_both * 1e6 DIV
    (n_a + n_b - n_both)``) rather than lift: it needs no global total and
    every term is a bounded bigint, so the number is bit-identical across
    engines and partitionings at any scale (a float lift would not be).

    Scale shape: one shuffle for the per-user window, one partial-agg
    distinct on (user, session, item), a self-join keyed on the session id
    (fan-out bounded by items-per-session squared, a per-session constant —
    never a cross-corpus cartesian), one pair-count shuffle, and two
    broadcast joins of the tiny per-item marginals. Returns
    (item_a, item_b, n_sessions, n_a, n_b, jaccard_e6).
    """
    sec = epoch_seconds_ntz("ts")
    w = Window.partitionBy("user_id").orderBy("sec")
    x = (
        events.select(
            "user_id",
            sec.alias("sec"),
            F.regexp_extract("props", r'"k": (\d+)', 1).cast("int").alias("item"),
        )
        .withColumn("prev_sec", F.lag("sec").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_sec").isNull()
                | (F.col("sec") - F.col("prev_sec") > gap_seconds)
            ).cast("int"),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    items = x.select("user_id", "session_id", "item").distinct()
    marg = items.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    a = items.select("user_id", "session_id", F.col("item").alias("item_a"))
    b = items.select("user_id", "session_id", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, ["user_id", "session_id"])
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    return (
        pairs.join(
            F.broadcast(marg.select(F.col("item").alias("item_a"), F.col("n").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(marg.select(F.col("item").alias("item_b"), F.col("n").alias("n_b"))),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "n_sessions",
            "n_a",
            "n_b",
            F.expr("n_sessions * 1000000 DIV (n_a + n_b - n_sessions)")
            .cast("bigint")
            .alias("jaccard_e6"),
        )
    )


def hypertable_rollup(events: DataFrame) -> DataFrame:
    """Multi-granularity continuous-aggregate rollup (the hypertable /
    timescale "continuous aggregate" shape): hour/day/month x event_type
    plus coarser cuts, in ONE pass via GROUPING SETS.

    Catalyst plans grouping sets as a single Expand + one hash aggregate —
    one shuffle total, with map-side partial aggregation, vs the 6 shuffles
    a union-of-groupBys would cost. All aggregates are exact integers
    (counts + cents), so results are shuffle-order-stable.
    """
    base = events.select(
        F.date_format("ts", "yyyy-MM-dd HH").alias("hour"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "yyyy-MM").alias("month"),
        "event_type",
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("value_cents"),
    )
    g = base.groupingSets(
        [
            [F.col("hour"), F.col("event_type")],
            [F.col("day"), F.col("event_type")],
            [F.col("month"), F.col("event_type")],
            [F.col("day")],
            [F.col("month")],
            [],
        ],
        "hour",
        "day",
        "month",
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value_cents").alias("sum_value_cents"),
        F.countDistinct("user_id").alias("n_users"),
        # grouping() is an aggregate-context function — capture the
        # indicator bits here, they are gone after the agg
        F.grouping("hour").alias("_g_hour"),
        F.grouping("day").alias("_g_day"),
        F.grouping("month").alias("_g_month"),
    )
    grain = (
        F.when(F.col("_g_hour") == 0, F.lit("hour"))
        .when(F.col("_g_day") == 0, F.lit("day"))
        .when(F.col("_g_month") == 0, F.lit("month"))
        .otherwise(F.lit("all"))
    )
    return g.select(
        grain.alias("grain"),
        F.coalesce("hour", "day", "month", F.lit("*")).alias("bucket"),
        F.coalesce("event_type", F.lit("*")).alias("event_type"),
        "n_events",
        "sum_value_cents",
        "n_users",
    )


# KMV hash space: 13 hex digits of md5 = 52 uniform bits. Both engines
# compute the identical md5, so the sketch is bit-reproducible across
# Spark and the SQL oracle (and across cluster sizes — no rand()).
_KMV_SPACE = 16**13


def kmv_distinct(
    events: DataFrame, key: str = "user_id", group: str = "event_type", k: int = 64
) -> DataFrame:
    """K-minimum-values distinct-count sketch, deterministic across engines.

    Hashes each key to 52 bits via md5, keeps the k smallest DISTINCT hash
    values per group, and estimates |distinct| = (k-1) * SPACE / h_k in
    exact bigint arithmetic (integer division — no float in the estimator).
    Groups with fewer than k distinct keys report their exact count
    (standard KMV fallback).

    Scale shape: distinct (group, hash) with map-side partial dedup, then a
    TWO-LEVEL tournament for the k smallest — per-(group, salt) top-k
    windows (each sorts only |group|/64 rows), union of the <= 64k
    survivors, final per-group top-k. A skewed group never funnels all its
    distinct hashes through one sort; the salting changes nothing
    semantically (the k smallest of the per-salt k-smallest are the global
    k smallest).
    """
    h = F.conv(
        F.substring(F.md5(F.col(key).cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    hashed = events.select(F.col(group).alias("grp"), h.alias("h")).distinct()
    salted = hashed.withColumn("salt", F.pmod(F.col("h"), F.lit(64)))
    w1 = Window.partitionBy("grp", "salt").orderBy(F.col("h").asc())
    survivors = (
        salted.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= k)
        .drop("salt", "rn1")
    )
    w = Window.partitionBy("grp").orderBy(F.col("h").asc())
    ranked = survivors.withColumn("rn", F.row_number().over(w))
    # n_distinct_seen is exact only when < k (the fallback branch); the
    # tournament keeps >= k survivors whenever the group has >= k hashes
    per_group = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_distinct_seen"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("h_k"),
    )
    est = F.when(F.col("h_k").isNull(), F.col("n_distinct_seen")).otherwise(
        F.expr(f"CAST({(k - 1) * _KMV_SPACE} AS BIGINT) DIV h_k")
    )
    return per_group.select(
        F.col("grp").alias(group),
        est.alias("est_distinct"),
        F.col("h_k").isNotNull().alias("is_estimate"),
    )


def kmv_intersection(
    events: DataFrame,
    key: str = "user_id",
    group: str = "event_type",
    k: int = 64,
) -> DataFrame:
    """Theta-sketch-style pairwise set-operation estimates from KMV
    sketches (Beyer et al. 2007, "On synopses for distinct value
    estimation under multiset operations"): for every unordered pair of
    groups, estimate |A ∪ B| and |A ∩ B| from the two groups' k-minimum-
    value sketches ALONE — the mergeable-summary property that lets a
    100 TB pipeline answer audience-overlap questions from
    register-width state instead of re-scanning either side.

    Estimator: per-side sketches truncate at k (exactly
    :func:`kmv_distinct`'s sample); the union sketch is the k smallest of
    their union with threshold h_k; ``matches`` counts union-sample
    hashes present in BOTH sides. union_est = (k-1)*2^52 DIV h_k;
    inter_est = (matches * union_est) DIV k — matches <= k bounds the
    product by k * union_est, which stays inside int64 whenever
    union_est < 2^57, i.e. for any corpus below ~1.4e17 distinct keys
    (the naive matches*(k-1)*2^52 form overflows ALWAYS at k=64; this
    form only in the astronomically-small-h_k regime, h_k < k*2^-5,
    unreachable in practice). Both engines apply the identical integer
    divisions, so the oracle is bit-exact. Pairs
    whose union sample holds fewer than k hashes carry both sketches in
    full and report EXACT counts (is_estimate = false).

    Output: (grp_a, grp_b, est_union, est_intersection,
    jaccard_sketch_ppm, is_estimate) with grp_a < grp_b.
    """
    h = F.conv(
        F.substring(F.md5(F.col(key).cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    hashed = events.select(F.col(group).alias("grp"), h.alias("h")).distinct()
    # the same two-level tournament as kmv_distinct: per-(grp, salt) top-k
    # first, so no group funnels all its hashes through one sort
    salted = hashed.withColumn("salt", F.pmod(F.col("h"), F.lit(64)))
    w1 = Window.partitionBy("grp", "salt").orderBy(F.col("h").asc())
    survivors = (
        salted.withColumn("rn1", F.row_number().over(w1))
        .where(F.col("rn1") <= k)
        .drop("salt", "rn1")
    )
    w_side = Window.partitionBy("grp").orderBy(F.col("h").asc())
    sketch = (
        survivors.withColumn("rn", F.row_number().over(w_side))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
    # group labels are model-scale metadata (event-type cardinality):
    # collect them and build the unordered-pair dim driver-side, so every
    # data-plane join below is a plain equi-join — no nested loop anywhere
    labels = sorted(
        r["grp"] for r in sketch.select("grp").distinct().collect()
    )
    from pyspark.sql.types import StructField, StructType

    spark = events.sparkSession
    pair_schema = StructType(
        [
            StructField("grp_a", sketch.schema["grp"].dataType),
            StructField("grp_b", sketch.schema["grp"].dataType),
        ]
    )
    pairs = spark.createDataFrame(
        [(a, b) for i, a in enumerate(labels) for b in labels[i + 1 :]],
        pair_schema,
    )
    pooled = (
        pairs.join(
            sketch.select(F.col("grp").alias("grp_a"), "h"), "grp_a"
        )
        .select("grp_a", "grp_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            pairs.join(
                sketch.select(F.col("grp").alias("grp_b"), "h"), "grp_b"
            ).select(
                "grp_a", "grp_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
            )
        )
        .groupBy("grp_a", "grp_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w_pair = Window.partitionBy("grp_a", "grp_b").orderBy(F.col("h").asc())
    sample = pooled.withColumn("rn", F.row_number().over(w_pair)).where(
        F.col("rn") <= k
    )
    per = sample.groupBy("grp_a", "grp_b").agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("h_k"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("matches"),
    )
    union_est = F.when(F.col("h_k").isNull(), F.col("n_seen")).otherwise(
        F.expr(f"CAST({(k - 1) * _KMV_SPACE} AS BIGINT) DIV h_k")
    )
    per = per.withColumn("est_union", union_est.cast("bigint"))
    inter_est = F.when(F.col("h_k").isNull(), F.col("matches")).otherwise(
        F.expr(f"(matches * est_union) DIV {k}")
    )
    return per.select(
        "grp_a",
        "grp_b",
        "est_union",
        inter_est.cast("bigint").alias("est_intersection"),
        F.expr("matches * 1000000 DIV least(n_seen, " + str(k) + ")")
        .cast("bigint")
        .alias("jaccard_sketch_ppm"),
        F.col("h_k").isNotNull().alias("is_estimate"),
    )


def enrich_with_customer(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Broadcast dim join + rollup by market segment."""
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_nationkey"
    )
    return (
        events.join(F.broadcast(dim), "user_id")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "sum_value_cents"
            ),
        )
    )


def exact_percentiles(
    events: DataFrame, pcts: tuple[int, ...] = (50, 90, 99)
) -> DataFrame:
    """Exact type-1 (lower) percentiles of ``value`` per event type.

    Interpolated percentiles (percentile_cont) are a float seam — two engines
    interpolate (1-f)*a + f*b in different association orders and disagree in
    the last ulp. The type-1 quantile is instead the value at integer rank
    ceil(p*n/100): pure integer arithmetic plus a deterministic total order
    (value, event_id), so any engine agrees exactly.

    Scale: one rank window per event type (single shuffle on event_type; for
    a skewed type at extreme scale switch to two-pass: approx bucket then
    rank within the candidate bucket), a broadcast count, and a broadcast
    percentile list.
    """
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = events.withColumn("rank", F.row_number().over(w))
    counts = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    targets = counts.select(
        "event_type",
        "n",
        F.explode(F.array(*[F.lit(int(p)) for p in pcts])).alias("pct"),
    ).withColumn("target", F.expr("(pct * n + 99) DIV 100"))
    return (
        ranked.join(
            F.broadcast(targets),
            (ranked.event_type == targets.event_type)
            & (ranked.rank == targets.target),
        )
        .select(
            ranked.event_type,
            targets.pct.cast("int").alias("pct"),
            ranked.value.alias("value"),
            targets.n.cast("bigint").alias("n"),
        )
    )


def histogram_quantiles(
    events: DataFrame,
    bin_cents: int = 100,
    pcts: tuple[int, ...] = (50, 95, 99),
) -> DataFrame:
    """Approximate quantiles from a fixed-width histogram sketch — the 100 TB
    path :func:`exact_percentiles` documents ("switch to two-pass: approx
    bucket first"): exact percentiles need a full sort per group; the sketch
    needs ONE partial-aggregated count shuffle whose width is the number of
    occupied bins, independent of row count, and the bins are mergeable
    across any partitioning (the property a distributed sketch must have).

    bin = cents DIV bin_cents (fixed grid — no data-dependent range pass);
    the p-th quantile estimate is the lower bound of the first bin whose
    cumulative count reaches rank ceil(p*n/100). All integer arithmetic:
    bit-identical across engines, shuffle orders, and cluster sizes. Error
    is bounded by bin_cents by construction. Returns
    (event_type, pct, bin_lo_cents, n).
    """
    cents = F.round(F.col("value") * 100).cast("bigint")
    hist = (
        events.select("event_type", cents.alias("cents"))
        .withColumn("bin", F.expr(f"cents DIV {int(bin_cents)}"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "bin",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wtot).alias("n"),
    )
    hit = cum.select(
        "event_type",
        "bin",
        "cum",
        "n",
        F.explode(F.array(*[F.lit(int(p)) for p in pcts])).alias("pct"),
    ).where(F.col("cum") >= F.expr("(pct * n + 99) DIV 100"))
    return hit.groupBy("event_type", "pct").agg(
        (F.min("bin") * bin_cents).cast("bigint").alias("bin_lo_cents"),
        F.min("n").cast("bigint").alias("n"),
    )


def rolling_user_value(events: DataFrame, window_seconds: int = 3600) -> DataFrame:
    """Trailing-window per-user rolling aggregates: sum/count of the last
    ``window_seconds`` of each user's events, one row per event.

    RANGE frame over tz-free epoch seconds (both engines treat equal order
    keys as peers, so ties are frame-stable); values as cents integers so the
    running sum is shuffle-order independent. One shuffle on user_id; frames
    are bounded by the time window, not the partition, so state per key is
    O(events in window) — the streaming twin of this is a watermarked
    sliding window.
    """
    sec = epoch_seconds_ntz("ts").alias("epoch_s")
    cents = F.round(F.col("value") * 100).cast("bigint")
    base = events.select(
        "event_id", "user_id", sec, cents.alias("cents")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-(window_seconds - 1), 0)
    )
    return base.select(
        "event_id",
        "user_id",
        F.col("epoch_s").cast("bigint").alias("epoch_s"),
        F.sum("cents").over(w).alias("roll_sum_cents"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("roll_n"),
    )


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, distinct
    active users and event counts per (cohort_day, day_offset).

    Two shuffles: first-seen min per user (partial-agg), then the
    (cohort, offset) rollup after an equi-join back on user_id — the join
    key is the same hash partitioning the first agg produced, so AQE reuses
    the exchange. Day arithmetic is tz-free (NTZ casts + datediff on DATE),
    cohort rendered as a yyyy-MM-dd string for engine-portable hashing.
    """
    ev = events.select("user_id", F.to_date("ts").alias("d"))
    first = ev.groupBy("user_id").agg(F.min("d").alias("cohort"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("d"), F.col("cohort")).cast("bigint").alias("day_offset"),
        )
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    window_seconds: int = 86400,
) -> DataFrame:
    """Ordered conversion funnel: users whose earliest step-i event is
    followed by a step-(i+1) event within ``window_seconds``. Each stage
    keeps the user's EARLIEST qualifying timestamp (min-aggregation, so
    the result is deterministic and shuffle-order independent — the
    standard greedy funnel semantics). Returns one row per step:
    (step_index, step_name, n_users).

    Scale shape: per step one filtered partial-agg min + one equi-join on
    user_id — every join reuses the same user_id hash partitioning, and
    each stage's frontier only shrinks. No windows, no collects.
    """
    sec = epoch_seconds_ntz("ts").cast("bigint")
    e = events.select("user_id", "event_type", sec.alias("sec"))
    frontier = (
        e.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("sec").alias("t"))
    )
    out = [(1, steps[0], frontier.count())]
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            e.where(F.col("event_type") == step)
            .join(frontier, "user_id")
            .where(
                (F.col("sec") > F.col("t"))
                & (F.col("sec") <= F.col("t") + window_seconds)
            )
            .groupBy("user_id")
            .agg(F.min("sec").alias("t"))
        )
        out.append((i, step, nxt.count()))
        frontier = nxt
    spark = events.sparkSession
    return spark.createDataFrame(
        [(int(a), b, int(c)) for a, b, c in out],
        "step_index int, step_name string, n_users bigint",
    )


CMS_DEPTH = 4
CMS_WIDTH = 256


def count_min_sketch(
    events: DataFrame, key_col: str = "user_id",
    depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-Min sketch build: each key increments one counter per hash row
    (md5-prefix integer hashing, seeded by the row index — deterministic
    and engine-portable). Output (d, w, cnt) is a fixed depth×width grid —
    MERGEABLE by cell-wise addition, which is what makes it the streaming/
    shard-parallel heavy-hitter structure at corpus scale: the shuffle
    carries at most depth×width rows per map partition (partial agg),
    independent of event volume.
    """
    key = F.col(key_col).cast("string")
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                (
                    F.conv(
                        F.substring(F.md5(F.concat(F.lit(str(d) + "|"), key)), 1, 12),
                        16,
                        10,
                    ).cast("bigint")
                    % width
                ).cast("int").alias("w"),
            )
            for d in range(depth)
        ]
    )
    return (
        events.select(F.explode(rows).alias("r"))
        .select("r.d", "r.w")
        .groupBy("d", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_heavy_hitters(
    events: DataFrame,
    key_col: str = "user_id",
    threshold: int = 100,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Heavy-hitter candidates by Count-Min estimate: distinct keys whose
    CMS estimate (min over hash rows) reaches ``threshold``. The estimate
    only over-counts, so the candidate set is a superset of the true heavy
    hitters — the standard sketch-then-verify shape (the exact verify pass
    is a semi-join of the full stream against this small candidate set).

    The probe side is the DISTINCT key set joined against the broadcast
    depth×width sketch — the raw event stream is never re-shuffled.
    """
    from pyspark.sql.functions import broadcast

    sketch = count_min_sketch(events, key_col, depth, width)
    keys = events.select(F.col(key_col).cast("string").alias("key")).distinct()
    probes = keys.select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(F.concat(F.lit(str(d) + "|"), F.col("key"))),
                                    1,
                                    12,
                                ),
                                16,
                                10,
                            ).cast("bigint")
                            % width
                        ).cast("int").alias("w"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("r"),
    ).select("key", "r.d", "r.w")
    return (
        probes.join(broadcast(sketch), ["d", "w"])
        .groupBy("key")
        .agg(F.min("cnt").alias("est_count"))
        .where(F.col("est_count") >= threshold)
    )


def hourly_anomalies(
    events: DataFrame, trailing: int = 24, threshold_pct: int = 150
) -> DataFrame:
    """Trailing-window anomaly flags over the hourly event rollup: an hour
    is anomalous for an event type when its count reaches ``threshold_pct``
    percent of the trailing ``trailing``-row mean (previous rows only, so
    the detector is causal). dev_pct is exact integer arithmetic —
    (n * 100 * trailing_n) DIV trailing_sum — so the flag is
    bit-reproducible across engines; rows with no history get NULL dev and
    a false flag.

    Scale shape: one partial-aggregated rollup shuffle keyed (hour, type),
    then a single window pass partitioned by event_type — state per key is
    the bounded ``trailing`` row frame, which is also exactly the state a
    streaming deployment of this detector would carry.
    """
    hourly = events.groupBy(
        F.date_format("ts", "yyyy-MM-dd HH").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    win = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-trailing, -1)
    )
    t_n = F.count(F.lit(1)).over(win).cast("bigint")
    t_sum = F.sum("n_events").over(win).cast("bigint")
    base = hourly.select(
        "hour",
        "event_type",
        "n_events",
        t_n.alias("trailing_n"),
        F.coalesce(t_sum, F.lit(0)).cast("bigint").alias("trailing_sum"),
    )
    dev = F.when(
        F.col("trailing_n") > 0,
        F.expr("(n_events * 100 * trailing_n) DIV trailing_sum"),
    ).cast("bigint")
    return base.select(
        "hour",
        "event_type",
        "n_events",
        "trailing_n",
        "trailing_sum",
        dev.alias("dev_pct"),
        F.coalesce(dev >= threshold_pct, F.lit(False)).alias("is_anomaly"),
    )


def event_transitions(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Within-session event-type transition matrix — the first-order Markov
    model of user behavior (what follows what), the input to journey
    analysis and next-event prediction baselines.

    Rows are ordered by (sec, event_id) inside each session — a TOTAL
    order, so ``lead`` is deterministic even when events share a second.
    (cur, nxt, n_transitions, frac_e6): ``frac_e6`` is the exact-ppm share
    among transitions leaving ``cur`` (matrix rows sum to ~1e6).

    Scale shape: one per-user window shuffle (shared with sessionize),
    one partial-agg pair rollup, and a share window over the ≤|types|²
    aggregate.
    """
    sec = epoch_seconds_ntz("ts")
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    x = (
        events.select("user_id", "event_id", "event_type", sec.alias("sec"))
        .withColumn("prev_sec", F.lag("sec").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_sec").isNull()
                | (F.col("sec") - F.col("prev_sec") > gap_seconds)
            ).cast("int"),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy("sec", "event_id")
    pairs = (
        x.withColumn("nxt", F.lead("event_type").over(ws))
        .where(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("cur"), "nxt")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    return pairs.select(
        "cur",
        "nxt",
        "n_transitions",
        F.expr(
            "n_transitions * 1000000 DIV "
            "sum(n_transitions) OVER (PARTITION BY cur)"
        ).cast("bigint").alias("frac_e6"),
    )


def hll_distinct(
    events: DataFrame,
    key: str = "user_id",
    group: str = "event_type",
) -> DataFrame:
    """HyperLogLog distinct-count sketch (64 registers), exact-integer
    estimator — the mergeable register sibling of :func:`kmv_distinct`
    (registers max-merge across partitions/waves; KMV needs a top-k merge).

    Register update: the 52-bit md5 hash splits into bucket = h mod 64 and
    a 46-bit suffix w; rho = 47 - bit_length(w) (47 for w = 0) and the
    register keeps max(rho) — one partial-agg'd max per (group, bucket),
    the textbook HLL shape. The estimate avoids floats entirely:

        S = sum over all 64 registers of 2^(47 - r)   (empty: r = 0)
        est = least(2^59 DIV S, 2^46) * 7093 DIV 10000

    which is alpha_64 * m^2 * 2^47 / S (m^2 * 2^47 = 2^59) with alpha_64 =
    0.7093 carried as the integer ratio 7093/10000; the single division
    happens FIRST on the full 2^59 numerator so low-cardinality groups
    don't truncate to zero, and the least() clamp (cardinalities beyond
    the 52-bit hash's range anyway) keeps the bias multiply under 2^63.
    No small-range correction (it needs ln; the KMV twin covers the
    small-cardinality regime exactly) — documented raw-HLL semantics, and
    bit-identical across engines/partitionings. Returns
    (``group``, est_distinct_hll, n_empty_buckets).
    """
    h = F.conv(
        F.substring(F.md5(F.col(key).cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    # null keys hash to a null bucket whose register contributes NULL to
    # s_present while still counting in n_present — understating the
    # empty-bucket correction. NULL means "no value" in distinct-count
    # semantics anyway: drop before bucketing.
    x = events.where(F.col(key).isNotNull()).select(
        F.col(group).alias("grp"),
        F.pmod(h, F.lit(64)).cast("int").alias("bucket"),
        h.alias("h"),
    ).withColumn("w", F.expr("h DIV 64").cast("bigint"))
    rho = F.when(F.col("w") == 0, F.lit(47)).otherwise(
        F.lit(47) - F.length(F.bin("w"))
    )
    regs = (
        x.select("grp", "bucket", rho.cast("int").alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    per = regs.groupBy("grp").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS bigint), 47 - r)")).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    return per.select(
        F.col("grp").alias(group),
        F.expr(
            f"least(CAST({2 ** 59} AS bigint) DIV "
            f"(s_present + (64 - n_present) * CAST({2 ** 47} AS bigint)), "
            f"CAST({2 ** 46} AS bigint)) * 7093 DIV 10000"
        ).cast("bigint").alias("est_distinct_hll"),
        (F.lit(64) - F.col("n_present")).cast("bigint").alias("n_empty_buckets"),
    )


def first_touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    gap_seconds: int = 1800,
) -> DataFrame:
    """First-touch attribution: credit each conversion to the FIRST event
    type of its session — the classic marketing-attribution rollup, and a
    second consumer of the sessionization window (journeys end in a
    conversion; what started them?).

    Sessions are the 30-minute-gap assignment over the total
    (sec, event_id) order (deterministic under same-second ties). Per
    (first_touch_type): number of conversions in sessions opened by that
    type, distinct converting users, and exact-cents converted value.

    Scale shape: one per-user window shuffle (shared with sessionize), a
    per-session first-event reduction expressed as min_by over the same
    total order (partial-agg'd — no second window), one broadcast-light
    join of conversions against the tiny per-session firsts, one rollup.
    Returns (first_touch_type, n_conversions, n_users, sum_value_cents).
    """
    sec = epoch_seconds_ntz("ts")
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    x = (
        events.select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            sec.alias("sec"),
        )
        .withColumn("prev_sec", F.lag("sec").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_sec").isNull()
                | (F.col("sec") - F.col("prev_sec") > gap_seconds)
            ).cast("int"),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    # argmin without min_by: min_by(string, struct) puts var-length state
    # in the aggregation buffer, which forces SortAggregate — the partial
    # agg would re-sort every event row per map task (see
    # canonicalize.first_occurrence_ord for the measured cost of that plan
    # shape). (sec, event_id) is all-numeric, so the total order packs
    # order-isomorphically into one decimal(38,0) — bit-identical winners —
    # and the reduction becomes two codegen'd HashAggregates: distinct
    # (session, event_type) variants with min(ordinal), then a struct-min
    # over the per-session handful of variants.
    ordp = (
        (F.col("sec") + F.lit(str(1 << 41)).cast("decimal(38,0)"))
        * F.lit(str(1 << 64)).cast("decimal(38,0)")
        + (F.col("event_id").cast("decimal(38,0)")
           + F.lit(str(1 << 63)).cast("decimal(38,0)"))
    )
    firsts = (
        x.select("user_id", "session_id", "event_type", ordp.alias("_ord"))
        .groupBy("user_id", "session_id", "event_type")
        .agg(F.min("_ord").alias("_ord"))
        .groupBy("user_id", "session_id")
        .agg(F.min(F.struct(F.col("_ord"), F.col("event_type"))).alias("_w"))
        .select(
            "user_id",
            "session_id",
            F.col("_w.event_type").alias("first_touch_type"),
        )
    )
    conv = x.where(F.col("event_type") == conversion_type).select(
        "user_id",
        "session_id",
        F.round(F.col("value") * 100).cast("bigint").alias("value_cents"),
    )
    return (
        conv.join(firsts, ["user_id", "session_id"])
        .groupBy("first_touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum("value_cents").alias("sum_value_cents"),
        )
    )


def _cm_hash(row: int, col) -> "F.Column":
    """Portable per-row count-min hash: 48-bit md5 prefix of 'r|key',
    identical in Spark (conv) and DuckDB ('0x' || hex cast)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(row)), F.lit("|"), col.cast("string"))), 1, 12
        ),
        16,
        10,
    ).cast("bigint")


def countmin_registers(
    events: DataFrame,
    key: str = "user_id",
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Count-min sketch registers (Cormode & Muthukrishnan 2005): ``depth``
    independent hash rows x ``width`` buckets, each register the SUM of
    events landing in it — the mergeable point-frequency sibling of the
    HLL (distinct) and KMV sketches: registers ADD across partitions,
    days, and waves, so a year of per-day sketches folds into one by
    summing d*w integers, never re-reading events.

    Scale shape: each event expands to ``depth`` (row, bucket) pairs via
    an in-plan array explode (no UDF), then ONE partial-agg'd sum keyed
    by (row, bucket) — the shuffle carries at most d*w rows per map
    partition regardless of event volume.

    Returns (row, bucket, c).
    """
    k = F.col(key)
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                (_cm_hash(r, k) % width).cast("int").alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        events.where(k.isNotNull())
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def countmin_estimate(
    registers: DataFrame,
    keys: DataFrame,
    key: str = "user_id",
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-frequency estimates off a count-min register table: for each
    queried key, min over the ``depth`` rows of its register — the CMS
    guarantee is est >= true count (never under), with overestimate bounded
    by collisions. The register table is d*w rows — broadcast, so the
    probe never shuffles the key side.

    Returns (key, est).
    """
    k = F.col(key)
    probes = keys.select(
        k.alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        (_cm_hash(r, k) % width).cast("int").alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    ).select("key", "p.row", "p.bucket")
    return (
        probes.join(F.broadcast(registers), ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("c", F.lit(0))).cast("long").alias("est"))
    )


def bloom_registers(
    events: DataFrame,
    key: str = "user_id",
    group: str = "event_type",
    n_buckets: int = 64,
) -> DataFrame:
    """Blocked-Bloom membership registers per group — the mergeable
    set-membership sibling of :func:`hll_distinct` (distinct count),
    :func:`countmin_registers` (point frequency) and kmv (quantile-able
    distinct): registers OR across partitions, days, and waves, so the
    "which users has this wave seen" set for a year folds into
    ``n_buckets`` longs per group, never re-reading events.

    Hash split mirrors the HLL: the 52-bit md5 prefix gives
    bucket = h mod n_buckets and bit = (h DIV n_buckets) mod 63 —
    63 bit positions per register, never the sign bit, because a 1<<63
    literal overflows DuckDB's checked shift (the JVM wraps); staying in
    0..62 keeps register bytes bit-identical across engines. One
    partial-agg'd ``bit_or`` per (group, bucket): the shuffle carries at
    most groups x n_buckets rows per map partition regardless of volume.

    This is the oracle-portable contract twin of the xxhash64 join-prune
    filter in ``functions/bloom.py`` (which needs no cross-engine parity
    because correctness there never depends on the filter).

    Returns (``group``, bucket, bits, n_bits) — n_bits the register
    popcount, so fill ratio (the false-positive-rate driver: fp ≈ fill
    for k=1) is read directly off the sketch.
    """
    h = F.conv(
        F.substring(F.md5(F.col(key).cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    x = (
        events.where(F.col(key).isNotNull())
        .select(F.col(group).alias("grp"), h.alias("h"))
        .select(
            "grp",
            F.pmod(F.col("h"), F.lit(n_buckets)).cast("int").alias("bucket"),
            F.pmod(F.expr(f"h DIV {n_buckets}"), F.lit(63)).cast("int").alias("bit"),
        )
    )
    regs = x.groupBy("grp", "bucket").agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS bigint), bit)")).alias("bits")
    )
    return regs.select(
        F.col("grp").alias(group),
        "bucket",
        "bits",
        F.bit_count("bits").cast("int").alias("n_bits"),
    )


def bloom_membership(
    events: DataFrame,
    key: str = "user_id",
    member_pred: str = "user_id % 7 = 0",
    n_buckets: int = 64,
) -> DataFrame:
    """Probe every distinct key against a Bloom of the keys satisfying
    ``member_pred`` — the measured-semantics contract for the sketch:
    no false negatives ever (is_member implies maybe_member), false
    positives exactly those non-members whose (bucket, bit) collides.

    The register table is ``n_buckets`` rows — broadcast, so the probe
    side never shuffles; is_member comes from a broadcast left join
    against the (distinct, equally tiny by selectivity) member-key list.
    At 100 TB this is the crawl-frontier "seen set" probe shape: the
    sketch prunes the definite non-members before any exact anti-join.

    Returns (``key``, maybe_member, is_member, false_positive).
    """
    h = F.conv(
        F.substring(F.md5(F.col(key).cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    members = events.where(F.expr(member_pred)).select(F.col(key)).distinct()
    regs = (
        members.select(h.alias("h"))
        .select(
            F.pmod(F.col("h"), F.lit(n_buckets)).cast("int").alias("bucket"),
            F.pmod(F.expr(f"h DIV {n_buckets}"), F.lit(63)).cast("int").alias("bit"),
        )
        .groupBy("bucket")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS bigint), bit)")).alias("bits"))
    )
    probes = (
        events.where(F.col(key).isNotNull())
        .select(F.col(key))
        .distinct()
        .select(
            F.col(key),
            h.alias("h"),
        )
        .select(
            key,
            F.pmod(F.col("h"), F.lit(n_buckets)).cast("int").alias("bucket"),
            F.pmod(F.expr(f"h DIV {n_buckets}"), F.lit(63)).cast("int").alias("bit"),
        )
    )
    maybe = (
        F.col("bits").isNotNull()
        & (
            F.col("bits").bitwiseAND(F.expr("shiftleft(CAST(1 AS bigint), bit)"))
            != 0
        )
    )
    out = (
        probes.join(F.broadcast(regs), ["bucket"], "left")
        .join(
            F.broadcast(members.withColumn("_m", F.lit(True))), [key], "left"
        )
        .select(
            key,
            maybe.alias("maybe_member"),
            F.coalesce(F.col("_m"), F.lit(False)).alias("is_member"),
            (maybe & ~F.coalesce(F.col("_m"), F.lit(False))).alias(
                "false_positive"
            ),
        )
    )
    return out
