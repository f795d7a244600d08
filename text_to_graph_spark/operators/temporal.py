"""Temporal joins the DataFrame API lacks as primitives: as-of join and
symmetric range join, both expressed in scale-safe shapes.

The reference engine has no temporal-join surface (its events are one-shot
LLM calls); these operators extend the engine for the telemetry/feature-
engineering workloads a large-scale training-data pipeline runs next to KG
extraction. Both are pure built-in-function compositions — no UDFs, no
cartesian products:

- ``asof_join``: for every left row, the single most recent right row with
  the same key at-or-before the left timestamp. Implemented as union +
  ONE window pass: tag both sides, sort within key by (time, side-tag,
  right-id), carry the last non-null right payload forward with
  ``last_value(ignoreNulls)``. Exactly one shuffle (hash by key), zero
  join explosion — at 100 TB this is the only as-of shape that survives:
  a naive inequality join is O(|L|·|R|) per key, and Spark would plan it
  as BroadcastNestedLoopJoin or a sort-merge with full per-key scans.
  Ties are total-ordered: among right rows sharing the latest timestamp,
  the one with the greatest ``right_id`` wins.

- ``range_join``: all (left, right) pairs with the same key whose
  timestamps differ by at most ``window`` seconds. Implemented as an
  interval-bucket equi-join: time is bucketed at ``window`` granularity,
  the right side is exploded into the 3 covering buckets (b-1, b, b+1),
  and the exact |dt| <= window predicate filters after the equi-join.
  Each qualifying pair is produced exactly once (the left row's bucket is
  unique). The join is a plain hash/sort-merge equi-join on
  (key, bucket) — never a cartesian — and the 3x duplication of the right
  side is the total cost, independent of data scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "range_join",
    "fact_history",
    "fact_validity_intervals",
    "active_facts",
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_id: str,
    payload_cols: list[str],
    tolerance: int | None = None,
) -> DataFrame:
    """Most-recent-at-or-before join, one shuffle, no explosion.

    Returns every ``left`` row with ``asof_<c>`` columns for each payload
    column plus ``asof_lag_s`` (left time minus matched right time); all
    null when no right row precedes the left row (left-outer semantics).
    ``tolerance`` (seconds) nulls out matches older than the window.
    """
    payload = F.struct(
        F.col(right_time).alias("_t"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    r = right.select(
        F.col(on).alias(on),
        F.col(right_time).alias("_time"),
        F.col(right_id).alias("_rid"),
        payload.alias("_payload"),
        F.lit(0).alias("_tag"),
    )
    l = left.withColumn("_time", F.col(left_time)).withColumn(
        "_rid", F.lit(None).cast(r.schema["_rid"].dataType)
    )
    l = l.withColumn(
        "_payload", F.lit(None).cast(r.schema["_payload"].dataType)
    ).withColumn("_tag", F.lit(1))
    both = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at the same timestamp (tag 0 < 1), so
    # "at-or-before" includes same-instant matches; among same-instant right
    # rows the greatest _rid sorts last and wins last_value
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_time").asc(), F.col("_tag").asc(), F.col("_rid").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = both.withColumn(
        "_asof", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_tag") == 1)
    match_t = F.col("_asof._t")
    if tolerance is not None:
        in_window = match_t >= F.col("_time") - F.lit(tolerance)
        out = out.withColumn(
            "_asof", F.when(in_window, F.col("_asof"))
        )
        match_t = F.col("_asof._t")
    return out.select(
        *left.columns,
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in payload_cols],
        (F.col(left_time) - match_t).alias("asof_lag_s"),
    )


def _bucket(col: Column, width: int) -> Column:
    # floor division keeps negative times correct (floor, not truncation)
    return F.floor(col / F.lit(width)).cast("bigint")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    window: int,
) -> DataFrame:
    """All same-key pairs within ``window`` seconds, as an equi-join.

    Right-side columns are suffixed ``_r`` on name collisions. The output
    contains each qualifying (left, right) pair exactly once.
    """
    lb = left.withColumn("_bucket", _bucket(F.col(left_time), window))
    collide = {c for c in right.columns if c in set(left.columns)}
    r = right.select(
        *[
            F.col(c).alias(f"{c}_r" if c in collide and c != on else c)
            for c in right.columns
        ]
    )
    rt = f"{right_time}_r" if right_time in collide and right_time != on else right_time
    rb = r.withColumn(
        "_d", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    ).withColumn("_bucket", _bucket(F.col(rt), window) + F.col("_d"))
    joined = lb.join(rb, [on, "_bucket"]).filter(
        F.abs(F.col(left_time) - F.col(rt)) <= window
    )
    return joined.drop("_bucket", "_d")


def snapshot_delta(triples: DataFrame, pages: DataFrame) -> DataFrame:
    """Canonical-edge delta between the mid-corpus snapshot and now — the
    time-travel diff an append-only ingest publishes with each wave
    ("what did this crawl add/strengthen?").

    The snapshot cutoff is the midpoint of the corpus ``warc_ts`` range
    (two scalars, inlined). Every edge is labeled:

    - ``new``    — absent from the snapshot,
    - ``grown``  — present but with more supporting documents now,
    - ``stable`` — unchanged document support.

    Scale shape: ONE equi-join of the triple stream against the narrow
    (url, sec) pages projection, then two partial-agg'd rollups over the
    same joined stream (full and time-filtered — Spark computes them as
    grouped aggregates sharing the upstream scan under AQE reuse) and a
    final edge-key join. No recomputation of extraction for the snapshot:
    the filter is on the provenance column, which is the reason the triple
    table carries ``url``. Returns
    (subj, pred, obj, n_docs, n_docs_asof, status).
    """
    sec = F.expr(
        "timestampdiff(SECOND, timestamp_ntz'1970-01-01 00:00:00', warc_ts)"
    )
    lo, hi = pages.agg(F.min(sec), F.max(sec)).first()
    cutoff = int(lo) + (int(hi) - int(lo)) // 2
    pt = pages.select("url", sec.alias("sec"))
    t = (
        triples.select("url", "subj", "pred", "obj")
        .distinct()
        .join(pt, "url")
    )
    full = t.groupBy("subj", "pred", "obj").agg(
        F.count_distinct("url").alias("n_docs")
    )
    asof = (
        t.where(F.col("sec") <= F.lit(cutoff))
        .groupBy("subj", "pred", "obj")
        .agg(F.count_distinct("url").alias("n_docs_asof"))
    )
    return (
        full.join(asof, ["subj", "pred", "obj"], "left")
        .select(
            "subj",
            "pred",
            "obj",
            "n_docs",
            F.coalesce("n_docs_asof", F.lit(0)).cast("bigint").alias("n_docs_asof"),
            F.when(F.col("n_docs_asof").isNull(), F.lit("new"))
            .when(F.col("n_docs") > F.col("n_docs_asof"), F.lit("grown"))
            .otherwise(F.lit("stable"))
            .alias("status"),
        )
    )


def entity_timeline(triples: DataFrame, pages: DataFrame) -> DataFrame:
    """Per-entity daily document-mention counts — the popularity timeline
    behind trend detection and snapshot-aware entity ranking.

    An entity "appears" in a document when any triple there has it as
    subject or object; the day comes from the page's ``warc_ts``. One
    equi-join of the (distinct) triple provenance against the narrow
    (url, day) pages projection, one union for the two endpoint roles, one
    partial-agg'd rollup. Returns (node, day, n_docs).
    """
    pd_ = pages.select(
        "url", F.date_format("warc_ts", "yyyy-MM-dd").alias("day")
    )
    t = triples.select("url", "subj", "obj").distinct().join(pd_, "url")
    nodes = t.select("url", "day", F.col("subj").alias("node")).unionByName(
        t.select("url", "day", F.col("obj").alias("node"))
    )
    return (
        nodes.distinct()
        .groupBy("node", "day")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def fact_history(triples: DataFrame, pages: DataFrame) -> DataFrame:
    """Fact validity window off crawl provenance: per distinct
    (subj, pred, obj), the first/last WARC capture epoch asserting it, the
    span between them, and the distinct-document support — the temporal-KG
    primitive behind staleness filters ("drop facts not re-asserted in the
    last N crawls") and fact-freshness features.

    Scale shape: the fact list is deduped FIRST (one distinct-shuffle on
    (url, subj, pred, obj)), the page join is a url equi-join projecting
    only the epoch column, and the rollup partial-aggregates min/max/count
    — no window functions, no skew-sensitive keys beyond the fact id.
    """
    t = triples.select("url", "subj", "pred", "obj").distinct()
    p = pages.select("url", F.col("warc_ts").cast("long").alias("epoch"))
    return (
        t.join(p, "url")
        .groupBy("subj", "pred", "obj")
        .agg(
            F.min("epoch").cast("long").alias("first_seen"),
            F.max("epoch").cast("long").alias("last_seen"),
            (F.max("epoch") - F.min("epoch")).cast("long").alias("span_s"),
            F.count_distinct("url").cast("long").alias("n_docs"),
        )
    )


def fact_validity_intervals(
    triples: DataFrame, pages: DataFrame, max_gap_s: int = 60
) -> DataFrame:
    """Coalesce a fact's capture timestamps into validity intervals —
    the gaps-and-islands primitive of temporal-KG construction: a fact
    re-asserted by captures at most ``max_gap_s`` apart is ONE continuous
    validity interval; a longer silence closes the interval and the next
    capture opens a new one ("was true, stopped being asserted, became
    true again"). ``fact_history`` collapses all captures to one
    (first, last) span; this keeps the island structure.

    Scale shape: dedup (url, fact) first, equi-join the narrow
    (url, epoch) pages projection, then ONE window pass partitioned by the
    fact key — `lag` marks interval starts, a running sum numbers the
    islands, and a partial-agg'd rollup closes them. Per-fact capture
    lists are bounded by corpus crawl counts (dozens), so the window
    partitions are tiny and uniformly keyed; no skew, no cross-fact state.

    Returns (subj, pred, obj, interval_id, first_seen, last_seen,
    n_captures) with `interval_id` numbering a fact's islands from 1 in
    time order.
    """
    t = triples.select("url", "subj", "pred", "obj").distinct()
    p = pages.select("url", F.col("warc_ts").cast("long").alias("epoch"))
    obs = t.join(p, "url").select("subj", "pred", "obj", "epoch").distinct()
    w = Window.partitionBy("subj", "pred", "obj").orderBy("epoch")
    starts = obs.withColumn(
        "is_start",
        F.when(
            F.lag("epoch").over(w).isNull()
            | (F.col("epoch") - F.lag("epoch").over(w) > max_gap_s),
            1,
        ).otherwise(0),
    )
    numbered = starts.withColumn(
        "interval_id",
        F.sum("is_start")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return numbered.groupBy("subj", "pred", "obj", "interval_id").agg(
        F.min("epoch").cast("long").alias("first_seen"),
        F.max("epoch").cast("long").alias("last_seen"),
        F.count(F.lit(1)).cast("long").alias("n_captures"),
    )


def active_facts(
    triples: DataFrame, pages: DataFrame, max_gap_s: int = 60
) -> DataFrame:
    """Currently-valid serving view over the validity intervals: a fact is
    ACTIVE when its latest interval is still open at the corpus frontier —
    last re-assertion within ``max_gap_s`` of the newest capture anywhere.
    This is the staleness gate a temporal KG applies before serving
    ("drop facts that stopped being asserted"), derived entirely from
    :func:`fact_validity_intervals`.

    Scale shape: one argmax window per fact over its (tiny) interval list,
    one 1-row corpus-frontier aggregate broadcast via crossJoin — the same
    single-broadcast-row pattern as curation's waterline. Returns
    (subj, pred, obj, last_seen, n_intervals, active).
    """
    iv = fact_validity_intervals(triples, pages, max_gap_s)
    w = Window.partitionBy("subj", "pred", "obj").orderBy(
        F.desc("interval_id")
    )
    latest = (
        iv.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "n_intervals",
            F.max("interval_id").over(
                Window.partitionBy("subj", "pred", "obj")
            ),
        )
        .where(F.col("_rn") == 1)
    )
    frontier = pages.agg(
        F.max(F.col("warc_ts").cast("long")).alias("_frontier")
    )
    return latest.crossJoin(F.broadcast(frontier)).select(
        "subj",
        "pred",
        "obj",
        F.col("last_seen").cast("long").alias("last_seen"),
        F.col("n_intervals").cast("long").alias("n_intervals"),
        (F.col("last_seen") >= F.col("_frontier") - max_gap_s).alias("active"),
    )
