"""Structured Streaming ingestion — incremental KG construction.

The reference is strictly batch (SURVEY.md §2.11); its incremental story is
the SQLite response cache (skip already-processed chunks). At corpus scale
the same story is better told as Structured Streaming over the landing
table: new page files arrive, the *identical* stateless extraction operators
run per micro-batch (``mapInPandas`` works unchanged on streaming frames),
and the sink checkpoints offsets so a killed job resumes exactly where it
stopped — the streaming twin of ``sources/checkpoint.py``.

Aggregating stages (canonicalization) are streaming aggregations with
watermarked event time, or run periodically as batch over the triple table —
the classic lambda split. ``Trigger.AvailableNow`` turns any of these into a
catch-up batch job with streaming checkpoint semantics (that is what the
tests drive, since nothing continuously produces files in the sandbox).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)
def stream_pages(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream over a pages landing directory (parquet; Iceberg
    incremental scan in production). Explicit schema — streaming sources
    never infer."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_dir)
    )


def stream_extract_triples(pages_stream: DataFrame, model_name: str = "vocab") -> DataFrame:
    """The fused extraction chain applied to a streaming frame — stateless,
    so it runs per micro-batch with no state store."""
    from text_to_graph_spark.operators.extraction import extract_triples_from_pages

    return extract_triples_from_pages(pages_stream, model_name)


def run_to_parquet(
    triples_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Checkpointed parquet sink; ``available_now`` processes the backlog and
    stops (the resumable catch-up mode the tests and sandbox use)."""
    w = (
        triples_stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def streaming_hourly_rollup(
    events_stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked event-time rollup — the streaming twin of
    ``operators/events.hourly_rollup``. Late rows beyond the watermark are
    dropped; state for closed windows is evicted.

    Watermarks require TIMESTAMP (tz-aware); the events table stores
    TIMESTAMP_NTZ, so cast under the session's pinned UTC zone —
    deterministic, no wall-clock shift."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "sum_value_cents"
            ),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "n_events",
            "sum_value_cents",
            "approx_users",
        )
    )


DOCS_SCHEMA = "doc_id bigint, text string"


def stream_docs(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream over a documents landing directory; one file per
    trigger so cross-micro-batch state is actually exercised in tests."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )


def streaming_exact_dedup(
    docs_stream: DataFrame,
    text_col: str = "text",
    watermark_col: str | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup by content hash — the streaming twin of
    ``operators/dedup.exact_duplicates``. Emits each distinct content hash
    exactly once across ALL micro-batches.

    Two state regimes:
    - ``watermark_col=None``: ``dropDuplicates`` keeps every seen hash in
      the state store forever — deterministic, but state grows with the
      distinct-document count. Right for bounded catch-up jobs.
    - with a watermark column: ``dropDuplicatesWithinWatermark`` evicts
      hashes older than the delay — bounded state, the 100 TB continuous-
      ingest mode, at the cost of re-admitting duplicates that arrive
      farther apart than the delay (the standard trade).

    Output is survivor-invariant (hash only), so results don't depend on
    which duplicate won within a micro-batch.
    """
    hashed = docs_stream.select(
        F.md5(F.col(text_col)).alias("content_hash"),
        *([F.col(watermark_col)] if watermark_col else []),
    )
    if watermark_col is None:
        return hashed.dropDuplicates(["content_hash"])
    return (
        hashed.withWatermark(watermark_col, delay)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .select("content_hash")
    )


def run_rollup_refresh(rollup_stream: DataFrame, out_dir: str, checkpoint_dir: str):
    """Complete-mode materialized-view refresh: each micro-batch overwrites
    the rollup table via ``foreachBatch`` (parquet has no native complete
    sink). This is the streaming-dashboard pattern — aggregation state lives
    in the windowed operator, the sink is an idempotent full refresh, and a
    killed job resumes from the checkpoint with identical final contents.
    """

    def _refresh(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_dir)

    return (
        rollup_stream.writeStream.foreachBatch(_refresh)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_events(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream over an events landing dir; a few files per
    trigger so the refresh genuinely iterates micro-batches in tests."""
    return (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 2)
        .parquet(landing_dir)
    )


def streaming_incremental_edges(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 2,
):
    """Streaming incremental KG maintenance: each micro-batch of NEW page
    files is extracted and canonicalized on its own, then key-merged into
    the running edge table with
    :func:`~text_to_graph_spark.operators.canonicalize.merge_canonical_edges`
    — the foreachBatch upsert shape (MERGE INTO an Iceberg table in
    production; versioned parquet snapshots here). The historical corpus is
    never re-extracted and never re-shuffled at the occurrence level; each
    batch costs its own extraction plus ONE key-level full-outer join of
    two already-aggregated tables.

    Correct because page files partition by url (each url's rows live in
    exactly one file), which is merge_canonical_edges' url-disjointness
    requirement; the final table is bit-equal to the batch
    ``triples_to_canonical_edges`` over the whole corpus (the oracle gate
    checks exactly that). Returns (query, state) — ``state["path"]`` holds
    the latest snapshot directory after ``query.awaitTermination()``.

    Exactly-once under kill/restart: snapshots are versioned by the
    streaming batch id (``out_dir/v{batch_id}``), which Structured
    Streaming preserves across restarts, and each batch merges into the
    newest snapshot whose id is STRICTLY BELOW its own — never into its
    own possibly-half-written output. A replayed batch (written but not
    committed to the checkpoint before a kill) therefore re-derives the
    identical snapshot instead of double-adding its counts, and a
    restarted query resumes from the on-disk lineage instead of an empty
    in-memory state. (Iceberg MERGE with snapshot-id idempotence is the
    production twin; local-fs versioned snapshots here.)
    """
    import os
    import re
    from text_to_graph_spark.operators.canonicalize import (
        merge_canonical_edges,
        triples_to_canonical_edges,
    )
    from text_to_graph_spark.operators.extraction import (
        extract_triples_from_pages,
    )

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )

    def _snapshot_ids() -> list[int]:
        try:
            names = os.listdir(out_dir)
        except FileNotFoundError:
            return []
        out = []
        for n in names:
            m = re.fullmatch(r"v(\d+)", n)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    ids = _snapshot_ids()
    state: dict = {
        "path": f"{out_dir}/v{ids[-1]}" if ids else None,
        "n_batches": 0,
    }

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        new_edges = triples_to_canonical_edges(
            extract_triples_from_pages(batch_df)
        )
        prior = [i for i in _snapshot_ids() if i < batch_id]
        if not prior:
            merged = new_edges
        else:
            old = batch_df.sparkSession.read.parquet(f"{out_dir}/v{max(prior)}")
            merged = merge_canonical_edges(old, new_edges)
        nxt = f"{out_dir}/v{batch_id}"
        merged.write.mode("overwrite").parquet(nxt)
        state["path"] = nxt
        state["n_batches"] += 1

    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q, state


def streaming_enriched_events(
    events_stream: DataFrame, customer: DataFrame
) -> DataFrame:
    """Stream-static dimension join — the remaining core Structured
    Streaming join shape (stateless: the static side broadcasts into every
    micro-batch, no state store, no watermark). The streaming twin of
    ``operators/events.enrich_with_customer``'s enrichment step; the rows
    append to the landing table and the per-segment rollup runs as batch
    over it (exact count_distinct is not a supported streaming aggregate —
    the classic enrich-in-stream / aggregate-in-batch split).
    """
    from pyspark.sql import functions as F

    return events_stream.join(
        F.broadcast(
            customer.select(
                F.col("c_custkey").alias("user_id"), "c_mktsegment"
            )
        ),
        "user_id",
    ).select(
        "user_id",
        "c_mktsegment",
        F.round(F.col("value") * 100).cast("bigint").alias("value_cents"),
    )


def streaming_view_purchase_join(
    views_stream: DataFrame,
    purchases_stream: DataFrame,
    attribution_window: str = "1 hour",
    delay: str = "1 day",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join — the last core Structured
    Streaming join shape (stream-static enrichment and the stateful
    aggregations are :func:`streaming_enriched_events` and
    ``stateful.py``). Each purchase joins every view by the SAME user in
    the preceding ``attribution_window`` — the click/impression
    attribution join, run continuously.

    State mechanics (why both watermarks + the time-range condition are
    mandatory): each side buffers rows in the state store; the watermark
    plus ``p_ts BETWEEN v_ts AND v_ts + window`` bound lets Spark compute
    a per-side eviction horizon, so a view is dropped from state once no
    future purchase can legally reach it — state is O(rows inside the
    watermark horizon), not O(corpus).

    Exactness contract: with an event-time-ordered landing (files sliced
    chronologically, ``write_time_sliced_landing``) and ``delay`` at least
    the attribution window, the streamed result row-for-row equals the
    batch interval join — eviction only ever removes views whose last
    possible partner's event time is already below the watermark, and no
    input row arrives late. Out-of-order landings trade exactness for the
    same bounded state (late rows beyond ``delay`` drop) — the standard
    regime split, as in :func:`streaming_exact_dedup`.

    Output: one row per (view, purchase) pair —
    (user_id, view_id, purchase_id, p_ts, value_cents).

    ``how="left_outer"`` additionally emits every unmatched view ONCE, as
    (user_id, view_id, NULL, NULL, NULL) — but only after its join window
    can no longer be reached: an unmatched view row appears iff
    ``v_ts + attribution_window`` is below the FINAL watermark
    (``max event time - delay``); unmatched views newer than that horizon
    are still open when the backlog drains and are withheld (measured:
    Spark's availableNow runs a final state-flush batch at the advanced
    watermark, so this horizon rule is exact and deterministic). This is
    the outer-join eviction contract every streaming engine documents —
    the price of never emitting a retraction.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type: {how}")
    v = (
        views_stream.where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            "user_id",
            F.col("ts").cast("timestamp").alias("v_ts"),
        )
        .withWatermark("v_ts", delay)
    )
    p = (
        purchases_stream.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("p_ts"),
            F.round(F.col("value") * 100).cast("bigint").alias("value_cents"),
        )
        .withWatermark("p_ts", delay)
    )
    return v.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (
            F.col("p_ts")
            <= F.col("v_ts") + F.expr(f"INTERVAL {attribution_window}")
        ),
        how,
    ).select("user_id", "view_id", "purchase_id", "p_ts", "value_cents")


def list_edge_snapshots(out_dir: str) -> list[int]:
    """Batch ids of the committed edge-table snapshots under ``out_dir``
    (ascending) — the time-travel axis of the versioned table
    (:func:`streaming_incremental_edges` writes one ``v{batch_id}``
    directory per micro-batch; Iceberg snapshot ids in production)."""
    import os
    import re

    try:
        names = os.listdir(out_dir)
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        m = re.fullmatch(r"v(\d+)", n)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def expire_edge_snapshots(out_dir: str, keep_last: int = 2) -> dict:
    """Physically expire old edge-table snapshots — the retention half of
    the time-travel story (Iceberg ``expire_snapshots`` over the versioned-
    parquet twin; without it a daily 100 TB crawl's snapshot log grows
    unboundedly).

    Keeps the ``keep_last`` highest batch ids, removes every other ``v{id}``
    directory. After expiry, :func:`read_edge_snapshot` on a removed id
    raises (ValueError: not in the surviving set) — an expired version can
    never be silently misread as a live one. Returns {"kept": [...],
    "removed": [...]}; idempotent and safe to re-run.
    """
    import shutil

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    ids = list_edge_snapshots(out_dir)
    keep = ids[-keep_last:]
    removed = []
    for i in ids:
        if i not in keep:
            shutil.rmtree(f"{out_dir}/v{i}")
            removed.append(i)
    return {"kept": keep, "removed": removed}


def read_edge_snapshot(
    spark: SparkSession, out_dir: str, batch_id: int | None = None
) -> DataFrame:
    """Time-travel read of the incremental edge table: the state AS OF a
    streaming batch id (default: latest). Each snapshot is a complete
    merged table, so reading one IS the as-of state — no replay needed
    (``SELECT … FOR VERSION AS OF`` in Iceberg terms). Raises on an
    unknown id so a typo cannot silently read a different version.
    """
    ids = list_edge_snapshots(out_dir)
    if not ids:
        raise FileNotFoundError(f"no edge snapshots under {out_dir}")
    if batch_id is None:
        batch_id = ids[-1]
    if batch_id not in ids:
        raise ValueError(f"no snapshot v{batch_id}; have {ids}")
    return spark.read.parquet(f"{out_dir}/v{batch_id}")


def run_dsir_admission(
    docs_stream: DataFrame,
    ratios: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    min_weight_ppm: int = 1_000_000,
    n_buckets: int = 1024,
):
    """Streaming DSIR admission — the continuous-ingest twin of
    ``operators.curation.dsir_admit``: every arriving micro-batch of
    documents is scored against the FROZEN importance table (fit once on
    a reference window by ``dsir_bucket_ratios``) and written with its
    admission verdict. ``foreachBatch`` because the per-doc rollup is
    WITHIN a batch by construction (each document arrives once; no
    cross-batch state at all), so the streaming job inherits the batch
    operator's exact-integer semantics verbatim — stream output ==
    batch output on the same rows, which the pytest pins.

    Scale shape: stateless stream-static broadcast join per batch
    (model = ``n_buckets`` rows), admission cost proportional to each
    batch; checkpointed source offsets make the job kill-and-resume
    safe with no re-admission of processed files. Model REFRESH is a
    deliberate non-goal here: production swaps the ratio table between
    runs (it's a parameter, like the classifier weights), never inside
    one.
    """
    from text_to_graph_spark.operators.curation import dsir_admit

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        (
            dsir_admit(
                batch_df, ratios, min_weight_ppm, n_buckets
            )
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            .write.mode("append")
            .parquet(out_dir)
        )

    return (
        docs_stream.writeStream.foreachBatch(_admit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
