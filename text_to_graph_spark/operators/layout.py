"""Physical data-layout planning — the table-maintenance side of a 100 TB
Iceberg deployment (the reference materializes one SQLite/CSV graph per run
and never needs layout management; at corpus scale file clustering and
compaction ARE the read-performance story).

- ``zorder_file_stats``: Morton (Z-order) interleave of (url-hash,
  ingest-time) and the induced range-to-file assignment — multi-dimensional
  clustering so BOTH url-targeted point lookups and time-range scans prune
  files. The Z-key is computed with pure integer arithmetic (div/mod/scaled
  sums — no engine bit intrinsics), bit-identical across engines.
- ``compaction_plan``: greedy sequential bin-packing of data files into
  target-size output files (the small-files problem). This runs on the
  *metadata plane* — one row per file, ~1e6 rows for 100 TB — so its single
  ordered cumulative-sum window is driver-scale by construction, never
  data-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "zorder_key_expr",
    "zorder_file_stats",
    "compaction_plan",
    "execute_compaction",
    "execute_zorder",
    "manifest_compaction_plan",
    "snapshot_expiry_plan",
    "zone_map_pruning",
]


def zorder_key_expr(x: str, y: str, bits: int = 16) -> str:
    """SQL expression interleaving two ``bits``-bit non-negative ints into
    a Morton key (x owns the odd bit positions, y the even).

    Pure integer arithmetic — ``(v DIV 2^b) % 2`` extracts bit b, the
    scaled sum re-places it — so the same formula evaluates identically on
    any engine without bitwise intrinsics (the DuckDB oracle twin uses
    native ``>> & <<`` ops instead; agreement of the two derivations is
    part of what the gate checks).
    """
    terms = []
    for b in range(bits):
        terms.append(f"(({x}) DIV {2 ** b}) % 2 * {2 ** (2 * b + 1)}")
        terms.append(f"(({y}) DIV {2 ** b}) % 2 * {2 ** (2 * b)}")
    return " + ".join(terms)


def zorder_file_stats(
    pages: DataFrame, n_files: int = 32, bits: int = 16
) -> DataFrame:
    """Z-order layout plan for the pages table: cluster by the Morton
    interleave of (48-bit-md5(url) mod 2^bits, warc_ts affine-scaled to
    0..2^bits-1), then split the key space into ``n_files`` equal Z-ranges.

    The time-scale params (corpus min/max seconds) are two scalars — model
    state, inlined as literals, so the key pass is a pure zero-shuffle
    projection; the only exchange is the final per-file rollup (partial
    agg, ``n_files`` groups). Returns per-file clustering stats
    (file_id, n_pages, n_urls, min_z, max_z) — the planner's evidence that
    ranges are balanced before it rewrites data files.
    """
    sec = F.expr(
        "timestampdiff(SECOND, timestamp_ntz'1970-01-01 00:00:00', warc_ts)"
    )
    lo, hi = pages.agg(F.min(sec), F.max(sec)).first()
    span = max(int(hi) - int(lo), 1)
    top = 2 ** bits - 1
    keyed = pages.select(
        "url",
        F.pmod(
            F.conv(F.substring(F.md5("url"), 1, 12), 16, 10).cast("bigint"),
            F.lit(2 ** bits),
        ).alias("xh"),
        ((sec - F.lit(int(lo))) * top).cast("bigint").alias("ynum"),
    ).select(
        "url",
        "xh",
        F.expr(f"ynum DIV {span}").cast("bigint").alias("yh"),
    )
    z = keyed.select(
        "url",
        F.expr(zorder_key_expr("xh", "yh", bits)).cast("bigint").alias("zkey"),
    )
    zspace = 2 ** (2 * bits)
    return (
        z.withColumn(
            "file_id", F.expr(f"zkey * {n_files} DIV {zspace}").cast("int")
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.count_distinct("url").alias("n_urls"),
            F.min("zkey").alias("min_z"),
            F.max("zkey").alias("max_z"),
        )
    )


def compaction_plan(
    files: DataFrame,
    name_col: str = "file_name",
    size_col: str = "bytes",
    target_bytes: int = 1 << 20,
) -> DataFrame:
    """Greedy sequential bin-packing of data files into compacted outputs.

    Files are taken in name order (deterministic); a file joins the bin of
    its cumulative-bytes-before position: ``bin = cum_before DIV target``.
    This is the streaming one-pass packing every table-maintenance service
    uses — bins can slightly overflow (by at most one file), never leave a
    gap, and the assignment is a closed form of the prefix sum, so it is
    reproducible and oracle-checkable. Metadata-plane: the global ordered
    window is over the FILE LIST (one row per file), not the data.

    Returns (bin_id, n_files, total_bytes, first_file, last_file).
    """
    w = Window.orderBy(name_col).rowsBetween(Window.unboundedPreceding, -1)
    cum = files.select(
        name_col,
        F.col(size_col).cast("bigint").alias("sz"),
        F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("bigint").alias("cum_before"),
    )
    return (
        cum.withColumn(
            "bin_id", F.expr(f"cum_before DIV {target_bytes}").cast("bigint")
        )
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("sz").alias("total_bytes"),
            F.min(name_col).alias("first_file"),
            F.max(name_col).alias("last_file"),
        )
    )


def snapshot_expiry_plan(
    snapshots: DataFrame,
    id_col: str = "snapshot_id",
    ts_col: str = "committed_at",
    keep_last: int = 24,
) -> DataFrame:
    """Retention plan over a versioned table's snapshot log — which
    snapshots an ``expire_snapshots`` maintenance pass keeps (Iceberg's
    daily operational chore; a 100 TB crawl committing hourly accumulates
    ~8.8k snapshots/year of metadata without it).

    Policy (deterministic, engine-portable):

    - ``tail``: the ``keep_last`` most recent snapshots by (ts desc, id
      desc) — the operational undo window.
    - ``day_head``: the FIRST snapshot of each calendar day — the long-
      horizon time-travel checkpoints that survive the tail.
    - everything else: ``expired``.

    Metadata-plane by construction (one row per snapshot), so the global
    ordered window is bounded by snapshot count, never data size. Returns
    the input columns + (survives boolean, reason string); the physical
    delete (``streaming.ingest.expire_edge_snapshots``) consumes the plan.
    """
    w_tail = Window.orderBy(F.desc(ts_col), F.desc(id_col))
    w_day = Window.partitionBy(F.to_date(F.col(ts_col))).orderBy(
        F.asc(ts_col), F.asc(id_col)
    )
    flagged = snapshots.withColumn(
        "tail_rn", F.row_number().over(w_tail)
    ).withColumn("day_rn", F.row_number().over(w_day))
    reason = (
        F.when(F.col("tail_rn") <= keep_last, F.lit("tail"))
        .when(F.col("day_rn") == 1, F.lit("day_head"))
        .otherwise(F.lit("expired"))
    )
    return flagged.withColumn("reason", reason).select(
        *snapshots.columns,
        (F.col("reason") != "expired").alias("survives"),
        "reason",
    )


def manifest_compaction_plan(
    manifests: DataFrame,
    spec_col: str = "spec",
    name_col: str = "manifest",
    entries_col: str = "n_entries",
    target_entries: int = 256,
) -> DataFrame:
    """Bin-pack small manifests into rewrite groups, PER PARTITION SPEC —
    the metadata-plane twin of :func:`compaction_plan` (Iceberg never mixes
    manifests of different partition specs in one rewrite, so the prefix-sum
    window is partitioned by spec instead of global).

    Within a spec, manifests are taken in name order; a manifest joins the
    bin of its cumulative-entries-before position: ``bin = cum_before DIV
    target_entries``. One row per manifest in, one row per (spec, bin) out —
    at 100 TB that's ~1e4 manifest rows, driver-scale.

    Returns (spec, bin_id, n_manifests, total_entries, first_manifest,
    last_manifest).
    """
    w = Window.partitionBy(spec_col).orderBy(name_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = manifests.select(
        F.col(spec_col).alias("spec"),
        F.col(name_col).alias("mname"),
        F.col(entries_col).cast("bigint").alias("ent"),
        F.coalesce(F.sum(entries_col).over(w), F.lit(0))
        .cast("bigint")
        .alias("cum_before"),
    )
    return (
        cum.withColumn(
            "bin_id", F.expr(f"cum_before DIV {target_entries}").cast("bigint")
        )
        .groupBy("spec", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_manifests"),
            F.sum("ent").alias("total_entries"),
            F.min("mname").alias("first_manifest"),
            F.max("mname").alias("last_manifest"),
        )
    )


def zone_map_pruning(
    pages: DataFrame,
    n_files: int = 16,
    bits: int = 16,
) -> DataFrame:
    """Zone-map (min/max statistics) scan-planning report comparing TWO
    physical layouts under the same time-range predicate — the Iceberg
    manifest-pruning decision, made inspectable, and the direct evidence
    for why Z-ordering matters:

    - ``url_hash``: files = url-hash buckets (a pure-hash layout). Every
      file's warc_ts window spans the whole corpus, so the zone-map rule
      can skip NOTHING.
    - ``zorder``  : files = equal Morton-key ranges of
      (url-hash, scaled warc_ts) (:func:`zorder_file_stats`'s assignment).
      The key's interleaved time bits give each file a narrow time window,
      so a range predicate prunes whole files.

    The predicate is the middle third of the corpus warc_ts range
    (data-derived, SF-invariant). A file is skipped when its [min, max]
    misses the predicate window entirely (the conservative zone-map rule:
    overlap => must read). Returns per (layout, file_id):
    (layout, file_id, n_pages, min_sec, max_sec, is_skipped).

    Scale shape: the stats passes are partial-agg'd rollups (the write-time
    stats pass, replayed); the predicate test is a projection over
    file-count rows.
    """
    sec = F.expr(
        "timestampdiff(SECOND, timestamp_ntz'1970-01-01 00:00:00', warc_ts)"
    )
    lo, hi = pages.agg(F.min(sec), F.max(sec)).first()
    lo, hi = int(lo), int(hi)
    span = max(hi - lo, 1)
    p_lo = lo + span // 3
    p_hi = lo + 2 * span // 3
    top = 2 ** bits - 1
    keyed = pages.select(
        F.conv(F.substring(F.md5("url"), 1, 12), 16, 10)
        .cast("bigint")
        .alias("uh"),
        sec.alias("sec"),
    ).select(
        F.pmod("uh", F.lit(n_files)).cast("int").alias("hash_file"),
        F.pmod("uh", F.lit(2 ** bits)).alias("xh"),
        F.expr(f"(sec - {lo}) * {top} DIV {span}").cast("bigint").alias("yh"),
        "sec",
    )
    zspace = 2 ** (2 * bits)
    keyed = keyed.withColumn(
        "z_file",
        F.expr(
            f"({zorder_key_expr('xh', 'yh', bits)}) * {n_files} DIV {zspace}"
        ).cast("int"),
    )

    def stats(col: str, layout: str) -> DataFrame:
        return (
            keyed.groupBy(F.col(col).alias("file_id"))
            .agg(
                F.count(F.lit(1)).alias("n_pages"),
                F.min("sec").alias("min_sec"),
                F.max("sec").alias("max_sec"),
            )
            .select(F.lit(layout).alias("layout"), "*")
        )

    both = stats("hash_file", "url_hash").unionByName(stats("z_file", "zorder"))
    return both.select(
        "layout",
        "file_id",
        "n_pages",
        "min_sec",
        "max_sec",
        ((F.col("max_sec") < F.lit(p_lo)) | (F.col("min_sec") > F.lit(p_hi)))
        .alias("is_skipped"),
    )


def _table_hash(df: DataFrame, label: str) -> DataFrame:
    """Order-independent full-table content hash: per-row 48-bit md5
    prefix of the sorted-column string image, summed. One partial-agg'd
    scan; the 48-bit width keeps the sum inside int64 up to ~3e4 billion
    rows. Used to prove a physical rewrite moved every row and invented
    none."""
    cols = sorted(df.columns)
    row = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))
    h = F.conv(F.substring(row, 1, 12), 16, 10).cast("bigint")
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias(f"rows_{label}"),
        F.sum(h).cast("bigint").alias(f"hash_{label}"),
    )


def execute_compaction(
    spark,
    df: DataFrame,
    base_dir: str,
    target_bytes: int = 64 * 1024,
    fragments: int = 64,
    fragment_key: str | None = None,
) -> DataFrame:
    """EXECUTE a small-files compaction, not just plan it: fragment the
    table into many physical parquet files, bin-pack the REAL on-disk file
    list with :func:`compaction_plan`, rewrite each bin as one output
    file, and verify the rewrite end to end. This is the data-plane half
    the plan operators deliberately stop short of — the rewrite job an
    Iceberg ``rewrite_data_files`` maintenance action runs.

    Steps:
    1. write ``df`` hash-partitioned into ``fragments`` files (the
       degraded small-files state a streaming ingest leaves behind);
    2. list the written files (driver-side: the metadata plane — at 100 TB
       this list is the table format's manifest, ~1e6 rows);
    3. assign file -> bin with the plan's closed form (``cum_before DIV
       target_bytes`` over the name-ordered real byte sizes);
    4. read the fragments, broadcast-join the file->bin map on
       ``input_file_name``, ``repartition(bin_id)`` (each bin lands whole
       in one task) and write ``partitionBy(bin_id)`` — exactly one file
       per bin;
    5. read the compacted table back and verify: row count preserved,
       order-independent content hash preserved, exactly one physical
       file per bin, bins contiguous from 0.

    Returns ONE row of invariants: (rows_total, rows_match, content_match,
    one_file_per_bin, bins_contiguous). The file list, plan, and both
    hashes come from real files — a rewrite that drops, duplicates, or
    mutates any row fails the hash; a mis-bucketed write fails the
    per-bin file check.
    """
    import os

    frag_dir = os.path.join(base_dir, "fragmented")
    comp_dir = os.path.join(base_dir, "compacted")
    key = fragment_key or df.columns[0]
    df.repartition(fragments, F.col(key)).write.mode("overwrite").parquet(
        frag_dir
    )

    names = sorted(
        e.name
        for e in os.scandir(frag_dir)
        if e.name.endswith(".parquet") and not e.name.startswith(".")
    )
    sizes = [
        (n, os.path.getsize(os.path.join(frag_dir, n))) for n in names
    ]
    files = spark.createDataFrame(sizes, "file_name string, bytes bigint")
    mapping = files.select(
        "file_name",
        F.expr(
            f"coalesce(sum(bytes) OVER (ORDER BY file_name ROWS BETWEEN "
            f"UNBOUNDED PRECEDING AND 1 PRECEDING), 0) DIV {target_bytes}"
        ).cast("bigint").alias("bin_id"),
    )

    frag = spark.read.parquet(frag_dir).withColumn(
        "file_name", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    binned = frag.join(F.broadcast(mapping), "file_name").drop("file_name")
    binned.repartition("bin_id").write.mode("overwrite").partitionBy(
        "bin_id"
    ).parquet(comp_dir)

    after = spark.read.parquet(comp_dir)
    hb = _table_hash(df, "before")
    ha = _table_hash(after.drop("bin_id"), "after")
    per_bin = (
        after.select("bin_id", F.input_file_name().alias("fn"))
        .groupBy("bin_id")
        .agg(F.count_distinct("fn").alias("nf"))
    )
    fstats = per_bin.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.max("nf").alias("max_files_per_bin"),
        F.min("bin_id").alias("min_bin"),
        F.max("bin_id").alias("max_bin"),
    )
    plan_n = mapping.agg(
        F.count_distinct("bin_id").cast("bigint").alias("plan_bins")
    )
    return (
        hb.crossJoin(ha)
        .crossJoin(fstats)
        .crossJoin(plan_n)
        .select(
            F.col("rows_before").alias("rows_total"),
            (F.col("rows_after") == F.col("rows_before")).alias("rows_match"),
            (F.col("hash_after") == F.col("hash_before")).alias(
                "content_match"
            ),
            (
                (F.col("max_files_per_bin") == 1)
                & (F.col("n_bins") == F.col("plan_bins"))
            ).alias("one_file_per_bin"),
            (
                (F.col("min_bin") == 0)
                & (F.col("max_bin") == F.col("n_bins") - 1)
            ).alias("bins_contiguous"),
        )
    )


def execute_zorder(
    spark,
    pages: DataFrame,
    base_dir: str,
    n_files: int = 16,
    bits: int = 16,
) -> DataFrame:
    """EXECUTE the Z-order rewrite and re-measure zone-map pruning on the
    files actually written — the physical-plane proof behind
    :func:`zone_map_pruning`'s planning report. The pages table is keyed
    with the same Morton assignment the planner uses, physically
    rewritten one file per Z-range (``repartition(z_file)`` +
    ``partitionBy``), then read BACK from disk; per-file (min, max)
    warc_ts statistics and the mid-third-range skip verdict are computed
    from the rewritten files themselves. The output schema matches the
    planner's zorder rows, so the same oracle that checks the plan checks
    the executed layout — any row landing in the wrong physical file
    shifts that file's min/max and fails the value hash.

    Output: (layout='zorder', file_id, n_pages, min_sec, max_sec,
    is_skipped), one row per non-empty Z-range file on disk.
    """
    import os

    z_dir = os.path.join(base_dir, "zordered")
    sec = F.expr(
        "timestampdiff(SECOND, timestamp_ntz'1970-01-01 00:00:00', warc_ts)"
    )
    lo, hi = pages.agg(F.min(sec), F.max(sec)).first()
    lo, hi = int(lo), int(hi)
    span = max(hi - lo, 1)
    top = 2 ** bits - 1
    zspace = 2 ** (2 * bits)
    keyed = pages.select(
        "*",
        F.pmod(
            F.conv(F.substring(F.md5("url"), 1, 12), 16, 10).cast("bigint"),
            F.lit(2 ** bits),
        ).alias("xh"),
        F.expr(
            f"(timestampdiff(SECOND, timestamp_ntz'1970-01-01 00:00:00', "
            f"warc_ts) - {lo}) * {top} DIV {span}"
        )
        .cast("bigint")
        .alias("yh"),
    )
    keyed = keyed.withColumn(
        "z_file",
        F.expr(
            f"({zorder_key_expr('xh', 'yh', bits)}) * {n_files} DIV {zspace}"
        ).cast("int"),
    ).drop("xh", "yh")
    keyed.repartition("z_file").write.mode("overwrite").partitionBy(
        "z_file"
    ).parquet(z_dir)

    back = spark.read.parquet(z_dir)
    p_lo = lo + span // 3
    p_hi = lo + 2 * span // 3
    return (
        back.select(F.col("z_file").alias("file_id"), sec.alias("sec"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.min("sec").alias("min_sec"),
            F.max("sec").alias("max_sec"),
        )
        .select(
            F.lit("zorder").alias("layout"),
            "file_id",
            "n_pages",
            "min_sec",
            "max_sec",
            (
                (F.col("max_sec") < F.lit(p_lo))
                | (F.col("min_sec") > F.lit(p_hi))
            ).alias("is_skipped"),
        )
    )


def evolved_scan(spark, snapshot_dirs: list[str]) -> DataFrame:
    """Read a versioned table across a SCHEMA EVOLUTION boundary — the
    Iceberg add-column story over the versioned-parquet twin (same
    convention as the snapshot/time-travel family above): snapshots
    written before the column existed surface it as NULL, never as a
    read error, and the scan unions all snapshots under the widest
    schema (``mergeSchema`` — Iceberg does this by field-id resolution;
    parquet-by-name is the sandbox twin, documented as such).

    Readers then apply defaults explicitly (``coalesce``) — matching
    Iceberg v2 semantics where the default lives in table metadata, not
    in rewritten data files: a 100 TB table adds a column without
    touching a single existing file, which is the entire point.
    """
    return (
        spark.read.option("mergeSchema", "true").parquet(*snapshot_dirs)
    )


def evolved_partition_scan(spark, snapshot_dirs: list[str]) -> DataFrame:
    """Read across a PARTITION EVOLUTION boundary — the Iceberg
    change-partition-spec story over the versioned-parquet twin: snapshots
    written under the old spec keep their old directory layout forever
    (changing the spec never rewrites data), new snapshots land under the
    new spec, and ONE logical scan unions them with per-snapshot pruning —
    a predicate on a column that is a partition key only in the new spec
    prunes directories there and falls back to row filtering on the old
    files. Iceberg resolves this per-manifest via spec ids; reading each
    snapshot root under its own discovered layout and aligning by name
    (``unionByName(allowMissingColumns=True)``) is the sandbox twin.
    """
    from functools import reduce

    dfs = [spark.read.parquet(d) for d in snapshot_dirs]
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )
