"""Training-corpus curation operators — benchmark decontamination,
deterministic sampling, mixture balancing, repetition stats, and the
composed quality+dedup curation pipeline.

These are the "last mile" of a 100 TB training-data pipeline (the reference
stops at content-hash skip, ``graph_generator.py:341-358``; a corpus actually
shipped to training additionally needs decontamination against eval
benchmarks, per-language/domain mixture control, and quality gating):

- ``benchmark_contamination``: docs sharing any word n-gram with a benchmark
  set (the n-gram-overlap decontamination rule used by public LLM corpora).
- ``stratified_sample``: deterministic per-stratum hash sampling — a pure
  filter, zero shuffle, reproducible across engines and runs (md5-bucket,
  no rand()).
- ``balanced_mixture``: exact-integer "waterline" resampling to target
  per-stratum mixture weights — the largest total sample whose strata hit
  the requested proportions exactly (integer ppm arithmetic, no floats).
- ``repetition_stats``: intra-document duplicate n-gram ratio (the
  Gopher-style repetition quality signal).
- ``curated_corpus``: quality gate + language-agreement gate + exact-dedup
  representative filter composed into one declarative DAG.

Everything is JVM built-ins; ratios are quantized with ``round_half_up`` so
the DuckDB oracle hashes identically.

Scale notes (100 TB): contamination joins the corpus's exploded shingles
against a *broadcast* benchmark shingle set (benchmarks are MBs, the corpus
is TBs) — the corpus side never shuffles. Sampling is a stateless filter.
``balanced_mixture`` sorts within stratum (one shuffle on the stratum key);
for skewed strata at extreme scale, swap the exact rank gate for the
hash-threshold gate ``bucket * cnt_s < keep_s * 1e6`` (approximate counts,
identical determinism, no sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from text_to_graph_spark.functions.portable import round_half_up
from text_to_graph_spark.operators.dedup import shingle_rows

PPM = 1_000_000


def _hash_bucket(col):
    """Engine-portable deterministic bucket in [0, 1e6): 48-bit md5 prefix
    mod 1e6. Identical in Spark (conv) and DuckDB (hex cast)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast(
        "bigint"
    ) % PPM


def benchmark_contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc overlap with a benchmark n-gram set: docs whose text shares at
    least one word n-gram with any benchmark doc, with hit counts and ratio.

    The corpus side is explode -> broadcast-join -> per-doc agg; the
    benchmark shingle set is distinct'd then broadcast (eval benchmarks are
    tiny next to a crawl). Shingles stay raw strings here; at petabyte scale
    hash them to md5 first so shuffle width is bounded by 32 bytes.
    """
    doc_sh = shingle_rows(docs, id_col, text_col, n)
    bench_sh = shingle_rows(bench, id_col, text_col, n).select("shingle").distinct()
    per_doc = doc_sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("shingle").alias("sample_hit"),
        )
    )
    return (
        per_doc.join(hits, "id")
        .select(
            F.col("id").alias("doc_id"),
            "n_shingles",
            "n_hits",
            round_half_up(F.col("n_hits") / F.col("n_shingles").cast("double"), 4).alias(
                "hit_ratio"
            ),
            "sample_hit",
        )
    )


def stratified_sample(
    docs: DataFrame,
    rates_ppm: dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum downsample: keep rows whose md5 bucket of
    the id falls below the stratum's rate (parts-per-million). Strata absent
    from ``rates_ppm`` are dropped. Pure narrow filter — no shuffle, no rand()
    (reproducible across retries/speculative tasks, unlike ``df.sample``)."""
    rate = F.coalesce(
        *[
            F.when(F.col(stratum_col) == s, F.lit(int(p)))
            for s, p in sorted(rates_ppm.items())
        ],
        F.lit(0),
    )
    return docs.where(_hash_bucket(F.col(id_col)) < rate).withColumn(
        "sample_bucket", _hash_bucket(F.col(id_col))
    )


def bottomk_sample(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    stratum_col: str | None = None,
) -> DataFrame:
    """Deterministic EXACT-SIZE uniform sample: the ``k`` rows with the
    smallest md5(id) — bottom-k priority sampling, the mergeable twin of
    :func:`stratified_sample`'s rate filter (which yields a *binomial* size).

    Why this shape at 100 TB: bottom-k is a mergeable summary — the bottom-k
    of a union is the bottom-k of the per-shard bottom-k's — so Spark's
    sort+limit compiles to TakeOrderedAndProject (each task keeps only its
    local k rows; the driver merges K x #tasks candidates, never the data),
    and daily crawl shards can be combined without resampling. No ``rand()``:
    the sample is a pure function of the id SET, identical across engines,
    retries, partitionings, and ingestion order.

    With ``stratum_col``, the same bottom-k is taken independently inside
    each stratum (a partitioned window — shuffle keyed by stratum, k rows
    kept per group map-side via the window's partial top-k).

    Output: (id, [stratum,] priority md5 hex, sample_rank 1..k).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pri = F.md5(F.col(id_col).cast("string"))
    if stratum_col is None:
        w = Window.orderBy("priority", id_col)
        # orderBy + limit -> TakeOrderedAndProject: per-task partial top-k,
        # no global sort materialization; the window then ranks only k rows
        kept = (
            docs.select(F.col(id_col), pri.alias("priority"))
            .orderBy("priority", id_col)
            .limit(k)
        )
        return kept.withColumn(
            "sample_rank", F.row_number().over(w).cast("int")
        )
    w = Window.partitionBy(stratum_col).orderBy("priority", id_col)
    return (
        docs.select(F.col(id_col), F.col(stratum_col), pri.alias("priority"))
        .withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .where(F.col("sample_rank") <= k)
    )


def balanced_mixture(
    docs: DataFrame,
    weights_ppm: dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Largest exact-proportion sample: given target mixture weights (ppm,
    summing to <= 1e6), keep the biggest total T such that every stratum s
    can supply keep_s = T * w_s // 1e6 rows, then take exactly keep_s rows
    per stratum in deterministic hash order.

    All arithmetic is integer (ppm), so Spark and the SQL oracle agree bit
    for bit. Plan: one small per-stratum count agg (broadcast back), one
    rank window per stratum. Strata not in the weight map are dropped.
    """
    weights = [(s, int(p)) for s, p in sorted(weights_ppm.items())]
    wmap = F.create_map(*[F.lit(x) for sp in weights for x in sp])
    in_scope = docs.where(
        F.col(stratum_col).isin([s for s, _ in weights])
    ).withColumn("w_ppm", wmap[F.col(stratum_col)])
    counts = in_scope.groupBy(stratum_col, "w_ppm").agg(
        F.count(F.lit(1)).alias("cnt_s")
    )
    # waterline: T = min over strata of cnt_s*1e6 DIV w_s — 64-bit integer
    # division (DIV, not /: float division loses exactness past 2^53)
    caps = counts.select(
        F.min(F.expr(f"(cnt_s * {PPM}) DIV w_ppm")).alias("waterline")
    )
    ranked = (
        in_scope.withColumn("bucket", _hash_bucket(F.col(id_col)))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy(stratum_col).orderBy("bucket", id_col)
            ),
        )
        .crossJoin(F.broadcast(caps))
        .withColumn("keep_target", F.expr(f"(waterline * w_ppm) DIV {PPM}"))
    )
    return ranked.where(F.col("rank") <= F.col("keep_target")).select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        F.col("rank").cast("bigint").alias("rank"),
        F.col("keep_target").cast("bigint").alias("keep_target"),
    )


def repetition_stats(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Intra-document repetition: total vs distinct word n-grams and the
    duplicate ratio (the Gopher-style repetition quality rule). Pure
    per-row array expressions — zero shuffle."""
    w = F.split(F.col(text_col), " ")
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, (i + k + 1).cast("int")) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        total.cast("bigint").alias("n_grams"),
        distinct.cast("bigint").alias("n_distinct_grams"),
        F.when(total > 0, round_half_up((total - distinct) / total.cast("double"), 4))
        .otherwise(F.lit(0.0))
        .alias("dup_gram_ratio"),
    )


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 1024,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training-sequence packing: assign whole documents to fixed-budget
    training sequences in deterministic id order within each stratum (the
    concat-then-chunk packing a pretraining dataloader performs, computed
    ahead of time so the shuffle/写 order is reproducible).

    A document starting at running-token-offset ``c`` lands in sequence
    ``c DIV budget`` at in-sequence offset ``c % budget`` — a pure prefix-sum
    per stratum: one shuffle on the stratum key, one window cumsum in id
    order, all integer arithmetic. Per-stratum packing keeps the window
    partitioned (a single global sequence would serialize the cumsum; at
    extreme stratum skew use the two-phase per-partition-offset variant).
    Returns (doc_id, stratum, n_tokens, seq_id, tok_offset).
    """
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(n_tok).over(w) - n_tok
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        n_tok.alias("n_tokens"),
        start.alias("_start"),
    ).select(
        "doc_id",
        "stratum",
        "n_tokens",
        F.expr(f"_start DIV {int(budget_tokens)}").cast("bigint").alias("seq_id"),
        (F.col("_start") % budget_tokens).cast("bigint").alias("tok_offset"),
    )


def curated_corpus(
    docs: DataFrame,
    min_quality: float = 0.62,
    min_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    gopher_stopwords: tuple[str, ...] | None = None,
) -> DataFrame:
    """The composed curation gate a pretraining corpus actually ships
    through: exact-dedup representative AND quality score >= threshold AND
    declared-vs-predicted language agreement AND minimum length AND
    (optionally) the published Gopher rule battery.

    One DAG: the dedup representative is a min-over-window on the content
    hash (one shuffle), quality/langid are per-row expressions fused into
    the same stage. Passing ``gopher_stopwords`` additionally requires
    ``passes_gopher`` from :func:`~text_to_graph_spark.operators.textstats.
    gopher_rules` (published thresholds, caller-supplied stopword config) —
    another zero-shuffle projection joined on doc_id, so the composed gate
    stays one scan wide. Returns the kept docs with their gate metrics.
    """
    from text_to_graph_spark.operators.textstats import (
        gopher_rules,
        language_id,
        quality_stats,
    )

    rep = F.min(id_col).over(Window.partitionBy(F.md5(F.col(text_col))))
    base = docs.withColumn("rep_id", rep).where(F.col(id_col) == F.col("rep_id"))
    q = quality_stats(base, id_col, text_col)
    l = language_id(base, id_col, text_col)
    out = (
        base.select(F.col(id_col).alias("doc_id"), "lang", "source")
        .join(q.select("doc_id", "n_tokens", "quality_score"), "doc_id")
        .join(l.select("doc_id", "is_match"), "doc_id")
        .where(
            (F.col("quality_score") >= min_quality)
            & (F.col("n_tokens") >= min_tokens)
            & F.col("is_match")
        )
    )
    if gopher_stopwords is not None:
        g = gopher_rules(base, id_col, text_col, stopwords=gopher_stopwords)
        out = out.join(
            g.where("passes_gopher").select("doc_id"), "doc_id", "left_semi"
        )
    return out.select("doc_id", "lang", "source", "n_tokens", "quality_score")


def site_stats(pages: DataFrame) -> DataFrame:
    """Per-site corpus curation rollup over the Common-Crawl-style pages
    table: the site key is the first path segment after the host
    (``https://host/<site>/...``), which is the synthesis source and, in a
    real crawl, the domain-level grouping every curation pipeline reports
    by (docs, language spread, byte volume, crawl-time span).

    Pure built-ins: one ``split`` projection + one partial-aggregated
    shuffle on the site key (domain counts are Zipfian at crawl scale —
    the partial agg absorbs the skew before the exchange). Timestamps are
    reported as tz-free epoch seconds so results are engine-portable.
    """
    site = F.split(F.col("url"), "/").getItem(3).alias("site")
    return (
        pages.select(
            site,
            F.col("lang"),
            F.length("text").cast("bigint").alias("n_chars"),
            F.length("html").cast("bigint").alias("n_html_bytes"),
            F.col("warc_ts").cast("long").alias("epoch_s"),
        )
        .groupBy("site")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pages"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_html_bytes").alias("total_html_bytes"),
            F.expr("sum(n_chars) DIV count(*)").alias("chars_per_page"),
            F.min("epoch_s").alias("first_crawl_epoch"),
            F.max("epoch_s").alias("last_crawl_epoch"),
        )
    )


def leakage_safe_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Train/val/test assignment that near-duplicates cannot straddle.

    A hash split on doc_id leaks: a near-duplicate pair lands in train AND
    test, and eval scores inflate. Splitting on the near-dup CLUSTER id
    (minhash/LSH -> connected components, :func:`~text_to_graph_spark.
    operators.dedup.near_dup_clusters`) puts every member of a duplicate
    family in the same fold by construction. The fold draw is the 48-bit
    md5 of the cluster id mod 100 — deterministic and engine-portable.

    Stability caveat: the cluster id is the minimum member doc_id, so fold
    assignment is stable across incremental ingests ONLY when new doc ids
    are monotonically increasing (the standard crawl-wave convention). A
    new document with a SMALLER id that joins an existing cluster renames
    the cluster and moves the whole family to a (random) different fold —
    as does a cluster merge, which is unavoidable under any
    membership-derived key. For non-monotonic id schemes, re-split the
    corpus from scratch or freeze fold assignments for previously seen
    doc_ids in an external table; do not rely on the hash staying put.

    Scale shape: inherits the LSH-join + small-star CC cost of
    near_dup_clusters; the split itself is a pure projection. Returns
    (doc_id, cluster, bucket, split).
    """
    from text_to_graph_spark.operators.dedup import near_dup_clusters

    cl = near_dup_clusters(docs, id_col=id_col, text_col=text_col)
    h = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("cluster").cast("string")), 1, 12), 16, 10
        ).cast("bigint"),
        F.lit(100),
    ).cast("int")
    return cl.select(
        "doc_id",
        "cluster",
        h.alias("bucket"),
        F.when(h < train_pct, F.lit("train"))
        .when(h < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def classifier_scores(
    docs: DataFrame,
    n_dims: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Frozen linear quality-classifier inference at corpus scale — the
    fastText/CCNet-style model filter a pretraining pipeline runs over
    every document.

    The SHAPE is the production path: sparse hashed feature vectors
    (``textstats.hashed_features``) dotted with a model weight vector, one
    partial-agg'd sum per doc, keep decision at score >= 0. The WEIGHTS are
    a deterministic md5-derived stand-in (this sandbox trains no model) —
    swap the inline expression for a broadcast (dim, weight) table to serve
    a real checkpoint; nothing else changes. All-integer arithmetic, so the
    score is bit-identical across engines and shuffle orders.

    Docs whose every hashed dimension cancels to zero (or empty text) still
    get a row (score 0, kept) via the left join against the doc id spine.

    Scale: inference is expression-only (no Python, no UDF); the only
    shuffles are hashed_features' (doc_id, dim) partial agg and the per-doc
    sum — both keyed by doc_id, co-partitioned.
    """
    from text_to_graph_spark.operators.textstats import hashed_features

    feats = hashed_features(docs, n_dims, id_col, text_col)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("w#"), F.col("dim").cast("string"))), 1, 12),
        16,
        10,
    ).cast("bigint")
    model_w = (h % 2001) - 1000
    sc = (
        feats.select("doc_id", (F.col("weight") * model_w).cast("bigint").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").cast("bigint").alias("score"))
    )
    spine = docs.select(F.col(id_col).alias("doc_id")).distinct()
    return spine.join(sc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("score", F.lit(0)).cast("bigint").alias("score"),
        (F.coalesce("score", F.lit(0)) >= 0).alias("kept"),
    )


def quality_percentile_gate(
    docs: DataFrame,
    keep_pct: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-source percentile quality cut — keep the top ``keep_pct``% of
    each source by quality score, instead of one global threshold.

    Quality distributions differ wildly per source (a forum dump and an
    encyclopedia don't share a cut line); a global threshold silently drops
    whole sources. The gate is exact-integer: rank*100 <= keep_pct*count
    with rank = row_number over (quality desc, doc_id asc), so the kept set
    is deterministic under ties and identical across engines (no
    percent_rank float seam).

    Output: (doc_id, source, quality_score, src_rank, src_docs, kept).

    Scale: quality is a per-row expression; the rank and count are one
    window shuffle partitioned by source. A pathologically hot source makes
    that window skewed — profile with ``canonicalize.join_skew_profile`` and
    pre-split by a salt on the EXPRESSION level if needed (the rank can be
    computed per salt-bucket and merged by (bucket offset) since the order
    key is global per source; not wired here because source cardinality ×
    docs-per-source stays reducer-sized in this corpus).
    """
    from text_to_graph_spark.operators.textstats import quality_stats

    q = quality_stats(docs, id_col, text_col).select("doc_id", "quality_score")
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(group_col).alias("source"))
    j = base.join(q, "doc_id")
    w = Window.partitionBy("source").orderBy(F.desc("quality_score"), F.asc("doc_id"))
    ranked = j.select(
        "doc_id",
        "source",
        "quality_score",
        F.row_number().over(w).cast("long").alias("src_rank"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).cast("long").alias("src_docs"),
    )
    return ranked.withColumn(
        "kept", (F.col("src_rank") * 100) <= (F.lit(keep_pct) * F.col("src_docs"))
    )


def _word_ngrams(n: int):
    """Positional word n-grams of the token array column ``_w`` (empty
    when the document is shorter than n — guarded because Spark's
    sequence(1, 0) counts DOWN instead of returning empty)."""
    return F.when(
        F.size(F.col("_w")) >= n,
        F.expr(
            f"transform(sequence(1, size(_w) - {n - 1}), "
            f"i -> concat_ws(' ', slice(_w, i, {n})))"
        ),
    ).otherwise(F.array().cast("array<string>"))


def host_boilerplate_shingles(
    docs: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_frac_ppm: int = 500_000,
    min_pages: int = 2,
) -> DataFrame:
    """Host-level boilerplate detection: word ``n``-grams present on at
    least ``min_frac_ppm`` of a host's pages (and ``min_pages`` absolute)
    — nav bars, footers, cookie banners. The standard Common-Crawl
    curation step BEFORE quality scoring and dedup: boilerplate inflates
    both page quality and cross-page similarity, so a corpus pipeline
    mines it per host and strips or discounts it.

    Scale shape: shingles are DEDUPED PER PAGE before the host rollup
    (presence, not frequency — one distinct-shuffle keyed by page), the
    (host, shingle) count partial-aggregates, and the per-host page
    totals are a tiny broadcast join. ppm math is integer floor division
    — bit-identical across engines.

    Returns (host, shingle, n_pages, frac_ppm).
    """
    base = docs.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("_id"),
        F.split(F.col(text_col), " ").alias("_w"),
    )
    sh = (
        base.select("host", "_id", F.explode(_word_ngrams(n)).alias("shingle"))
        .distinct()
    )
    totals = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.count_distinct(F.col(id_col)).alias("_total")
    )
    return (
        sh.groupBy("host", "shingle")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pages"))
        .join(F.broadcast(totals), "host")
        .withColumn(
            "frac_ppm",
            F.expr(f"(n_pages * {PPM}) DIV _total").cast("long"),
        )
        .where(
            (F.col("frac_ppm") >= min_frac_ppm) & (F.col("n_pages") >= min_pages)
        )
        .select("host", "shingle", "n_pages", "frac_ppm")
    )


def boilerplate_coverage(
    docs: DataFrame,
    boilerplate: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-page boilerplate load: the fraction of a page's shingle
    POSITIONS (not distinct shingles) covered by its host's mined
    boilerplate set — the score the "drop page vs trim footer" decision
    reads. Pages shorter than ``n`` words keep a row with zero counts
    (doc spine preserved).

    Scale shape: positions explode once; the probe is a (host, shingle)
    equi-join against the mined set, which is hosts x a handful of
    shingles — broadcast, so the corpus side never shuffles for it.

    Returns (doc_id, n_shingles, n_boiler, boiler_ppm).
    """
    base = docs.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("_w"),
    )
    pos = base.select(
        "host", "doc_id", F.explode(_word_ngrams(n)).alias("shingle")
    )
    bp = boilerplate.select("host", "shingle", F.lit(1).alias("_hit"))
    per_doc = (
        pos.join(F.broadcast(bp), ["host", "shingle"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_boiler"),
        )
    )
    spine = docs.select(F.col(id_col).alias("doc_id")).distinct()
    return (
        spine.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_boiler", F.lit(0)).cast("long").alias("n_boiler"),
            F.when(
                F.coalesce("n_shingles", F.lit(0)) > 0,
                F.expr(f"(n_boiler * {PPM}) DIV n_shingles"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("boiler_ppm"),
        )
    )


def strip_host_boilerplate_lines(
    docs: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_frac_ppm: int = 500_000,
    min_pages: int = 2,
) -> DataFrame:
    """Cross-document boilerplate-line REMOVAL — the strip step behind
    :func:`host_boilerplate_shingles`'s mining (CCNet/trafilatura-style):
    a trimmed non-blank line present on at least ``min_frac_ppm`` of a
    host's pages (and ``min_pages`` absolute) is navigation/footer
    template, and every occurrence is removed from every page of that
    host. Kept lines preserve original bytes and order; blank lines are
    structural and always kept. Output: (doc_id, text, n_removed) with
    ``text`` byte-exact (the contract query's oracle compares the cleaned
    document itself).

    Scale shape: mining is presence-deduped per page then a (host, line)
    partial-agg count with the per-host page totals broadcast (the
    host_boilerplate_shingles pattern); removal is a (host, line-key)
    left_anti equi-join on the exploded lines — never a per-host
    collect — and reassembly sorts each document's surviving (pos, line)
    pairs inside one hash-partitioned aggregation. The exploded lines are
    recomputed for the mining and removal branches rather than
    localCheckpointed: re-running a split+posexplode projection twice is
    scan-speed work, while materializing the exploded corpus would cost
    its full footprint in executor storage.
    """
    lines = docs.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("key", F.trim(F.col("line")))
    totals = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.count_distinct(F.col(id_col)).alias("_total")
    )
    freq = (
        lines.where(F.col("key") != "")
        .select("host", "doc_id", "key")
        .distinct()
        .groupBy("host", "key")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .join(F.broadcast(totals), "host")
        .where(
            (F.expr(f"n_pages * {PPM} DIV _total") >= F.lit(min_frac_ppm))
            & (F.col("n_pages") >= F.lit(min_pages))
        )
        .select("host", "key")
    )
    kept = lines.join(freq, ["host", "key"], "left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text"),
        F.count(F.lit(1)).alias("_kept"),
    )
    spine = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), "\n")).alias("_n_lines"),
    )
    return spine.join(reassembled, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        (F.col("_n_lines") - F.coalesce(F.col("_kept"), F.lit(0)))
        .cast("bigint")
        .alias("n_removed"),
    )


def train_linear_classifier(
    docs: DataFrame,
    labels: DataFrame,
    n_dims: int = 64,
    rounds: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed batch-perceptron training of the linear quality
    classifier — the TRAINER the :func:`classifier_scores` docstring
    defers to ("swap the stand-in weights for a real checkpoint"). Closes
    the classifier story train -> score -> gate the way ``emb_kmeans``
    (centroids) and ``kg_bpe_train`` (merges) close theirs.

    Classic batch perceptron in EXACT INTEGER arithmetic, so the learned
    weights are bit-identical across engines, shuffle orders, and retries
    (no learning-rate float, no sigmoid): per round, score every document
    against the current weights (hashed-feature dot product), find the
    misclassified set (label * score <= 0), and add the summed
    label-weighted feature mass of that set to the weights.

    ``labels`` is (doc_id, y) with y in {-1, +1}. Returns the full weight
    trajectory (round, dim, weight) for rounds 1..``rounds`` — a
    model-parameter table (rounds x n_dims rows, driver-built like the
    k-means centroid and BPE merge tables).

    Scale shape: features are computed ONCE and localCheckpointed (they
    feed every round); per round the weights are a driver-side literal map
    (64 entries), so scoring is a zero-shuffle projection over the feature
    rows plus one per-doc partial-agg'd sum; the update is one
    dim-keyed partial agg whose collect is <= n_dims rows — the model
    parameter, not data. Round count is the only driver loop.
    """
    from itertools import chain

    from text_to_graph_spark.operators.textstats import hashed_features

    feats = hashed_features(docs, n_dims, id_col, text_col).localCheckpoint(
        eager=True
    )
    lab = labels.select(F.col(id_col).alias("doc_id"), F.col("y")).localCheckpoint(
        eager=True
    )
    w = {d: 0 for d in range(n_dims)}
    rows = []
    for r in range(rounds):
        wmap = F.create_map(
            *chain.from_iterable(
                (F.lit(d), F.lit(v).cast("long")) for d, v in w.items()
            )
        )
        scores = (
            feats.select("doc_id", (wmap[F.col("dim")] * F.col("weight")).alias("_c"))
            .groupBy("doc_id")
            .agg(F.sum("_c").alias("_s"))
        )
        mis = (
            lab.join(scores, "doc_id", "left")
            .where(F.col("y") * F.coalesce(F.col("_s"), F.lit(0)) <= 0)
            .select("doc_id", "y")
        )
        delta = (
            feats.join(mis, "doc_id")
            .groupBy("dim")
            .agg(F.sum(F.col("y") * F.col("weight")).alias("_d"))
            .collect()
        )
        for row in delta:
            w[row["dim"]] += row["_d"]
        rows.extend((r + 1, d, w[d]) for d in range(n_dims))
    return docs.sparkSession.createDataFrame(
        rows, "round int, dim int, weight long"
    )


def classifier_eval(
    docs: DataFrame,
    labels: DataFrame,
    trajectory: DataFrame,
    n_dims: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-round confusion matrix of a trained linear classifier over a
    labeled corpus — the evaluation step between
    :func:`train_linear_classifier` and serving the gate: a real pipeline
    picks the round/checkpoint by held-out accuracy before filtering
    100 TB with it.

    ``trajectory`` is the (round, dim, weight) table the trainer emits.
    Decision rule matches training: predict +1 iff score > 0. Output per
    round: (round, tp, fp, tn, fn, accuracy_ppm) — exact integer ppm.

    Scale shape: the trajectory is model-sized (rounds x n_dims) and
    broadcast; scoring every round is ONE feature-join projection plus a
    (doc, round)-keyed partial-agg sum — no per-round driver loop over the
    corpus (the tiny round-list collect is a model parameter). Docs whose
    features all cancel (or empty text) score 0 via the label spine.
    """
    from text_to_graph_spark.operators.textstats import hashed_features

    feats = hashed_features(docs, n_dims, id_col, text_col)
    traj = trajectory.select(
        "round", "dim", F.col("weight").alias("_w")
    )
    scored = (
        feats.join(F.broadcast(traj), "dim")
        .select("doc_id", "round", (F.col("_w") * F.col("weight")).alias("_c"))
        .groupBy("doc_id", "round")
        .agg(F.sum("_c").alias("_s"))
    )
    rounds = sorted(
        r["round"] for r in trajectory.select("round").distinct().collect()
    )
    spine = labels.select(F.col(id_col).alias("doc_id"), "y").withColumn(
        "round", F.explode(F.array(*[F.lit(r) for r in rounds]))
    )
    ev = spine.join(scored, ["doc_id", "round"], "left").select(
        "round",
        "y",
        F.when(F.coalesce(F.col("_s"), F.lit(0)) > 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("pred"),
    )
    c = ev.groupBy("round").agg(
        F.sum(((F.col("y") == 1) & (F.col("pred") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("y") == -1) & (F.col("pred") == 1)).cast("long")).alias("fp"),
        F.sum(((F.col("y") == -1) & (F.col("pred") == -1)).cast("long")).alias("tn"),
        F.sum(((F.col("y") == 1) & (F.col("pred") == -1)).cast("long")).alias("fn"),
    )
    return c.select(
        "round",
        "tp",
        "fp",
        "tn",
        "fn",
        F.expr("(tp + tn) * 1000000 DIV (tp + fp + tn + fn)")
        .cast("bigint")
        .alias("accuracy_ppm"),
    )


def token_budget_mixture(
    docs: DataFrame,
    budgets: dict[str, int],
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget mixture selection: per language keep the
    highest-quality documents until that language's TOKEN budget is
    exhausted — mixtures are specified in tokens (what the training run
    consumes), not documents, and dividing a doc-count target by mean doc
    length gets the mix wrong whenever length and quality correlate.

    Rank: (quality_score desc, doc_id asc) — the corpus-standard
    deterministic order; a document is kept iff its cumulative token count
    INCLUDING itself stays within the budget (the boundary-crossing doc is
    dropped, so budgets are hard caps). Languages without a budget keep
    nothing. Output: (doc_id, lang, n_tokens, quality_score, cum_tokens,
    kept).

    Scale shape: quality and token counts are per-row expressions fused
    into the scan; the only shuffle is ONE window partitioned by language.
    A pathologically hot language makes that window's partition big —
    the same documented skew class as quality_percentile_gate (salt by
    quality band and merge boundaries if a single language dominates the
    corpus).
    """
    from text_to_graph_spark.operators.textstats import quality_stats

    q = quality_stats(docs, id_col, text_col).select(
        "doc_id", "n_tokens", "quality_score"
    )
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang"))
    j = base.join(q, "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    cum = F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, 0))
    budget = F.coalesce(
        *(
            [
                F.when(F.col("lang") == k, F.lit(v))
                for k, v in sorted(budgets.items())
            ]
            + [F.lit(-1)]
        )
    )
    return j.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "quality_score",
        cum.cast("bigint").alias("cum_tokens"),
        (cum <= budget).alias("kept"),
    )


def dsir_gate(
    docs: DataFrame,
    target_filter: str = "lang = 'en'",
    n_buckets: int = 1024,
    keep_pct: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Hashed n-gram importance weighting for data selection — the DSIR
    recipe (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"), exact-integer end to end: featurize every
    document as hashed unigram+bigram bucket counts, estimate the target
    (``target_filter`` rows) and raw bucket distributions with add-one
    smoothing, weight each document by its average per-gram importance
    ratio, and keep the per-``group_col`` top ``keep_pct``% by weight.

    Deliberate, documented deviation from the paper: the per-bucket
    LOG-ratio sum (a float log per bucket) is replaced by the first-order
    ratio average — weight_ppm = (Σ_g ratio_ppm[bucket(g)]) DIV n_grams
    with ratio_ppm[b] = p̂_target[b]/p̂_raw[b] in exact ppm — so the whole
    weight is integer arithmetic, bit-identical across engines, shuffle
    orders, and retries (the same reason CCNet's KenLM became terciles and
    the quality gate avoids percent_rank). Ranking behavior matches the
    log form wherever ratios are moderate; the gate contract is the
    bit-exact weight itself. Selection mirrors
    :func:`quality_percentile_gate`: rank*100 <= keep_pct*count per
    group, deterministic ties by doc id — no global single-reducer sort.

    Scale shape: one explode + one partial-agg'd shuffle on the 48-bit-md5
    bucket key builds the two distributions (``n_buckets`` rows — model
    state); the ratio table broadcast-joins back onto the gram stream; the
    per-doc rollup reuses the doc_id exchange; the rank is one window per
    group. Output: (doc_id, source, n_grams, weight_ppm, src_rank,
    src_docs, kept).
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("source"),
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "").alias("w"),
        F.expr(target_filter).alias("is_target"),
    )
    bis = F.expr(
        "transform(slice(w, 1, greatest(size(w) - 1, 0)), "
        "(x, i) -> concat_ws(' ', slice(w, i + 1, 2)))"
    )
    g = base.select(
        "doc_id",
        "is_target",
        F.explode(F.concat(F.col("w"), bis)).alias("gram"),
    ).select(
        "doc_id",
        "is_target",
        F.pmod(
            F.conv(F.substring(F.md5("gram"), 1, 12), 16, 10).cast("bigint"),
            F.lit(n_buckets),
        ).alias("bucket"),
    )
    counts = g.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt_r"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0))
        .cast("bigint")
        .alias("cnt_t"),
    )
    totals = counts.agg(
        F.sum("cnt_r").alias("tot_r"), F.sum("cnt_t").alias("tot_t")
    )
    # staged integer divisions, documented order (overflow-safe: each
    # factor stays under 1e6 before the final DIV)
    ratio = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.expr(
            f"((cnt_t + 1) * 1000000 DIV (tot_t + {n_buckets})) * 1000000 "
            f"DIV greatest((cnt_r + 1) * 1000000 DIV (tot_r + {n_buckets}), 1)"
        )
        .cast("bigint")
        .alias("ratio_ppm"),
    )
    per = (
        g.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.expr("sum(ratio_ppm) DIV count(1)").cast("bigint").alias(
                "weight_ppm"
            ),
        )
    )
    scored = base.select("doc_id", "source").join(per, "doc_id", "left").select(
        "doc_id",
        "source",
        F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
        F.coalesce("weight_ppm", F.lit(0)).cast("bigint").alias("weight_ppm"),
    )
    win = Window.partitionBy("source").orderBy(
        F.col("weight_ppm").desc(), F.col("doc_id").asc()
    )
    cnt = Window.partitionBy("source")
    return scored.select(
        "*",
        F.row_number().over(win).cast("bigint").alias("src_rank"),
        F.count(F.lit(1)).over(cnt).cast("bigint").alias("src_docs"),
    ).withColumn(
        "kept", F.col("src_rank") * 100 <= F.lit(keep_pct) * F.col("src_docs")
    )


def dsir_bucket_ratios(
    docs: DataFrame,
    target_filter: str = "lang = 'en'",
    n_buckets: int = 1024,
    text_col: str = "text",
) -> DataFrame:
    """The DSIR model alone: the (bucket, ratio_ppm) importance table
    :func:`dsir_gate` fits — hashed unigram+bigram bucket counts over the
    reference window, target vs raw with add-one smoothing, exact-ppm
    staged divisions. ``n_buckets`` rows: model state, broadcastable.
    Fit once on a reference window; admit forever with
    :func:`dsir_admit`."""
    base = docs.select(
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "").alias("w"),
        F.expr(target_filter).alias("is_target"),
    )
    bis = F.expr(
        "transform(slice(w, 1, greatest(size(w) - 1, 0)), "
        "(x, i) -> concat_ws(' ', slice(w, i + 1, 2)))"
    )
    g = base.select(
        "is_target", F.explode(F.concat(F.col("w"), bis)).alias("gram")
    ).select(
        "is_target",
        F.pmod(
            F.conv(F.substring(F.md5("gram"), 1, 12), 16, 10).cast("bigint"),
            F.lit(n_buckets),
        ).alias("bucket"),
    )
    counts = g.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt_r"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0))
        .cast("bigint")
        .alias("cnt_t"),
    )
    totals = counts.agg(
        F.sum("cnt_r").alias("tot_r"), F.sum("cnt_t").alias("tot_t")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.expr(
            f"((cnt_t + 1) * 1000000 DIV (tot_t + {n_buckets})) * 1000000 "
            f"DIV greatest((cnt_r + 1) * 1000000 DIV (tot_r + {n_buckets}), 1)"
        )
        .cast("bigint")
        .alias("ratio_ppm"),
    )


def dsir_admit(
    new_docs: DataFrame,
    ratios: DataFrame,
    min_weight_ppm: int = 1_000_000,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental DSIR admission — the streaming-arrival half of the
    selection story (mirrors ``emb_semdedup_probe`` / the incremental
    near-dup probe): score a NEW batch against the FROZEN importance
    table from :func:`dsir_bucket_ratios` and admit documents whose
    average per-gram importance clears ``min_weight_ppm`` (1e6 = "looks
    exactly like the raw distribution"; above that, target-like).

    No re-fit, no rank window, no corpus-wide state: one explode over the
    new batch, a broadcast join against the ``n_buckets``-row model, one
    doc_id rollup — the probe's cost is proportional to the BATCH, never
    the corpus, which is what makes per-crawl admission viable at 100 TB.
    Buckets unseen at fit time carry no row in the model; their grams
    score 0 (maximally out-of-distribution), matching add-one smoothing's
    intent without the probe ever touching fit-time totals.

    Output: (doc_id, n_grams, weight_ppm, admitted)."""
    base = new_docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "").alias("w"),
    )
    bis = F.expr(
        "transform(slice(w, 1, greatest(size(w) - 1, 0)), "
        "(x, i) -> concat_ws(' ', slice(w, i + 1, 2)))"
    )
    g = base.select(
        "doc_id", F.explode(F.concat(F.col("w"), bis)).alias("gram")
    ).select(
        "doc_id",
        F.pmod(
            F.conv(F.substring(F.md5("gram"), 1, 12), 16, 10).cast("bigint"),
            F.lit(n_buckets),
        ).alias("bucket"),
    )
    per = (
        g.join(F.broadcast(ratios), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.expr("sum(coalesce(ratio_ppm, 0)) DIV count(1)")
            .cast("bigint")
            .alias("weight_ppm"),
        )
    )
    return (
        base.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("weight_ppm", F.lit(0)).cast("bigint").alias("weight_ppm"),
            (F.coalesce("weight_ppm", F.lit(0)) >= min_weight_ppm).alias(
                "admitted"
            ),
        )
    )
