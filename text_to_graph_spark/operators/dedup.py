"""Corpus deduplication operators — exact, MinHash/LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

A Common-Crawl-scale corpus is massively duplicated; dedup runs before the
KG pipeline (the reference's content-hash skip, ``graph_generator.py:341-358``,
generalized). All hashing is md5-hex (portable across engines for the oracle
check); everything is JVM built-ins — `split`/`transform`/`explode`/`min` —
no Python in the hot path.

Scale notes (100 TB): exact dedup is one hash-shuffle; MinHash banding makes
near-dup candidate generation linear (band-bucket join instead of n²); the
verify step only touches candidate pairs. Shingle explosion multiplies rows
by ~doc length — keep shingles as md5 hex (fixed 32 bytes) so shuffle width
is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_to_graph_spark.functions.portable import round_half_up


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content with the
    representative (min id) and duplicate count."""
    return (
        docs.select(F.col(id_col).alias("id"), F.md5(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("id").alias("representative"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def _shingles(text_col, n: int = 3):
    """Distinct word n-gram shingles as an array<string> (space-joined)."""
    w = F.split(text_col, " ")
    return F.array_distinct(
        F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(w, (i + k + 1).cast("int")) for k in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def shingle_rows(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingle) exploded distinct shingles."""
    return docs.select(
        F.col(id_col).alias("id"), F.explode(_shingles(F.col(text_col), n)).alias("shingle")
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 8,
    rows: int = 4,
) -> DataFrame:
    """Per-doc banded MinHash signature — ``bands`` bands of ``rows``
    CONCATENATED min-hashes each (the industry b×r S-curve family).

    Min-hash i (i in [0, bands*rows)) = min over shingles of the affine
    permutation h_i(s) = (a_i * (md5_60(s) mod p) + b_i) mod p with
    p = 2^31-1 and md5-derived constants (``functions.portable``).
    Band b's key bk{b} = md5(mh_{b*r} || '|' || ... || mh_{b*r+r-1}).

    Why affine-over-one-md5 instead of bands*rows independent md5 strings:
    ONE md5 per shingle row instead of 32, and — decisive for the plan
    shape — the mins aggregate over fixed-width bigints, which keeps the
    whole signature reduction in codegen'd HashAggregate with map-side
    partial aggregation. min(md5-hex-string) puts a var-length buffer in
    the agg, and Spark falls back to SortAggregate: every shingle row gets
    SORTED by doc id per map task before reducing. (A third formulation —
    array_min(transform(...)) over per-doc shingle arrays, zero shuffle —
    measured 2x SLOWER than this one despite the saved exchange:
    higher-order-function lambdas evaluate interpreted, outside whole-stage
    codegen, so 32 per-element lambda traversals lose to one codegen'd
    hash aggregation. Measured: keep_best 3.6s here vs 7.1s as HOFs.)

    Why r>1 matters at 100 TB: with single-hash bands (r=1),
    P(band collision) ≈ j for LOW-jaccard pairs, so a globally-small-hash
    common shingle (a stopword trigram on a web corpus) becomes the band
    min for a huge doc population → one bucket of size ~N → C(N,2)
    candidate blowup. Concatenating r hashes makes P(band) = j^r — the
    S-curve P(candidate) = 1-(1-j^r)^b stays ~0 below the similarity knee
    and ~1 above it, so hot-bucket candidate mass is bounded by
    construction, not just measured after the fact.

    Output: (id, bk0..bk{bands-1}, bucket) where bucket = md5 of the full
    banded signature (exact-signature grouping key)."""
    if bands < 1 or rows < 1:
        raise ValueError(f"bands and rows must be >= 1; got bands={bands}, rows={rows}")
    from text_to_graph_spark.functions.portable import MINHASH_P, minhash_coeffs

    sh = shingle_rows(docs, id_col, text_col, n)
    base = (
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
        % F.lit(MINHASH_P)
    )
    aggs = [
        F.min((F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_coeffs(bands * rows))
    ]
    sig = sh.select("id", base.alias("_h")).groupBy("id").agg(*aggs)
    for b in range(bands):
        sig = sig.withColumn(
            f"bk{b}",
            F.md5(F.concat_ws("|", *[f"mh{b * rows + j}" for j in range(rows)])),
        )
    return sig.select(
        "id",
        *[f"bk{b}" for b in range(bands)],
        F.md5(F.concat_ws("|", *[f"bk{b}" for b in range(bands)])).alias("bucket"),
    )


def minhash_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 8,
    rows: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on ALL ``rows`` min-hashes of
    at least one band (each band key is its own LSH bucket equi-join).
    P(candidate) = 1-(1-j^rows)^bands. Output (id_a, id_b, n_bands_shared)."""
    # materialize the signatures ONCE: they feed `bands` union branches and
    # both sides of the self-join — without this the full shingle explosion
    # + aggregation re-executes up to 2*bands times (measured 7x wall time)
    sig = minhash_signatures(docs, id_col, text_col, n, bands, rows).localCheckpoint(
        eager=True
    )
    per_band = None
    for b in range(bands):
        part = sig.select("id", F.col(f"bk{b}").alias("h"), F.lit(b).alias("band"))
        per_band = part if per_band is None else per_band.unionByName(part)
    a = per_band.select(F.col("id").alias("id_a"), "h", "band")
    bdf = per_band.select(F.col("id").alias("id_b"), "h", "band")
    return (
        a.join(bdf, ["h", "band"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.countDistinct("band").alias("n_bands_shared"))
    )


def band_load_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 8,
    rows: int = 4,
) -> DataFrame:
    """LSH bucket-load diagnostics — the pre-flight that predicts whether
    the band join will blow up BEFORE paying for it.

    The candidate-pair join's cost is sum over buckets of C(size, 2): one
    overloaded bucket (boilerplate shingles hashing every mirror page
    together) quadratically dominates the whole near-dup job at corpus
    scale. Per (band, log2 bucket size): bucket count, the largest bucket,
    and the EXACT candidate-pair mass those buckets contribute — all
    integer (size*(size-1) DIV 2), bit-equal across engines. Reading the
    top size_bucket rows tells you whether to shard hot buckets or raise
    the shingle length before launching the join. With r×b signatures
    (``rows`` > 1) this histogram PROVES the bound — a bucket key is r
    concatenated mins, so a single hot shingle can no longer capture the
    whole corpus — where with r=1 it could only measure the blowup. One
    signature pass + a (band, key)-keyed partial-agg count; the histogram
    itself is ~64 rows per band. Returns
    (band, size_bucket, n_buckets, max_bucket_size, n_candidate_pairs).
    """
    sig = minhash_signatures(docs, id_col, text_col, n, bands, rows).localCheckpoint(
        eager=True
    )
    per_band = None
    for b in range(bands):
        part = sig.select(F.col(f"bk{b}").alias("h"), F.lit(b).alias("band"))
        per_band = part if per_band is None else per_band.unionByName(part)
    buckets = per_band.groupBy("band", "h").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return (
        buckets.withColumn(
            "size_bucket", F.length(F.bin("sz")).cast("int")
        )
        .groupBy("band", "size_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("sz").alias("max_bucket_size"),
            F.sum(F.expr("sz * (sz - 1) DIV 2")).alias("n_candidate_pairs"),
        )
        .select(
            F.col("band").cast("int").alias("band"),
            "size_bucket",
            F.col("n_buckets").cast("bigint").alias("n_buckets"),
            F.col("max_bucket_size").cast("bigint").alias("max_bucket_size"),
            F.col("n_candidate_pairs").cast("bigint").alias("n_candidate_pairs"),
        )
    )


def minhash_recall(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 8,
    rows: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Measured recall of the b x r MinHash LSH family against exact
    shingle Jaccard — the dedup twin of ``similarity.ann_recall``
    ("measure, don't guess" as a first-class table). Truth = all pairs
    with exact n-gram Jaccard >= threshold (:func:`ngram_jaccard_pairs`
    over the SAME shingle family the signatures hash, shared-shingle
    blocked — never all-pairs); found = the banded candidate set
    (:func:`minhash_candidate_pairs`). One output row:
    (n_true, n_candidates, n_hit, recall_ppm) in exact integer ppm.

    Run at fixture scale whenever (n, bands, rows, threshold) change: the
    theoretical S-curve P(candidate) = 1-(1-j^r)^b says what recall
    SHOULD be (j=0.5, r=4, b=8 -> ~0.40; j=0.8 -> ~0.98); this table says
    what it IS on real text, which is how banding parameters are actually
    chosen. The three 1-row aggregates cross-join as broadcast waterlines
    (the documented 1-row crossJoin pattern), nothing corpus-sized moves.
    """
    grouped = docs.withColumn("_g", F.lit(1))
    truth = ngram_jaccard_pairs(
        grouped, "_g", id_col, text_col, n, threshold
    ).select("id_a", "id_b")
    cand = minhash_candidate_pairs(
        docs, id_col, text_col, n, bands, rows
    ).select("id_a", "id_b", F.lit(1).alias("hit"))
    hits = truth.join(cand, ["id_a", "id_b"], "left")
    agg = hits.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true"),
        F.count("hit").cast("bigint").alias("n_hit"),
    )
    n_cand = cand.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    return agg.crossJoin(n_cand).select(
        "n_true",
        "n_candidates",
        "n_hit",
        F.expr("n_hit * 1000000 DIV greatest(n_true, 1)")
        .cast("bigint")
        .alias("recall_ppm"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for doc pairs within a blocking group
    (``group_col``) — the verify step after LSH blocking. Output
    (id_a, id_b, jaccard rounded to 4 dp). Integer intersection/union counts,
    so the double division is order-independent and engine-portable."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.explode(_shingles(F.col(text_col), n)).alias("shingle"),
    ).localCheckpoint(eager=True)  # reused by sizes + both join sides
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "grp", "shingle")
    b = sh.select(F.col("id").alias("id_b"), "grp", "shingle")
    inter = (
        a.join(b, ["grp", "shingle"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            round_half_up(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def containment_pairs(
    docs: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Asymmetric shingle containment within a blocking group — the
    quote/boilerplate-wrap detector symmetric Jaccard misses.

    containment(A in B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|: a
    short doc fully quoted inside a long one scores ~1.0 here but near-zero
    Jaccard (the union is dominated by the long doc). Output
    (id_a, id_b, cont_a_in_b, cont_b_in_a) for unordered pairs where either
    direction clears ``threshold``; containments rounded to 4 dp from exact
    integer counts (engine-portable).

    Scale: identical shape to :func:`ngram_jaccard_pairs` — the shingle
    equi-join is blocked by ``group_col`` (in production the LSH band key),
    so cost is per-block candidates, never corpus n². One localCheckpoint
    keeps the shingle explosion from re-executing for sizes + both join
    sides.
    """
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.explode(_shingles(F.col(text_col), n)).alias("shingle"),
    ).localCheckpoint(eager=True)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "grp", "shingle")
    b = sh.select(F.col("id").alias("id_b"), "grp", "shingle")
    inter = (
        a.join(b, ["grp", "shingle"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "cont_a_in_b",
            round_half_up(F.col("inter") / F.col("sz_a").cast("double"), 4),
        )
        .withColumn(
            "cont_b_in_a",
            round_half_up(F.col("inter") / F.col("sz_b").cast("double"), 4),
        )
        .where(F.greatest("cont_a_in_b", "cont_b_in_a") >= threshold)
        .select("id_a", "id_b", "cont_a_in_b", "cont_b_in_a")
    )
    return out


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32) -> DataFrame:
    """Per-doc SimHash over the (non-distinct) token stream.

    Bit i of a token = high bit of nibble i of md5(token); simhash bit i =
    sign of the +-1 vote sum. Rendered as a bit-string column (portable).
    Implemented as token x bit cross-explode -> two-key groupBy -> ordered
    string_agg; identical shape in the SQL oracle.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(F.split(text_col, " ")).alias("tok")
    ).withColumn("h", F.md5("tok"))
    votes = (
        toks.select(
            "id", "h", F.explode(F.sequence(F.lit(1), F.lit(bits))).alias("bit")
        )
        .withColumn(
            "vote",
            F.when(
                F.substring(F.col("h"), F.col("bit"), 1).isin(
                    "8", "9", "a", "b", "c", "d", "e", "f"
                ),
                1,
            ).otherwise(-1),
        )
        .groupBy("id", "bit")
        .agg(F.sum("vote").alias("s"))
    )
    return votes.groupBy("id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("bit", "s"))
                ),
                lambda st: F.when(st["s"] > 0, "1").otherwise("0"),
            ),
        ).alias("simhash")
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, BRUTE FORCE (O(n²) cartesian).

    Fixture-scale recall oracle ONLY — the production/contract path is
    :func:`embedding_neardup_pairs_lsh`, whose candidate generation is a
    bucket equi-join. Cosine is a fixed-order left fold in double precision
    so results are bit-identical across engines. Output
    (id_a, id_b, cos rounded 6)."""
    from text_to_graph_spark.operators.similarity import cosine_expr, with_norm

    a = with_norm(emb, id_col, vec_col, "a")
    b = with_norm(emb, id_col, vec_col, "b")
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", round_half_up(cosine_expr("vec_a", "vec_b", "norm_a", "norm_b"), 6))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def embedding_neardup_pairs_lsh(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
    n_bits: int = 8,
    n_tables: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed — the 100 TB path.

    Candidate generation is a SELF equi-join of multi-table random-hyperplane
    codes (:func:`~text_to_graph_spark.operators.similarity.hyperplane_codes`:
    ``n_tables`` independent tables of ``n_bits`` md5-seeded hyperplanes; a
    pair is a candidate if it collides in ANY table). The code join shuffles
    only (id, tbl, bucket) triples — never the vectors; exact cosine then
    verifies only the distinct candidate pairs after two id-equi-joins fetch
    the vectors back. Recall for a pair at angle θ is
    1-(1-(1-θ/π)^n_bits)^n_tables: near-duplicates (θ→0) are found with
    probability ~1, uncorrelated pairs collide in ~n_tables/2^n_bits of
    cases — the standard SimHash-for-angles dedup contract.
    Output (id_a, id_b, cos).

    ``dim`` is the embedding dimensionality, a dataset-config constant at
    scale (every production embedding table pins it); when omitted it is
    probed with a LIMIT-1 job — pass it explicitly in pipelines to avoid
    that extra (cheap but nonzero) Spark job per call."""
    from text_to_graph_spark.operators.similarity import (
        cosine_expr,
        hyperplane_codes,
        hyperplanes,
        with_norm,
    )

    if dim is None:
        first = emb.select(F.size(vec_col).alias("d")).first()
        if first is None:
            raise ValueError("embedding_neardup_pairs_lsh: empty input")
        dim = first["d"]
    planes = hyperplanes(dim, n_bits, n_tables)

    codes = hyperplane_codes(emb, planes, id_col, vec_col, "vid")
    codes = codes.localCheckpoint(eager=True)  # reused on both join sides
    cand = (
        codes.withColumnRenamed("vid", "id_a")
        .join(codes.withColumnRenamed("vid", "id_b"), ["tbl", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = with_norm(emb, id_col, vec_col, "a")
    b = with_norm(emb, id_col, vec_col, "b")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "cos",
            round_half_up(cosine_expr("vec_a", "vec_b", "norm_a", "norm_b"), 6),
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def near_dup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 8,
    rows: int = 4,
) -> DataFrame:
    """End-to-end near-duplicate clustering — the composition a corpus-dedup
    job actually runs: MinHash/LSH candidate pairs -> connected components
    -> one cluster id per document (singletons cluster with themselves; the
    cluster id is the min member id, the deterministic representative).

    Output: (doc_id, cluster, is_representative). Downstream keeps
    ``is_representative`` rows only — at Common-Crawl scale this is the
    single biggest data-reduction step before extraction.
    """
    from text_to_graph_spark.operators.components import connected_components

    pairs = minhash_candidate_pairs(docs, id_col, text_col, n, bands, rows)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    ids = docs.select(F.col(id_col).alias("doc_id")).distinct()
    out = (
        ids.join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .withColumn("cluster", F.coalesce(F.col("component"), F.col("doc_id")))
        .select("doc_id", "cluster")
    )
    return out.withColumn("is_representative", F.col("doc_id") == F.col("cluster"))


def neardup_keep_best(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 8,
    rows: int = 4,
) -> DataFrame:
    """Fuzzy dedup with quality-argmax representatives — keep the BEST copy
    of each near-duplicate family, not the arbitrary min-id one.

    Production corpora (Dolma/FineWeb-style) don't keep a random cluster
    member: they keep the highest-quality exemplar. Composition:
    :func:`near_dup_clusters` (MinHash/LSH -> connected components) joined
    with ``textstats.quality_stats``; per cluster the survivor is the max
    ``quality_score`` doc, ties broken by min doc_id (deterministic).

    Output one row per cluster: (cluster, kept_id, quality_score,
    n_members, n_dropped).

    Scale: the per-cluster argmax is a packed decimal(38,0) ordinal —
    (desc quality, asc doc_id) is all-numeric (quality_score is exact at 4
    decimals), so it packs order-isomorphically into one fixed-width value
    and the reduction is a single codegen'd HashAggregate with map-side
    partial aggregation: each map task emits ONE row per cluster it sees,
    so the shuffle carries ~|clusters| rows, not ~|docs| rows. The window
    formulation this replaces shuffled every member row to its cluster's
    partition and sorted it there. Winners are bit-identical (same total
    order). Quality scores are per-row expressions fused into the scan
    stage.
    """
    from text_to_graph_spark.operators.textstats import quality_stats

    cl = near_dup_clusters(docs, id_col, text_col, n, bands, rows)
    q = quality_stats(docs, id_col, text_col).select("doc_id", "quality_score")
    j = cl.select("doc_id", "cluster").join(q, "doc_id")
    # score is floor(x*1e4+0.5)/1e4, so round-half-up recovers the exact
    # integer 0..10000; lower ordinal == (higher score, then lower doc_id)
    two64 = F.lit(str(1 << 64)).cast("decimal(38,0)")
    two63 = F.lit(str(1 << 63)).cast("decimal(38,0)")
    # null score (null text) packs as -1: worse than every real score, the
    # same placement desc-nulls-last gave it in the window formulation
    score_e4 = F.coalesce(
        F.floor(F.col("quality_score") * F.lit(10000.0) + F.lit(0.5)), F.lit(-1)
    )
    ordinal = (
        (F.lit(20000) - score_e4).cast("decimal(38,0)") * two64
        + (F.col("doc_id").cast("decimal(38,0)") + two63)
    )
    agg = j.select("cluster", ordinal.alias("_ord")).groupBy("cluster").agg(
        F.min("_ord").alias("_w"),
        F.count(F.lit(1)).alias("n_members"),
    )
    rem = F.col("_w") % two64
    k = ((F.col("_w") - rem) / two64).cast("long")
    return agg.select(
        "cluster",
        (rem - two63).cast("long").alias("kept_id"),
        F.when(k == 20001, F.lit(None).cast("double"))
        .otherwise((F.lit(20000) - k) / F.lit(10000.0))
        .alias("quality_score"),
        F.col("n_members").cast("long").alias("n_members"),
        (F.col("n_members") - 1).cast("long").alias("n_dropped"),
    )


def duplicated_span_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document cross-document duplicated-span coverage — the
    fixed-length proxy for suffix-array exact-substring dedup ("train-data
    dedup makes LMs better"): every position-level word ``n``-gram that
    also appears in ANOTHER document is a duplicated span.

    Position-level (NOT distinct-shingle) counting: a document whose
    boilerplate footer repeats a cross-doc shingle 5 times has 5 duplicated
    positions — coverage measures how much of the byte stream is shared,
    which is what the downstream "drop or trim" decision needs.

    Scale shape: one explode (a row per word position, the same order of
    magnitude as tokenization), then ONE hash shuffle on the shingle key
    to find multi-doc shingles. The group key is the 64-bit-prefix md5 of
    the shingle, not the string — shuffle rows carry 16 hex chars instead
    of ~50+ text bytes (at corpus scale the shuffle IS the cost; hash
    collisions are FPs at ~2^-64, acceptable for a dedup signal and
    portable to the oracle). The per-doc rollup re-shuffles on doc_id with
    map-side partial aggregation. Returns
    (doc_id, n_spans, n_dup_spans, dup_frac_e6) — exact integers.
    """
    w = F.split(F.col(text_col), " ")
    spans = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, (i + k + 1).cast("int")) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pos = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(spans).alias("span"),
    ).select(
        "doc_id", F.substring(F.md5("span"), 1, 16).alias("key")
    )
    multi = (
        pos.where(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("key", F.lit(1).alias("dup"))
    )
    per_doc = (
        pos.join(multi, "key", "left")
        .groupBy("doc_id")
        .agg(
            F.count("key").alias("n_spans"),
            F.coalesce(F.sum("dup"), F.lit(0)).cast("bigint").alias("n_dup_spans"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_spans",
        "n_dup_spans",
        F.expr("n_dup_spans * 1000000 DIV greatest(n_spans, 1)")
        .cast("bigint")
        .alias("dup_frac_e6"),
    )


def span_trim(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """The removal TRANSFORM behind :func:`duplicated_span_stats` — the
    fixed-length distributed analogue of suffix-array ExactSubstr dedup
    ("Deduplicating Training Data Makes Language Models Better", Lee et
    al. 2022): delete from each document every word covered by a
    cross-document duplicated ``n``-gram, keep the rest, and return the
    reconstructed text. A word at position j is covered iff SOME span
    start i in [j-n+1, j] is a shingle that also occurs in another
    document — i.e. maximal duplicated runs are excised whole, including
    their overlapping tails, which is exactly the ExactSubstr cut rule at
    fixed granularity.

    Unlike :func:`~text_to_graph_spark.operators.textstats.remove_repeated_lines`
    (within-doc, shuffle-free), this rule is inherently CROSS-document, so
    it pays the real distributed cost, and only that: the shingle pass
    reuses duplicated_span_stats' shape (one explode + one hash shuffle on
    the 64-bit md5-prefix key — shuffle rows carry 16 hex chars, never the
    shingle text); the word stream then equi-joins the DUPLICATED
    span-start list only (sparse — dup starts, not all spans; broadcast
    at fixture scale, AQE-planned at corpus scale), and coverage is a
    per-document sliding ``max`` window over the joined flags whose
    doc_id exchange the reconstruction rollup reuses (plan-verified: one
    Exchange between the join and the final aggregate). Words normalize
    to single-space joins (the split the stats operator already defines).

    Output: (doc_id, text, n_words, n_removed) — ``text`` byte-exactly the
    space-join of surviving words ('' if everything was duplicated), so
    the oracle checks the cleaned document itself, not a proxy statistic.
    """
    from pyspark.sql import Window

    w = F.split(F.col(text_col), " ")
    spans = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, (i + k + 1).cast("int")) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    span_pos = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(spans).alias("pos", "span")
    ).select("doc_id", "pos", F.substring(F.md5("span"), 1, 16).alias("key"))
    multi = (
        span_pos.groupBy("key")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("key")
    )
    dup_starts = span_pos.join(multi, "key", "left_semi").select(
        "doc_id", "pos", F.lit(1).alias("f")
    )
    words = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(w).alias("pos", "word")
    )
    frame = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    flagged = words.join(dup_starts, ["doc_id", "pos"], "left").select(
        "doc_id",
        "pos",
        "word",
        F.max(F.coalesce(F.col("f"), F.lit(0))).over(frame).alias("covered"),
    )
    return flagged.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("covered") == 0, F.struct("pos", "word")
                        )
                    )
                ),
                lambda s: s["word"],
            ),
        ).alias("text"),
        F.count(F.lit(1)).alias("n_words"),
        F.sum("covered").cast("bigint").alias("n_removed"),
    )


def span_trim_maximal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_run: int = 50,
) -> DataFrame:
    """Variable-length ExactSubstr dedup — the published recipe from Lee
    et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"), which removes MAXIMAL duplicated runs of at least
    ``min_run`` tokens (the paper uses 50), not every word touched by a
    fixed-width shingle. :func:`span_trim` is the fixed-``n`` cut rule;
    this operator generalizes it: cross-document duplicated ``n``-gram
    anchors are merged into maximal variable-length runs FIRST
    (gaps-and-islands over anchor positions), and only runs whose total
    word length reaches ``min_run`` are excised — short incidental
    overlaps (idioms, named entities) survive, long verbatim duplication
    is cut whole, which is exactly what distinguishes ExactSubstr from
    naive shingle removal.

    Pipeline (each step one partial-agg'd shuffle, no UDF):
    1. duplicated anchor starts, as in :func:`span_trim` (shuffle rows
       carry the 64-bit md5 prefix, never shingle text);
    2. islands: anchors sorted per doc; a new run starts when the gap to
       the previous anchor exceeds ``n`` (equal-width intervals
       [pos, pos+n-1] overlap or touch iff the next start is within
       ``n``) — one lag window + running sum on the doc_id exchange;
    3. per-island extent (min start, max start + n - 1) and total run
       length; islands below ``min_run`` are dropped — at corpus scale
       this filter is where ~90% of candidate mass exits, BEFORE any
       per-word work;
    4. kept islands explode to covered positions (cost proportional to
       the text actually removed) and anti-join the word stream; the
       reconstruction rollup reuses the doc_id exchange.

    Output: (doc_id, text, n_words, n_removed, n_runs) — ``text`` is the
    byte-exact space-join of surviving words, ``n_runs`` the count of
    maximal runs excised.
    """
    from pyspark.sql import Window

    w = F.split(F.col(text_col), " ")
    spans = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, (i + k + 1).cast("int")) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    span_pos = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(spans).alias("pos", "span")
    ).select("doc_id", "pos", F.substring(F.md5("span"), 1, 16).alias("key"))
    multi = (
        span_pos.groupBy("key")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("key")
    )
    dup_starts = span_pos.join(multi, "key", "left_semi").select("doc_id", "pos")

    by_pos = Window.partitionBy("doc_id").orderBy("pos")
    islands = (
        dup_starts.withColumn("prev", F.lag("pos").over(by_pos))
        .withColumn(
            "new_run",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > n),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("run_id", F.sum("new_run").over(by_pos))
        .groupBy("doc_id", "run_id")
        .agg(
            F.min("pos").alias("start"),
            (F.max("pos") + F.lit(n - 1)).alias("end"),
        )
        .where(F.col("end") - F.col("start") + 1 >= min_run)
    )
    # islands are disjoint by construction (a new run requires an anchor
    # gap > n, so consecutive extents are separated by >= 2 words) — the
    # exploded positions are already unique, no distinct needed
    covered = islands.select(
        "doc_id", F.explode(F.sequence("start", "end")).alias("pos")
    )

    words = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(w).alias("pos", "word")
    )
    flagged = words.join(
        covered.withColumn("f", F.lit(1)), ["doc_id", "pos"], "left"
    ).select("doc_id", "pos", "word", F.coalesce("f", F.lit(0)).alias("covered"))
    kept = flagged.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("covered") == 0, F.struct("pos", "word"))
                    )
                ),
                lambda s: s["word"],
            ),
        ).alias("text"),
        F.count(F.lit(1)).alias("n_words"),
        F.sum("covered").cast("bigint").alias("n_removed"),
    )
    runs = islands.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_runs")
    )
    return kept.join(runs, "doc_id", "left").select(
        "doc_id",
        "text",
        "n_words",
        "n_removed",
        F.coalesce("n_runs", F.lit(0)).cast("bigint").alias("n_runs"),
    )


def source_overlap(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Cross-source shingle-overlap matrix — which corpus slices duplicate
    each other (mirror sites, syndication, scraped re-posts). The mixture
    designer reads this before weighting sources: two sources with high
    overlap should not both be upsampled.

    One shuffle on the shingle, then the per-shingle sorted source set is
    expanded to pairs with a nested-``transform`` array expression
    (codegen'd; bounded by |sources|² per shingle — never a self-join of
    the shingle table with itself, which at corpus scale would re-shuffle
    the whole thing twice). Marginals broadcast. Exact-integer Jaccard.
    Returns (source_a, source_b, n_shared, n_a, n_b, jaccard_e6).
    """
    sh = docs.select(
        F.col(source_col).alias("source"),
        F.explode(_shingles(F.col(text_col), n)).alias("shingle"),
    ).distinct()
    marg = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    pairs_expr = F.expr(
        "flatten(transform(ss, (x, i) -> "
        "transform(slice(ss, i + 2, size(ss)), "
        "y -> struct(x AS a, y AS b))))"
    )
    pc = (
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
        .where(F.size("ss") >= 2)
        .select(F.explode(pairs_expr).alias("p"))
        .groupBy(
            F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        pc.join(
            F.broadcast(
                marg.select(
                    F.col("source").alias("source_a"), F.col("n").alias("n_a")
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                marg.select(
                    F.col("source").alias("source_b"), F.col("n").alias("n_b")
                )
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.expr("n_shared * 1000000 DIV (n_a + n_b - n_shared)")
            .cast("bigint")
            .alias("jaccard_e6"),
        )
    )


def incremental_neardup_probe(
    new_docs: DataFrame,
    old_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 8,
    rows: int = 4,
) -> DataFrame:
    """Incremental ingest dedup: probe NEW documents against the EXISTING
    corpus's MinHash signatures — the per-crawl-wave shape (the batch
    near-dup job re-hashes everything; the incremental one hashes only the
    wave and joins the stored signature table, completing the incremental
    family alongside edges/nodes/components maintenance).

    The join is new-band x old-band on (band, hash) — candidate
    generation never pairs new-with-new or old-with-old (in-wave dups are
    the batch job's business). Every new doc appears exactly once:
    (new_id, is_dup, dup_of, n_bands_shared) where ``dup_of`` is the
    smallest matching old id (deterministic) and n_bands_shared its
    agreement strength; non-duplicates carry nulls/0.

    Scale shape: signature build for the wave only + one equi-join against
    the (persisted, in production) old signature table, partial-agg'd
    candidate rollup, then a packed-ordinal argmin per new id (codegen'd
    HashAggregate, see inline note).
    """
    # localCheckpoint: each signature DataFrame feeds `bands` union
    # branches in bandify — without the lineage cut the shingle explode +
    # min aggregation re-executes once per branch (the measured 7x
    # regression documented in minhash_candidate_pairs).
    new_sig = minhash_signatures(new_docs, id_col, text_col, n, bands, rows).localCheckpoint(
        eager=True
    )
    old_sig = minhash_signatures(old_docs, id_col, text_col, n, bands, rows).localCheckpoint(
        eager=True
    )

    def bandify(sig: DataFrame, out: str) -> DataFrame:
        per = None
        for b in range(bands):
            part = sig.select(
                F.col("id").alias(out),
                F.col(f"bk{b}").alias("h"),
                F.lit(b).alias("band"),
            )
            per = part if per is None else per.unionByName(part)
        return per

    cand = (
        bandify(new_sig, "new_id")
        .join(bandify(old_sig, "old_id"), ["h", "band"])
        .groupBy("new_id", "old_id")
        .agg(F.count_distinct("band").alias("n_bands_shared"))
    )
    # argmin by (desc n_bands_shared, asc old_id) — all-numeric, so it
    # packs order-isomorphically into one decimal(38,0) and reduces in
    # codegen'd HashAggregate with map-side partial aggregation
    # (min_by(struct, struct) carries a var-length agg buffer and planned
    # a per-map-task SortAggregate over every candidate pair)
    two64 = F.lit(str(1 << 64)).cast("decimal(38,0)")
    two63 = F.lit(str(1 << 63)).cast("decimal(38,0)")
    ordinal = (
        (F.lit(bands) - F.col("n_bands_shared")).cast("decimal(38,0)") * two64
        + (F.col("old_id").cast("decimal(38,0)") + two63)
    )
    best = (
        cand.select("new_id", ordinal.alias("_ord"))
        .groupBy("new_id")
        .agg(F.min("_ord").alias("_w"))
    )
    rem = F.col("_w") % two64
    ids = new_docs.select(F.col(id_col).alias("new_id")).distinct()
    return ids.join(best, "new_id", "left").select(
        "new_id",
        F.col("_w").isNotNull().alias("is_dup"),
        (rem - two63).cast("long").alias("dup_of"),
        F.coalesce(
            F.lit(bands) - ((F.col("_w") - rem) / two64).cast("long"), F.lit(0)
        )
        .cast("bigint")
        .alias("n_bands_shared"),
    )


def simhash_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = 32,
) -> DataFrame:
    """SimHash near-duplicate pairs via the classic band-index + Hamming
    verify (the Google web-dedup recipe): two documents within
    ``max_hamming`` bit flips MUST agree exactly on at least one of
    ``bands`` disjoint bit bands (pigeonhole, since max_hamming < bands),
    so candidate generation is a band equi-join — never an all-pairs scan
    — and the exact Hamming check runs only on band-collision survivors.

    Scale shape: signatures computed once (``localCheckpoint`` — they feed
    ``bands`` union branches and both join sides), the band join keyed on
    (band, 8-bit substring), pair dedup by partial-agg distinct, then two
    broadcast-light joins to re-attach full signatures for the verify.
    Returns (id_a, id_b, hamming) with hamming <= max_hamming.
    """
    if max_hamming >= bands:
        raise ValueError(
            f"pigeonhole requires max_hamming < bands; got "
            f"max_hamming={max_hamming}, bands={bands}"
        )
    if bits % bands != 0:
        raise ValueError(
            f"bits must divide evenly into bands (banding would silently "
            f"drop the high {bits % bands} bit positions); got "
            f"bits={bits}, bands={bands}"
        )
    width = bits // bands
    sig = simhash(docs, id_col, text_col, bits).localCheckpoint(eager=True)
    per = None
    for b in range(bands):
        part = sig.select(
            "id",
            F.substring("simhash", b * width + 1, width).alias("h"),
            F.lit(b).alias("band"),
        )
        per = part if per is None else per.unionByName(part)
    a = per.select(F.col("id").alias("id_a"), "h", "band")
    bdf = per.select(F.col("id").alias("id_b"), "h", "band")
    cand = (
        a.join(bdf, ["h", "band"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sig.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"))
    sb = sig.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"))
    hamming = F.expr(
        f"size(filter(sequence(1, {bits}), "
        "i -> substring(sh_a, i, 1) <> substring(sh_b, i, 1)))"
    ).cast("bigint")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    max_pos: int = 1_048_576,
) -> DataFrame:
    """Global paragraph-level exact dedup WITH document reconstruction — the
    corpus-rewrite step (C4-style line dedup / Dolma paragraph dedup; the
    reference's content-hash skip, ``graph_generator.py:341-358``, works at
    whole-document grain — this is its sub-document generalization): every
    ``sep``-separated unit keeps only its globally-first occurrence ordered
    by (doc id, position); later occurrences are removed and each document's
    text is reassembled from its surviving units in original order. Empty
    units are dropped.

    Returns (doc_id, clean_text, n_paras, n_kept) — one row per input doc
    (docs whose every unit was deduplicated away keep an empty clean_text).

    Scale shape (100 TB): winner selection is a partial-aggregable
    ``min(rank)`` groupBy on the 16-hex md5 prefix of the unit — the shuffle
    carries 16 hex chars + one bigint, never the text, and a boilerplate
    paragraph present in millions of docs is ONE group row after map-side
    combine (deliberately NOT a row_number window, whose hot-key partition
    would serialize on one task). Survivors come back via a hash equi-join
    on the same key; reassembly is one groupBy(doc id) whose state is
    bounded by the document itself. rank = doc_id * max_pos + pos packs the
    total order into one bigint (portable to the SQL oracle); guarded
    against positional overflow.
    """
    if max_pos <= 0:
        raise ValueError(f"max_pos must be positive, got {max_pos}")
    did = F.col(id_col).cast("bigint")
    units = F.split(F.col(text_col), sep)
    # positional overflow would silently corrupt the total order: fail loud
    # in-plan (a codegen'd branch, no measurable cost) instead of wrapping.
    rank = F.when(
        F.col("pos") < max_pos, F.col("doc_id") * max_pos + F.col("pos")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "paragraph_dedup: position %%s >= max_pos=%d" % max_pos, F.col("pos")
            )
        ).cast("bigint")
    )
    occ = (
        docs.select(
            did.alias("doc_id"),
            F.posexplode_outer(units).alias("pos", "para"),
        )
        .where(F.col("para").isNotNull() & (F.col("para") != ""))
        .select(
            "doc_id",
            "pos",
            "para",
            F.substring(F.md5("para"), 1, 16).alias("key"),
            rank.alias("rank"),
        )
    )
    win = occ.groupBy("key").agg(F.min("rank").alias("w_rank"))
    flagged = occ.join(win, "key").withColumn(
        "keep", F.col("rank") == F.col("w_rank")
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_paras"),
        F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("pos", "para"))
                    )
                ),
                lambda x: x["para"],
            ),
        ).alias("clean_text"),
    )
    return (
        docs.select(did.alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_paras", F.lit(0)).cast("bigint").alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        )
    )
