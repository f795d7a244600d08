"""Similarity search over embedding columns (array<float>).

- ``topk_bruteforce``: exact cosine top-k — the correctness baseline. The
  dot product is a *fixed-order left fold* (``F.aggregate`` over
  ``zip_with``) in double precision: bit-identical across engines and across
  shuffle orders (a shuffled explode-sum would not be).
- ``topk_bucketed``: the scale path — multi-table random-hyperplane LSH
  (SimHash for angles): ``n_tables`` independent tables of ``n_bits``
  md5-seeded hyperplanes each; a vector's bucket in table t is the sign
  pattern of its dot products with that table's planes. Candidates = union
  over tables of same-bucket vectors, then exact cosine verifies. Recall of
  a neighbor at angle θ is 1-(1-(1-θ/π)^bits)^tables — ≥0.9 for genuinely
  near vectors at the defaults; ``ann_recall`` measures it on real data.
  At 100 TB the (table, bucket) pair is the shuffle/partition key so each
  query touches n_tables partitions instead of the whole corpus.

Ties are broken deterministically by (score desc, candidate id asc).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from text_to_graph_spark.functions.portable import round_half_up


def dot_expr(a: str, b: str):
    """Fixed-order fold: 0.0 + a1*b1 + a2*b2 + ... (index order)."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(v: str):
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(v), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def with_norm(emb: DataFrame, id_col: str, vec_col: str, suffix: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias(f"id_{suffix}"),
        F.col(vec_col).alias(f"vec_{suffix}"),
        norm_expr(vec_col).alias(f"norm_{suffix}"),
    )


def cosine_expr(vec_a: str, vec_b: str, norm_a: str, norm_b: str):
    return dot_expr(vec_a, vec_b) / (F.col(norm_a) * F.col(norm_b))


def topk_bruteforce(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For each query row, the k nearest other vectors by cosine.

    ``queries`` is a (usually small) subset with the same schema — it is
    broadcast; candidates stream. Output (query_id, neighbor_id, rank, cos).
    """
    q = with_norm(queries, id_col, vec_col, "q")
    c = with_norm(emb, id_col, vec_col, "c")
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("id_q") != F.col("id_c"))
        .withColumn("cos", cosine_expr("vec_q", "vec_c", "norm_q", "norm_c"))
    )
    w = Window.partitionBy("id_q").orderBy(F.desc("cos"), F.asc("id_c"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("id_q").alias("query_id"),
            F.col("id_c").alias("neighbor_id"),
            "rank",
            round_half_up(F.col("cos"), 6).alias("cos"),
        )
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (argmin squared-L2, ties
    to the smallest centroid id) — the IVF coarse quantizer.

    Centroids are model parameters (K rows): they are collected to the
    driver and inlined as literals, so assignment is a PURE PROJECTION over
    the vector table — zero shuffle, zero join. (A broadcast-join + window
    formulation would shuffle K x N rows for the argmin; at corpus scale
    that shuffle IS the cost.) argmin = ``array_min`` over (d2, cid)
    structs — struct ordering gives the deterministic tiebreak.
    Output: (id, vec, norm, cluster).
    """
    cents = [
        (r[0], list(r[1]))
        for r in centroids.select(id_col, vec_col).collect()
    ]
    if not cents:
        raise ValueError("ivf_assign: empty centroid set")

    def _d2(cvec: list[float]):
        # reference the INPUT column, not the "vec" output alias — lateral
        # column aliasing would resolve it, but only on engines/configs that
        # enable implicit LCA resolution
        lit_vec = F.array(*[F.lit(float(x)) for x in cvec])
        return F.aggregate(
            F.zip_with(
                F.col(vec_col),
                lit_vec,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    best = F.array_min(
        F.array(
            *[
                F.struct(_d2(cvec).alias("d2"), F.lit(cid).alias("cid"))
                for cid, cvec in cents
            ]
        )
    )
    return emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        norm_expr(vec_col).alias("norm"),
        best["cid"].alias("cluster"),
    )


def topk_ivf(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k, nprobe=1: centroid seeds are the vectors
    with ``id < n_centroids`` (a deterministic seeding — note 1-based id
    tables therefore get n_centroids-1 seeds; production would
    k-means-train them), candidates are restricted to the query's cluster. The cluster id becomes the join key, so each query probes one
    partition of the inverted file instead of the whole corpus.
    """
    centroids = emb.where(F.col(id_col) < n_centroids)
    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    q = ivf_assign(queries, centroids, id_col, vec_col).select(
        F.col("id").alias("id_q"),
        F.col("vec").alias("vec_q"),
        F.col("norm").alias("norm_q"),
        "cluster",
    )
    c = assigned.select(
        F.col("id").alias("id_c"),
        F.col("vec").alias("vec_c"),
        F.col("norm").alias("norm_c"),
        "cluster",
    )
    scored = (
        c.join(F.broadcast(q), "cluster")
        .where(F.col("id_q") != F.col("id_c"))
        .withColumn("cos", cosine_expr("vec_q", "vec_c", "norm_q", "norm_c"))
    )
    w = Window.partitionBy("id_q").orderBy(F.desc("cos"), F.asc("id_c"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("id_q").alias("query_id"),
            F.col("id_c").alias("neighbor_id"),
            "rank",
            round_half_up(F.col("cos"), 6).alias("cos"),
        )
    )


HYPERPLANE_SEED = "t2g-hyperplane"


def hyperplanes(
    dim: int, n_bits: int = 8, n_tables: int = 8, seed: str = HYPERPLANE_SEED
) -> list[list[list[float]]]:
    """Deterministic pseudo-random hyperplane family, md5-seeded — the model
    parameter of the LSH index (like k-means centroids, it lives on the
    driver and is inlined as plan literals; never a data-side rand()).

    Component d of plane h in table t = md5("{seed}#{t}#{h}#{d}")'s first
    8 hex digits as an integer, mapped to [-1, 1) by x/2^31 - 1. Every
    value is an exact dyadic rational, so any engine that parses the
    literal (or recomputes the md5) lands on the bit-identical double —
    the oracle recomputes the same family inside DuckDB.
    """
    out = []
    for t in range(n_tables):
        tbl = []
        for h in range(n_bits):
            row = []
            for d in range(dim):
                x = int(
                    hashlib.md5(f"{seed}#{t}#{h}#{d}".encode()).hexdigest()[:8], 16
                )
                row.append(x / 2147483648.0 - 1.0)
            tbl.append(row)
        out.append(tbl)
    return out


def hyperplane_codes_expr(vec_col: str, planes: list[list[list[float]]]):
    """array<int> of per-table bucket ids, as ONE nested higher-order
    expression: the whole plane family is a single nested-array literal and
    the tables/bits/dims are folded with transform/zip_with/aggregate —
    constant expression-tree size regardless of (tables x bits x dim).

    (The obvious alternative — one fold expression per bit with a
    per-plane ``F.array(*[F.lit(v), ...])`` literal — creates
    tables x bits x dim Column objects, and EACH ``F.lit`` is a py4j
    round-trip: at 8x8x64 that's ~4k driver<->JVM calls, measured ~24 s of
    DataFrame BUILD time before any execution. The literal matrix is
    therefore rendered as one SQL string and parsed JVM-side in a single
    ``F.expr`` call; Python float repr round-trips exactly, so the doubles
    are bit-identical to the md5-derived family.)

    bit h of table t = sign of the fixed-order left-fold dot product with
    plane h; bucket = sum of (1 << h) over positive bits. Pure projection —
    fuses into the scan stage, zero shuffle.
    """
    n_bits = len(planes[0])
    weights = F.expr(
        "array(" + ", ".join(str(1 << h) for h in range(n_bits)) + ")"
    )
    def dlit(v: float) -> str:
        r = repr(v)
        # exponent reprs (possible for other seeds/families) go through a
        # string cast — same exact double, parser-proof
        return f"CAST('{r}' AS DOUBLE)" if "e" in r or "E" in r else f"{r}D"

    planes_lit = F.expr(  # array<array<array<double>>>: tbl x bit x dim
        "array("
        + ", ".join(
            "array("
            + ", ".join(
                "array(" + ", ".join(dlit(v) for v in plane) + ")"
                for plane in tbl
            )
            + ")"
            for tbl in planes
        )
        + ")"
    )

    def dot(p):
        return F.aggregate(
            F.zip_with(F.col(vec_col), p, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return F.transform(
        planes_lit,
        lambda tbl: F.aggregate(
            F.zip_with(
                tbl,
                weights,
                lambda p, w: F.when(dot(p) > 0, w).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("int"),
    )


def hyperplane_bucket_expr(vec_col: str, table_planes: list[list[float]]):
    """Bucket id for ONE table (see :func:`hyperplane_codes_expr`)."""
    return F.element_at(hyperplane_codes_expr(vec_col, [table_planes]), 1)


def hyperplane_codes(
    df: DataFrame,
    planes: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    out_id: str,
) -> DataFrame:
    """(out_id, tbl, bucket) — one row per (vector, table). All table
    buckets are computed in ONE projection (an array + posexplode), so the
    corpus is scanned once regardless of n_tables."""
    return df.select(
        F.col(id_col).alias(out_id),
        F.posexplode(hyperplane_codes_expr(vec_col, planes)).alias(
            "tbl", "bucket"
        ),
    )


MICRO = 1_000_000


def micro_vec_expr(vec_col: str):
    """Quantize a float vector to integer micro-units (1e-6), rounding half
    toward +inf: ``floor(x*1e6 + 0.5)``. Pure integer vectors make every
    downstream distance/mean EXACT and order-independent — the float-sum
    nondeterminism that shuffle order would otherwise inject into centroid
    updates (and thus assignments) disappears entirely, on any engine."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * MICRO + F.lit(0.5)).cast("bigint"),
    )


def _micro_d2(mic_col: str, cvec: list[int]):
    """Exact squared L2 distance (micro^2 units) to an inlined centroid:
    integer fold in index order. 64 dims x (2e6)^2 per term stays far below
    int64 range."""
    lit_vec = F.array(*[F.lit(int(x)) for x in cvec])
    return F.aggregate(
        F.zip_with(F.col(mic_col), lit_vec, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _assign_micro(mic: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Nearest-centroid assignment as a PURE PROJECTION (centroids inlined as
    literals, same zero-shuffle design as :func:`ivf_assign`); ties go to the
    smallest centroid id via struct ordering.

    The K x D centroid matrix is inlined as ONE parsed SQL literal rather
    than K nested Column trees: building/analyzing the per-centroid
    expression forest dominated wall time once K x D reached 16 x 64
    (~3x the whole query, the same plan-build pathology measured for the
    hyperplane matrix — see hyperplane_bucket_expr), while a single
    array-of-arrays literal parses in milliseconds and evaluates
    identically (exact integer d2 fold, (d2, cid) lexicographic argmin)."""
    arr = "array(" + ",".join(
        "array(" + ",".join(str(int(x)) + "L" for x in cvec) + ")"
        for _, cvec in cents
    ) + ")"
    cids = "array(" + ",".join(str(int(cid)) for cid, _ in cents) + ")"
    best = F.expr(
        f"""array_min(zip_with(
          transform({arr}, c -> aggregate(
            zip_with(mic, c, (x, y) -> (x - y) * (x - y)),
            CAST(0 AS bigint), (acc, x) -> acc + x)),
          {cids},
          (d, i) -> struct(d AS d2, i AS cid))).cid"""
    )
    return mic.withColumn("cluster", best)


def _div_half_away(s: int, n: int) -> int:
    """round-half-away-from-zero of s/n with exact integers (n > 0)."""
    q = (2 * abs(s) + n) // (2 * n)
    return -q if s < 0 else q


def _kmeans_fit(
    mic: DataFrame, k: int, n_iter: int
) -> list[tuple[int, list[int]]]:
    """Lloyd's fit loop over a (id, mic) integer micro-unit frame; returns
    the final centroid list ``[(cid, [micro ints])]``. Seeding is the k
    smallest ids in id order; per round, one partial-agg'd groupBy shuffle
    carrying K x (D+1) longs per upstream partition. Shared by
    :func:`kmeans_train` (the relational model table) and :func:`semdedup`
    (cluster-blocked semantic dedup)."""
    seeds = (
        mic.orderBy("id").limit(k).collect()
    )  # K x D ints — model init, driver-side by design
    if not seeds:
        raise ValueError("kmeans_fit: empty input")
    dims = len(seeds[0]["mic"])
    cents: list[tuple[int, list[int]]] = [
        (i, list(r["mic"])) for i, r in enumerate(seeds)
    ]

    sum_cols = [
        F.sum(F.element_at("mic", d + 1)).alias(f"s{d}") for d in range(dims)
    ]
    for _ in range(n_iter):
        stats = (
            _assign_micro(mic, cents)
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"), *sum_cols)
            .collect()
        )
        by_cid = {r["cluster"]: r for r in stats}
        cents = [
            (
                cid,
                [
                    _div_half_away(by_cid[cid][f"s{d}"], by_cid[cid]["n"])
                    for d in range(dims)
                ]
                if cid in by_cid
                else prev,  # empty cluster: carry the previous centroid
            )
            for cid, prev in cents
        ]
    return cents


def kmeans_train(
    emb: DataFrame,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic distributed Lloyd's k-means — the trainer for the IVF
    coarse quantizer (:func:`topk_ivf` seeds ad hoc and notes "production
    would k-means-train them"; this is that trainer).

    Design for 100 TB:

    - Centroids are model parameters (K x D values) — they live on the
      driver and are inlined as literals, so each assignment pass is a
      zero-shuffle projection over the corpus (no K x N join).
    - The update pass is one ``groupBy(cluster)`` with D per-dimension
      ``sum`` columns + a count: partial aggregation map-side, the shuffle
      carries only K x (D+1) longs per upstream partition.
    - All arithmetic is integer micro-units (:func:`micro_vec_expr`):
      distances and sums are exact and associative, so results are
      bit-identical across engines, shuffle orders, retries, and cluster
      sizes — a float implementation would let partial-sum order flip
      assignments near ties. Means round half-away-from-zero back to micro.
    - Empty clusters keep their previous centroid (deterministic carryover).

    Seeding: the k rows with the smallest ids, centroid ids 0..k-1 in that
    order. Returns the relational model table
    ``(cluster, n_members, dim, centroid)`` — dim is 1-based, centroid in
    original float units (micro/1e6, exact in double), n_members from the
    final assignment pass.
    """
    spark = emb.sparkSession
    mic = emb.select(
        F.col(id_col).alias("id"), micro_vec_expr(vec_col).alias("mic")
    )
    cents = _kmeans_fit(mic, k, n_iter)
    dims = len(cents[0][1])

    sizes = {
        r["cluster"]: r["n"]
        for r in _assign_micro(mic, cents)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rows = [
        (cid, int(sizes.get(cid, 0)), d + 1, cvec[d] / MICRO)
        for cid, cvec in cents
        for d in range(dims)
    ]
    return spark.createDataFrame(
        rows, "cluster int, n_members bigint, dim int, centroid double"
    )


def semdedup(
    emb: DataFrame,
    threshold: float = 0.3,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication of an embedding corpus — k-means coarse clustering, then
    pairwise cosine WITHIN each cluster only, dropping every vector that
    has a smaller-id cluster-mate at cosine >= threshold. The paper's
    point: clustering first turns the O(N²) all-pairs problem into
    sum-over-cells O(|cell|²), and semantic (not lexical) duplicates are
    exactly what MinHash misses.

    Scale shape: the fit is :func:`_kmeans_fit` (per-round K x (D+1)-long
    shuffles); assignment is a zero-shuffle inlined-literal projection; the
    within-cell pass is an equi-join on the cluster id — never a cartesian
    product — so cell size, controlled by k, bounds the quadratic term
    (production runs use k in the tens of thousands for 10^9 vectors, ~1e5
    rows per cell). AQE skew-join splits any hot cell. Keep rule: the
    drop decision needs only (exists smaller-id neighbor >= threshold), a
    left_semi against the pair list — deterministic, no transitive-closure
    fixpoint, matching the paper's keep-one-per-epsilon-ball intent with
    id order as the tiebreak.

    Cosine is the house fixed-order double fold rounded half-up to 6
    (:func:`cosine_expr`), bit-identical across engines. Returns one row
    per input vector: (vec_id, cluster, kept) with kept in {0, 1}.
    """
    mic = emb.select(
        F.col(id_col).alias("id"), micro_vec_expr(vec_col).alias("mic")
    )
    cents = _kmeans_fit(mic, k, n_iter)
    assigned = _assign_micro(mic, cents).select("id", "cluster")

    a = with_norm(emb, id_col, vec_col, "a").join(
        assigned.select(
            F.col("id").alias("id_a"), F.col("cluster").alias("cl")
        ),
        "id_a",
    )
    b = with_norm(emb, id_col, vec_col, "b").join(
        assigned.select(
            F.col("id").alias("id_b"), F.col("cluster").alias("cl")
        ),
        "id_b",
    )
    dropped = (
        a.join(b, "cl")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            round_half_up(
                cosine_expr("vec_a", "vec_b", "norm_a", "norm_b"), 6
            )
            >= F.lit(threshold)
        )
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("is_dup", F.lit(1)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            F.when(F.col("is_dup").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("kept"),
        )
    )


def knn_classify(
    emb: DataFrame,
    k: int = 5,
    n_centroids: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Leave-one-out k-NN classification over a labeled embedding corpus —
    the standard embedding-quality / label-noise probe for curation
    pipelines (a vector whose neighbors vote a different label is a
    mislabeled or out-of-place example; aggregate accuracy measures how
    separable the label space is in this embedding).

    IVF-blocked like :func:`semdedup`: k-means cells from
    :func:`_kmeans_fit`, zero-shuffle literal assignment, and candidate
    generation is the cluster equi-join — each vector is scored only
    against its own cell (nprobe=1), never the corpus. Ranking is the raw
    fixed-order cosine fold with (cos DESC, id ASC) total order; the vote
    is (count DESC, label ASC) — every tie-break explicit, so the
    prediction is bit-stable across engines and partitionings.

    Output: one row per vector —
    (vec_id, label, pred_label, correct) with pred_label = -1 and
    correct = 0 for vectors alone in their cell (no electorate).
    """
    mic = emb.select(
        F.col(id_col).alias("id"), micro_vec_expr(vec_col).alias("mic")
    )
    cents = _kmeans_fit(mic, n_centroids, n_iter)
    assigned = _assign_micro(mic, cents).select("id", "cluster")

    sides = {}
    for s in ("a", "b"):
        base = emb.select(
            F.col(id_col).alias(f"id_{s}"),
            F.col(vec_col).alias(f"vec_{s}"),
            norm_expr(vec_col).alias(f"norm_{s}"),
            *([F.col(label_col).alias("nlabel")] if s == "b" else []),
        )
        sides[s] = base.join(
            assigned.select(
                F.col("id").alias(f"id_{s}"), F.col("cluster").alias("cl")
            ),
            f"id_{s}",
        )
    w = Window.partitionBy("id_a").orderBy(F.desc("cos"), F.asc("id_b"))
    topk = (
        sides["a"]
        .join(sides["b"], "cl")
        .where(F.col("id_a") != F.col("id_b"))
        .withColumn("cos", cosine_expr("vec_a", "vec_b", "norm_a", "norm_b"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
    pred = (
        topk.groupBy("id_a", "nlabel")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("id_a")
        .agg(
            F.min(F.struct((-F.col("n")).alias("neg_n"), F.col("nlabel")))[
                "nlabel"
            ].alias("pred_label")
        )
    )
    return (
        emb.select(
            F.col(id_col).alias("vec_id"), F.col(label_col).alias("label")
        )
        .join(pred.withColumnRenamed("id_a", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            "label",
            F.coalesce("pred_label", F.lit(-1)).cast("int").alias("pred_label"),
            F.when(F.col("pred_label") == F.col("label"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("correct"),
        )
    )


def semdedup_probe(
    old_emb: DataFrame,
    new_emb: DataFrame,
    threshold: float = 0.3,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental :func:`semdedup`: admit a NEW embedding batch against an
    already-ingested corpus — the daily-crawl shape (the MinHash twin is
    ``dedup.incremental_neardup_probe``). Cells are trained on the OLD
    corpus only (the index the corpus was ingested under; re-clustering
    per batch would churn every cell assignment), both sides assign via
    the zero-shuffle literal projection, and a new vector is rejected iff
    ANY old cluster-mate scores >= threshold — the corpus always wins, so
    admission never depends on id order or batch composition.

    New-vs-new duplicates are NOT judged here (run :func:`semdedup` on the
    admitted batch for that) — matching the probe contract of the MinHash
    twin. Output: one row per NEW vector: (vec_id, cluster, kept).
    """
    mic_old = old_emb.select(
        F.col(id_col).alias("id"), micro_vec_expr(vec_col).alias("mic")
    )
    cents = _kmeans_fit(mic_old, k, n_iter)

    def _side(df: DataFrame, s: str) -> DataFrame:
        m = df.select(
            F.col(id_col).alias(f"id_{s}"),
            F.col(vec_col).alias(f"vec_{s}"),
            norm_expr(vec_col).alias(f"norm_{s}"),
            micro_vec_expr(vec_col).alias("mic"),
        )
        return _assign_micro(m, cents).select(
            f"id_{s}", f"vec_{s}", f"norm_{s}", F.col("cluster").alias("cl")
        )

    new_side = _side(new_emb, "a")
    old_side = _side(old_emb, "b")
    rejected = (
        new_side.join(old_side, "cl")
        .where(
            round_half_up(
                cosine_expr("vec_a", "vec_b", "norm_a", "norm_b"), 6
            )
            >= F.lit(threshold)
        )
        .select(F.col("id_a").alias("id"))
        .distinct()
    )
    return (
        new_side.select(F.col("id_a").alias("id"), F.col("cl").alias("cluster"))
        .join(rejected.withColumn("is_dup", F.lit(1)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            F.when(F.col("is_dup").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("kept"),
        )
    )


def topk_ivf_trained(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat top-k with a k-means-TRAINED coarse quantizer (nprobe=1) —
    the trainer (:func:`kmeans_train`) and the index composed end to end.

    Assignment reuses the trainer's exact integer micro-unit distances
    (:func:`_assign_micro`, zero-shuffle inlined-literal projection), so the
    query-time partitioning is bit-identical to the one training produced;
    scoring is the portable fixed-order cosine fold within the query's
    cluster only. The cluster id is the only join key — each query touches
    one inverted-file partition, the property that makes IVF the 100 TB
    read path.
    """
    model = kmeans_train(emb, k=n_centroids, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
    cents_rows = model.collect()  # K x D model params — driver-side by design
    by_cid: dict[int, dict[int, float]] = {}
    for r in cents_rows:
        by_cid.setdefault(r["cluster"], {})[r["dim"]] = r["centroid"]
    cents = [
        (cid, [int(round(dims[d] * MICRO)) for d in sorted(dims)])
        for cid, dims in sorted(by_cid.items())
    ]

    def _mic(df: DataFrame, suffix: str) -> DataFrame:
        m = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            norm_expr(vec_col).alias("norm"),
            micro_vec_expr(vec_col).alias("mic"),
        )
        return _assign_micro(m, cents).select(
            F.col("id").alias(f"id_{suffix}"),
            F.col("vec").alias(f"vec_{suffix}"),
            F.col("norm").alias(f"norm_{suffix}"),
            "cluster",
        )

    scored = (
        _mic(emb, "c")
        .join(F.broadcast(_mic(queries, "q")), "cluster")
        .where(F.col("id_q") != F.col("id_c"))
        .withColumn("cos", cosine_expr("vec_q", "vec_c", "norm_q", "norm_c"))
    )
    w = Window.partitionBy("id_q").orderBy(F.desc("cos"), F.asc("id_c"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("id_q").alias("query_id"),
            F.col("id_c").alias("neighbor_id"),
            "rank",
            round_half_up(F.col("cos"), 6).alias("cos"),
        )
    )


def topk_bucketed(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    n_tables: int = 8,
    probe_hamming: int = 0,
    seed: str = HYPERPLANE_SEED,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH (SimHash for
    angles): a candidate is any corpus vector sharing the query's bucket in
    at least one of ``n_tables`` independent tables; exact cosine then ranks
    the candidates.

    Scale shape (the whole point):

    - The corpus is scanned ONCE. The exploded (tbl, bucket) code rows carry
      the vector along, but that expansion is pipeline-local — it feeds a
      broadcast hash join against the (tiny) query code table, so no corpus
      row ever shuffles at fan-out width.
    - The only shuffles are the candidate-pair dedup (distinct over the
      *matched* pairs — the small set) and the final per-query top-k window.
    - ``probe_hamming=1`` turns on multiprobe: each query also probes the
      ``n_bits`` buckets at Hamming distance 1 in every table — the standard
      recall knob that buys ~(1+bits)x candidates without more tables (i.e.
      without re-coding the corpus). Query-side only; corpus codes are
      unchanged.

    Recall of a neighbor at angle θ is 1-(1-(1-θ/π)^n_bits)^n_tables —
    near-duplicates (θ→0) are found with probability ~1 at the defaults,
    while uncorrelated vectors (θ≈π/2) collide in ~(1/2^n_bits) of buckets.
    ``ann_recall`` MEASURES recall on real data; tests additionally plant
    near-duplicate queries and assert ≥0.9 planted recall.
    """
    first = emb.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("topk_bucketed: empty input")
    planes = hyperplanes(first["d"], n_bits, n_tables, seed)

    c = with_norm(emb, id_col, vec_col, "c")
    c_codes = c.select(
        "id_c",
        "vec_c",
        "norm_c",
        F.posexplode(hyperplane_codes_expr("vec_c", planes)).alias(
            "tbl", "bucket"
        ),
    )
    q_codes = queries.select(
        F.col(id_col).alias("id_q"),
        F.posexplode(hyperplane_codes_expr(vec_col, planes)).alias(
            "tbl", "bucket"
        ),
    )
    if probe_hamming:
        flips = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << b)) for b in range(n_bits)],
        )
        q_codes = q_codes.select("id_q", "tbl", F.explode(flips).alias("bucket"))

    cand = (
        c_codes.join(F.broadcast(q_codes), ["tbl", "bucket"])
        .where(F.col("id_q") != F.col("id_c"))
        .select("id_q", "id_c", "vec_c", "norm_c")
        .dropDuplicates(["id_q", "id_c"])  # same pair from several tables
    )
    q = with_norm(queries, id_col, vec_col, "q")
    scored = cand.join(F.broadcast(q), "id_q").withColumn(
        "cos", cosine_expr("vec_q", "vec_c", "norm_q", "norm_c")
    )
    w = Window.partitionBy("id_q").orderBy(F.desc("cos"), F.asc("id_c"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("id_q").alias("query_id"),
            F.col("id_c").alias("neighbor_id"),
            "rank",
            round_half_up(F.col("cos"), 6).alias("cos"),
        )
    )


def ann_recall(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Measured recall@k of the sign-bucket LSH path vs exact brute force.

    (query_id, n_hits, recall_ppm) per query — "measure, don't guess" made
    a first-class table: the approximate index's quality is computed by the
    engine itself (left join of the exact top-k against the bucketed top-k,
    count of survivors, exact integer ppm). Run it on a fixture-scale sample
    whenever ``n_bits``/``n_tables``/``k`` change; at production scale the exact side
    is only ever computed over such a sample (brute force is the O(n·q)
    baseline), so the recall job stays cheap while the index serves the
    full corpus.
    """
    brute = topk_bruteforce(emb, queries, k, id_col, vec_col).select(
        "query_id", "neighbor_id"
    )
    approx = topk_bucketed(emb, queries, k, id_col, vec_col).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    j = brute.join(approx, ["query_id", "neighbor_id"], "left")
    return j.groupBy("query_id").agg(
        F.count("hit").alias("n_hits"),
        F.floor(F.count("hit") * 1000000 / F.lit(k))
        .cast("bigint")
        .alias("recall_ppm"),
    )


def quantized_vectors(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Int8 scalar quantization of an embedding column — the 4x memory /
    bandwidth reduction that makes billion-vector search fit executor RAM.

    Per-dimension affine quantization to 0..255 over the corpus min/max:
    ``q_i = (x_i - mn_i) * 255 // span_i`` — computed entirely in integer
    micro-units (:func:`micro_vec_expr`), so codes are bit-identical across
    engines, shuffle orders, and cluster sizes (a float scale factor would
    not be). ``span_i = max(mx_i - mn_i, 1)`` guards constant dimensions.

    Scale shape: the min/max pass is ONE aggregation producing a single
    2 x D row (partial-agg map-side, the shuffle carries 2 x D longs per
    upstream partition — the kmeans-update shape); the params are model
    state, inlined as literals, so the quantization pass is a pure
    zero-shuffle projection over the corpus (the ivf_assign design).
    Returns (``id_col``, qv: array<bigint> of 0..255 codes).
    """
    mic = emb.select(F.col(id_col), micro_vec_expr(vec_col).alias("mic"))
    first = mic.select(F.size("mic").alias("d")).first()
    if first is None:
        raise ValueError("quantized_vectors: empty input")
    d = first["d"]
    row = mic.agg(
        *[F.min(F.element_at("mic", i + 1)).alias(f"mn{i}") for i in range(d)],
        *[F.max(F.element_at("mic", i + 1)).alias(f"mx{i}") for i in range(d)],
    ).first()
    mn = [int(row[f"mn{i}"]) for i in range(d)]
    span = [max(int(row[f"mx{i}"]) - mn[i], 1) for i in range(d)]
    mn_arr = F.array(*[F.lit(v).cast("bigint") for v in mn])
    span_arr = F.array(*[F.lit(v).cast("bigint") for v in span])
    # exact integer division inside the lambda: (n*255 - (n*255) % den) is
    # an exact multiple of den, so the double division is exact too
    shifted = F.zip_with(F.col("mic"), mn_arr, lambda x, m: x - m)
    codes = F.zip_with(
        shifted,
        span_arr,
        lambda num, den: (
            (num * 255 - (num * 255) % den) / den
        ).cast("bigint"),
    )
    return mic.select(id_col, codes.alias("qv"))


def topk_quantized(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by quantized dot product over int8 codes — the compressed
    twin of :func:`topk_bruteforce`.

    Scores are exact bigint sums of 0..255 code products (max 255^2 * D per
    pair — no overflow to D ~ 1.4e14), so ranking is deterministic with the
    (score desc, id asc) tiebreak and the oracle twin reproduces it
    exactly. Queries quantize under the same corpus params and broadcast;
    candidates stream. Output (query_id, neighbor_id, rank, qdot).
    """
    qv = quantized_vectors(emb, id_col, vec_col)
    q = qv.join(
        queries.select(F.col(id_col)), id_col
    ).select(F.col(id_col).alias("id_q"), F.col("qv").alias("qv_q"))
    c = qv.select(F.col(id_col).alias("id_c"), F.col("qv").alias("qv_c"))
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("id_q") != F.col("id_c"))
        .withColumn(
            "qdot",
            F.aggregate(
                F.zip_with(F.col("qv_q"), F.col("qv_c"), lambda x, y: x * y),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ),
        )
    )
    w = Window.partitionBy("id_q").orderBy(F.desc("qdot"), F.asc("id_c"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("id_q").alias("query_id"),
            F.col("id_c").alias("neighbor_id"),
            "rank",
            "qdot",
        )
    )


def pca_first_component(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 3,
) -> DataFrame:
    """First principal direction by deterministic power iteration, and the
    corpus projected onto it — the 1-D embedding feature (outlier score /
    coarse sort key / sharding dimension) without any eigen library.

    Distributed part: the D x D Gram matrix of the mean-free-ish micro-unit
    vectors — ONE aggregation with D*(D+1)/2 exact integer sums (map-side
    partial agg; the shuffle carries a few thousand longs per partition).
    The matrix is model state (driver-held, like k-means centroids); the
    power iteration runs on it in exact Python ints — v_{k+1} =
    (G//1e6) . v_k, renormalized to L-inf = 1e6 by integer division each
    round (start vector all-ones; the //1e6 pre-scale bounds every matvec
    term under 2^63). The final direction is inlined as literals, so the
    projection pass is a zero-shuffle pure projection (the ivf_assign /
    quantized_vectors design).

    Everything is integer arithmetic end to end — bit-identical across
    engines, partitionings, and reruns; the oracle twin replays the same
    Gram sums and the same unrolled iteration. Returns
    (``id_col``, pc1_e6) where pc1_e6 = dot(x_micro, v) // 1e6.
    """
    mic = emb.select(F.col(id_col), micro_vec_expr(vec_col).alias("mic"))
    first = mic.select(F.size("mic").alias("d")).first()
    if first is None:
        raise ValueError("pca_first_component: empty input")
    d = first["d"]
    gram_aggs = [
        F.sum(
            F.element_at("mic", i + 1) * F.element_at("mic", j + 1)
        ).alias(f"g_{i}_{j}")
        for i in range(d)
        for j in range(i, d)
    ]
    row = mic.agg(*gram_aggs).first()
    g = [[0] * d for _ in range(d)]
    for i in range(d):
        for j in range(i, d):
            v = int(row[f"g_{i}_{j}"])
            g[i][j] = v
            g[j][i] = v
    def tdiv(a: int, b: int) -> int:
        # truncate toward zero (b > 0) — the integer-division semantics
        # shared by Spark's DIV and DuckDB's // ; Python's // floors, which
        # diverges on negatives
        return a // b if a >= 0 else -((-a) // b)

    v = [MICRO] * d
    for _ in range(n_iter):
        nxt = [
            sum(tdiv(g[i][j], MICRO) * v[j] for j in range(d))
            for i in range(d)
        ]
        m = max(abs(x) for x in nxt) or 1
        v = [tdiv(x * MICRO, m) for x in nxt]
    v_arr = F.array(*[F.lit(int(x)).cast("bigint") for x in v])
    dot = F.aggregate(
        F.zip_with(F.col("mic"), v_arr, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    # Spark's bigint DIV truncates toward zero — exactly DuckDB's `//`
    return (
        mic.select(F.col(id_col), dot.alias("dotv"))
        .select(
            id_col,
            F.expr(f"dotv DIV {MICRO}").cast("bigint").alias("pc1_e6"),
        )
    )


def label_prototypes(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label prototype (mean) vectors in exact integer micro-units —
    the class centroids a labeled-embedding QA pass compares members
    against (and the supervised twin of the k-means update step).

    mean_e6 per dimension = sum(micro) DIV n — truncating integer division
    (Spark DIV ≡ DuckDB ``//`` on negatives), so prototypes are
    bit-identical across engines and partitionings. One aggregation with D
    per-dimension sums + count (partial agg; the shuffle carries
    |labels| x (D+1) longs per partition). Returns long-form
    (label, n_members, dim, mean_e6) — dim is 1-based.
    """
    mic = emb.select(F.col(label_col).alias("label"), micro_vec_expr(vec_col).alias("mic"))
    first = mic.select(F.size("mic").alias("d")).first()
    if first is None:
        raise ValueError("label_prototypes: empty input")
    d = first["d"]
    agg = mic.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_members"),
        *[F.sum(F.element_at("mic", i + 1)).alias(f"s{i}") for i in range(d)],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("dim"),
                F.expr(f"s{i} DIV n_members").cast("bigint").alias("mean_e6"),
            )
            for i in range(d)
        ]
    )
    return agg.select(
        "label",
        F.col("n_members").cast("bigint").alias("n_members"),
        F.explode(rows).alias("p"),
    ).select("label", "n_members", "p.dim", "p.mean_e6")


def prototype_outliers(
    emb: DataFrame,
    k: int = 5,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-``k`` farthest members from their own label's prototype — the
    mislabel/outlier QA report for a labeled embedding table.

    Prototypes are model state: computed by :func:`label_prototypes`,
    collected (|labels| x D ints), and inlined as literals keyed by a CASE
    on the label — the distance pass is a zero-shuffle projection (the
    ivf_assign design); only the per-label top-k window shuffles, keyed on
    the label. Distances are exact integer squared-L2 in micro^2 units.
    Returns (label, vec_id, rank, d2).
    """
    protos = label_prototypes(emb, label_col, vec_col).collect()
    by_label: dict = {}
    for r in protos:
        by_label.setdefault(r["label"], {})[r["dim"]] = r["mean_e6"]
    mic = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("label"),
        micro_vec_expr(vec_col).alias("mic"),
    )
    branches = None
    for lab, dims in sorted(by_label.items()):
        cvec = [int(dims[i + 1]) for i in range(len(dims))]
        expr = _micro_d2("mic", cvec)
        cond = F.col("label") == F.lit(lab)
        branches = (
            F.when(cond, expr) if branches is None else branches.when(cond, expr)
        )
    scored = mic.withColumn("d2", branches.cast("bigint"))
    w = Window.partitionBy("label").orderBy(F.desc("d2"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("label", "vec_id", "rank", "d2")
    )
