"""Dedup + similarity operators vs brute-force Python oracles on crafted
corpora (the sf0.01 driver tables are covered by tools/check_correctness.py;
these tests pin the *semantics* on inputs with known answers)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from text_to_graph_spark.operators.dedup import (
    exact_duplicates,
    embedding_neardup_pairs,
    minhash_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from tests.conftest import SF_SMOKE
from text_to_graph_spark.operators.similarity import (
    kmeans_train,
    topk_bruteforce,
    topk_bucketed,
)

DOCS = [
    (1, "g", "alpha beta gamma delta epsilon zeta"),
    (2, "g", "alpha beta gamma delta epsilon zeta"),          # exact dup of 1
    (3, "g", "alpha beta gamma delta epsilon eta"),           # near dup of 1
    (4, "g", "one two three four five six seven"),            # unrelated
    (5, "g", "tiny"),                                         # < n tokens
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, source string, text string")


def _shingle_set(text, n=3):
    w = text.split(" ")
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)} if len(w) >= n else set()


def test_exact_duplicates(docs):
    got = {r["fingerprint"]: (r["representative"], r["n_docs"])
           for r in exact_duplicates(docs).collect()}
    fp = hashlib.md5(DOCS[0][2].encode()).hexdigest()
    assert got[fp] == (1, 2)  # docs 1 and 2 collapse, min id representative
    assert len(got) == 4      # 5 docs, one exact pair


def test_minhash_signature_is_min_banded_md5(docs):
    from text_to_graph_spark.functions.portable import MINHASH_P, minhash_coeffs

    sig = {r["id"]: r for r in minhash_signatures(docs).collect()}
    sh1 = _shingle_set(DOCS[0][2])
    coeffs = minhash_coeffs(32)

    def band_key(shingles, b, rows=4):
        def perm(i, s):
            base = int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P
            a, c = coeffs[i]
            return (a * base + c) % MINHASH_P

        mins = [
            str(min(perm(b * rows + j, s) for s in shingles))
            for j in range(rows)
        ]
        return hashlib.md5("|".join(mins).encode()).hexdigest()

    for b in range(8):
        assert sig[1][f"bk{b}"] == band_key(sh1, b)
    # doc 5 has no shingles -> no signature row
    assert 5 not in sig
    # exact dups share every band key and the bucket
    assert sig[1]["bucket"] == sig[2]["bucket"]
    for b in range(8):
        assert sig[1][f"bk{b}"] == sig[2][f"bk{b}"]


def test_minhash_pairs_find_exact_and_near(docs):
    pairs = {(r["id_a"], r["id_b"]): r["n_bands_shared"]
             for r in minhash_candidate_pairs(docs).collect()}
    assert pairs[(1, 2)] == 8           # identical docs share all 8 bands
    # near-dup (1,3) pairs iff all 4 mins of some band survive the edit
    if (1, 3) in pairs:
        assert 1 <= pairs[(1, 3)] <= 8
    # unrelated docs share nothing
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_minhash_rxb_bounds_hot_bucket_vs_r1(spark):
    """Adversarial stopword-heavy corpus: every doc shares one common
    trigram ("the of and ..."-style boilerplate) but documents are
    otherwise unrelated. With r=1 single-hash bands, whenever the shared
    shingle's hash is the global band min the whole corpus lands in ONE
    bucket (C(N,2) candidate blowup); with r=4 concatenated mins a
    candidate needs all 4 band mins equal, which unrelated docs don't
    satisfy — candidate mass collapses to ~0.
    """
    from text_to_graph_spark.operators.dedup import band_load_stats

    # 13 shared stopword shingles + 40 unique tokens per doc: pairwise
    # jaccard 0.14 (unrelated), but all docs share the SAME 13-shingle set,
    # so any doc whose band min falls in the shared set lands in the one
    # global hot bucket for that band. Calibrated offline against md5:
    # r=1 -> mass 1261, max bucket 31/40 docs; r=4 -> mass 0, max bucket 1.
    n_docs = 40
    shared = "the of and is to in for on at by it as be or an"
    rows = [
        (i, "g", shared + " " + " ".join(f"u{i}x{k}" for k in range(40)))
        for i in range(n_docs)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    def stats(r):
        st = band_load_stats(docs, bands=8, rows=r).collect()
        return (sum(x.n_candidate_pairs for x in st),
                max(x.max_bucket_size for x in st))

    mass_r1, maxb_r1 = stats(1)
    mass_r4, maxb_r4 = stats(4)
    # r=1: hot buckets capture most of the corpus -> quadratic mass
    assert mass_r1 >= (n_docs * (n_docs - 1)) // 2 and maxb_r1 >= n_docs // 2
    # r=4: no unrelated pair agrees on 4 concatenated mins
    assert mass_r4 == 0 and maxb_r4 == 1
    # and the real pair join pays exactly the predicted mass
    pairs_r4 = minhash_candidate_pairs(docs, bands=8, rows=4).collect()
    assert sum(r.n_bands_shared for r in pairs_r4) == mass_r4


def test_band_load_mass_equals_pair_join_cost(docs):
    """The pre-flight's candidate-pair mass must equal what the band join
    actually pays: sum over buckets of C(size,2) == sum over emitted pairs
    of n_bands_shared (each shared band contributes one bucket co-residence).
    """
    from text_to_graph_spark.operators.dedup import band_load_stats

    stats = band_load_stats(docs).collect()
    mass = sum(r.n_candidate_pairs for r in stats)
    pairs = minhash_candidate_pairs(docs).collect()
    assert mass == sum(r.n_bands_shared for r in pairs)
    # singleton buckets contribute zero pairs and max size stays exact
    for r in stats:
        if r.size_bucket == 1:
            assert r.n_candidate_pairs == 0 and r.max_bucket_size == 1


def test_ngram_jaccard_exact_values(docs):
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, group_col="source", threshold=0.0).collect()}
    s1, s3 = _shingle_set(DOCS[0][2]), _shingle_set(DOCS[2][2])
    exp_13 = round(len(s1 & s3) / len(s1 | s3), 4)
    assert got[(1, 2)] == 1.0
    assert abs(got[(1, 3)] - exp_13) < 1e-9
    assert (1, 4) not in got  # zero intersection never emitted


def test_simhash_identical_docs_equal_bits(docs):
    got = {r["id"]: r["simhash"] for r in simhash(docs).collect()}
    assert got[1] == got[2]
    assert len(got[1]) == 32 and set(got[1]) <= {"0", "1"}
    # hamming(1,3) strictly less than hamming(1,4): near-dup closer than unrelated
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))
    assert ham(got[1], got[3]) < ham(got[1], got[4])


EMB = [
    (1, [1.0, 0.0, 0.0]),
    (2, [0.9, 0.1, 0.0]),
    (3, [0.0, 1.0, 0.0]),
    (4, [-1.0, 0.0, 0.0]),
    (5, [0.5, 0.5, 0.0]),
]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(EMB, "vec_id long, embedding array<float>")


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))


def test_topk_bruteforce_matches_python(emb):
    got = [
        (r["neighbor_id"], r["rank"])
        for r in topk_bruteforce(emb, emb.where("vec_id = 1"), k=3)
        .orderBy("rank")
        .collect()
    ]
    scores = sorted(
        ((_cos(EMB[0][1], v), -i) for i, v in EMB if i != 1), reverse=True
    )
    exp = [(-neg_i, rank + 1) for rank, (_, neg_i) in enumerate(scores[:3])]
    assert got == exp


def test_topk_bucketed_exact_scores_and_near_recall(emb):
    got = {
        r["neighbor_id"]: r["cos"]
        for r in topk_bucketed(emb, emb.where("vec_id = 1"), k=5).collect()
    }
    # near-identical neighbor (cos ~0.9939, angle ~6.3 deg) collides in at
    # least one of the 8 tables with overwhelming probability — and the
    # family is deterministic, so this is a fixed fact of the fixture
    assert 2 in got
    # every returned cosine is the exact brute-force fold value
    brute = {
        r["neighbor_id"]: r["cos"]
        for r in topk_bruteforce(emb, emb.where("vec_id = 1"), k=5).collect()
    }
    for nid, cos in got.items():
        assert brute[nid] == cos


def test_topk_bucketed_planted_recall_and_multiprobe(spark):
    """ANN honesty gate: recall >= 0.9 for PLANTED near-duplicate queries on
    the real 64-dim fixture (what hyperplane LSH actually promises — the
    fixture's organic 'neighbors' sit at ~65 deg where any sublinear index
    must lose recall), and Hamming-1 multiprobe never worsens the best hit."""
    from text_to_graph_spark.operators.similarity import topk_bucketed as tb

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    base = emb.where("vec_id < 20").collect()
    planted = [
        # deterministic perturbation: flip-scale each component slightly
        (10000 + r["vec_id"], [v * (1.02 if i % 2 else 0.98) + 0.003 * ((-1) ** i)
                               for i, v in enumerate(r["embedding"])])
        for r in base
    ]
    queries = spark.createDataFrame(planted, "vec_id long, embedding array<float>")
    got = tb(emb, queries, k=5).collect()
    top = {}
    for r in got:
        top.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        top.setdefault(("best", r["query_id"]), set())
    hits = sum(1 for q, _ in [(r["vec_id"], 0) for r in base]
               if (10000 + q) in top and q in top[10000 + q])
    assert hits >= 0.9 * len(base), f"planted recall {hits}/{len(base)}"

    best0 = {
        r["query_id"]: r["cos"] for r in got if r["rank"] == 1
    }
    got1 = tb(emb, queries, k=5, probe_hamming=1).collect()
    best1 = {r["query_id"]: r["cos"] for r in got1 if r["rank"] == 1}
    for q, c in best0.items():
        assert best1[q] >= c  # superset candidates => best never worse


def test_embedding_neardup_threshold(emb):
    got = {(r["id_a"], r["id_b"]) for r in embedding_neardup_pairs(emb, threshold=0.99).collect()}
    assert (1, 2) in got          # cos(1,2) ~ 0.9939
    assert all(p == (1, 2) for p in got)


def test_embedding_neardup_lsh_subset_with_exact_scores(spark):
    """Brute force is the recall oracle for the LSH contract path: LSH pairs
    must be a subset of brute-force pairs with identical cosine values, and
    every near-identical pair (same sign pattern by construction) must be
    recalled."""
    from text_to_graph_spark.operators.dedup import embedding_neardup_pairs_lsh

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    brute = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_neardup_pairs(emb, threshold=0.3).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_neardup_pairs_lsh(emb, threshold=0.3).collect()
    }
    assert set(lsh) <= set(brute)
    assert lsh, "LSH path found no pairs at fixture scale"
    for pair, cos in lsh.items():
        assert brute[pair] == cos  # exact verify: identical fold, bitwise
    # recall on the highest-similarity stratum: pairs this close collide in
    # at least one of the 8 hyperplane tables (miss prob ~1e-8, and the
    # md5-seeded family is deterministic so this is a fixed fixture fact)
    near_identical = {p for p, c in brute.items() if c >= 0.999}
    assert near_identical <= set(lsh) or not near_identical


def test_topk_ivf_nearest_within_cluster(emb):
    from text_to_graph_spark.operators.similarity import ivf_assign, topk_ivf

    # centroids = vecs 1 and 2 (ids are 1-based); argmin L2, cid tiebreak
    vec = dict(EMB)
    assigned = {
        r["id"]: r["cluster"]
        for r in ivf_assign(emb, emb.where("vec_id <= 2")).collect()
    }
    def l2sq(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))
    for i, v in EMB:
        dists = [(l2sq(v, vec[c]), c) for c in (1, 2)]
        assert assigned[i] == min(dists)[1]

    got = topk_ivf(emb, emb, k=2, n_centroids=3).collect()
    for r in got:
        # every neighbor shares the query's coarse cluster (nprobe=1)
        assert assigned[r["neighbor_id"]] == assigned[r["query_id"]]
        assert r["neighbor_id"] != r["query_id"]


def test_near_dup_clusters_exact_and_singletons(spark):
    from text_to_graph_spark.operators.dedup import near_dup_clusters

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),   # exact dup of 1
            (3, "completely different words here now"),
            (4, "another unrelated document text body"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["cluster"], r["is_representative"])
        for r in near_dup_clusters(docs).collect()
    }
    assert got[1] == (1, True)
    assert got[2] == (1, False)   # identical shingles -> same LSH cluster
    assert got[3] == (3, True)    # singleton clusters with itself
    assert got[4] == (4, True)


class TestKMeansTrain:
    def test_two_separated_groups_exact_means(self, spark):
        # group A around (1, 0), group B around (-1, 0); seeds = the two
        # smallest ids, one from each group -> Lloyd's converges in 1 round
        pts = [
            (0, [1.0, 0.1]),
            (1, [-1.0, -0.1]),
            (2, [1.2, -0.1]),
            (3, [-1.2, 0.1]),
            (4, [0.8, 0.0]),
            (5, [-0.8, 0.0]),
        ]
        emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
        got = kmeans_train(emb, k=2, n_iter=2)
        rows = {(r.cluster, r.dim): r for r in got.collect()}
        # exact integer-micro means: A = {1.0, 1.2, 0.8} -> 1.0 etc.
        assert rows[(0, 1)].centroid == 1.0
        assert rows[(0, 2)].centroid == 0.0
        assert rows[(1, 1)].centroid == -1.0
        assert rows[(1, 2)].centroid == 0.0
        assert all(r.n_members == 3 for r in rows.values())

    def test_empty_cluster_keeps_seed_centroid(self, spark):
        # seeds 0 and 1 are identical: in round 1 every point ties to cid 0
        # (smaller id wins) so cid 1 receives no members and must carry its
        # seed centroid; once cid 0's centroid moves to the mean, the exact
        # (1.0, 1.0) points snap back to the carried cid 1 — the
        # escaped-empty-cluster dynamics Lloyd's is supposed to have
        pts = [
            (0, [1.0, 1.0]),
            (1, [1.0, 1.0]),
            (2, [1.5, 1.0]),
        ]
        emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
        rows = {
            (r.cluster, r.dim): r
            for r in kmeans_train(emb, k=2, n_iter=2).collect()
        }
        assert rows[(1, 1)].centroid == 1.0  # carried seed, not NaN/0
        assert rows[(1, 1)].n_members == 2   # recaptured the exact points
        assert rows[(0, 1)].centroid == 1.5  # converged to the outlier
        assert rows[(0, 1)].n_members == 1

    def test_deterministic_across_partitionings(self, spark):
        import random

        rng = random.Random(7)
        pts = [
            (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
        ]
        emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
        a = sorted(map(tuple, kmeans_train(emb, k=3, n_iter=3).collect()))
        b = sorted(
            map(tuple, kmeans_train(emb.repartition(13), k=3, n_iter=3).collect())
        )
        assert a == b


class TestSemDedup:
    def test_planted_within_cluster_duplicates_drop_larger_id(self, spark):
        # two separated groups; each contains an exact duplicate pair and
        # one distinct member — only the larger id of each dup pair drops
        from text_to_graph_spark.operators.similarity import semdedup

        pts = [
            (0, [1.0, 0.1]),
            (1, [-1.0, 0.05]),
            (2, [1.0, 0.1]),     # duplicate of 0 (cos = 1)
            (3, [-1.0, 0.05]),   # duplicate of 1 (cos = 1)
            (4, [0.9, -0.4]),
            (5, [-0.7, 0.6]),
        ]
        emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
        got = {
            r.vec_id: (r.cluster, r.kept)
            for r in semdedup(emb, threshold=0.999, k=2, n_iter=2).collect()
        }
        assert len(got) == 6
        assert got[2][1] == 0 and got[3][1] == 0
        assert all(got[i][1] == 1 for i in (0, 1, 4, 5))
        # drops happened within a cluster: each dropped id shares a cell
        # with its smaller-id duplicate
        assert got[2][0] == got[0][0] and got[3][0] == got[1][0]

    def test_keep_rule_matches_bruteforce_within_cluster(self, spark, emb):
        # kept == 0 iff a smaller-id cluster-mate scores >= threshold
        # under the same half-up-6 rounding (python mirror)
        from text_to_graph_spark.operators.similarity import semdedup

        rows = semdedup(emb, threshold=0.3, k=2, n_iter=2).collect()
        cl = {r.vec_id: r.cluster for r in rows}
        vec = {i: v for i, v in EMB}
        for r in rows:
            mates = [
                j
                for j in vec
                if j < r.vec_id
                and cl[j] == r.cluster
                and math.floor(_cos(vec[j], vec[r.vec_id]) * 1e6 + 0.5) / 1e6
                >= 0.3
            ]
            assert r.kept == (0 if mates else 1), (r, mates)

    def test_deterministic_across_partitionings(self, spark, emb):
        from text_to_graph_spark.operators.similarity import semdedup

        a = sorted(map(tuple, semdedup(emb, k=2).collect()))
        b = sorted(map(tuple, semdedup(emb.repartition(7), k=2).collect()))
        assert a == b


class TestSemDedupProbe:
    def test_corpus_wins_and_new_vs_new_not_judged(self, spark):
        from text_to_graph_spark.operators.similarity import semdedup_probe

        old = spark.createDataFrame(
            [
                (10, [1.0, 0.0]),
                (11, [-1.0, 0.0]),
                (12, [0.95, 0.05]),
            ],
            "vec_id long, embedding array<float>",
        )
        new = spark.createDataFrame(
            [
                (1, [1.0, 0.0]),   # duplicate of old 10 -> rejected
                (2, [0.0, 1.0]),   # novel direction -> kept
                (3, [0.0, 1.0]),   # duplicate of NEW 2 only -> still kept
            ],
            "vec_id long, embedding array<float>",
        )
        got = {
            r.vec_id: r.kept
            for r in semdedup_probe(
                old, new, threshold=0.999, k=2, n_iter=2
            ).collect()
        }
        assert got == {1: 0, 2: 1, 3: 1}

    def test_admission_independent_of_batch_id_order(self, spark):
        # relabeling new-batch ids must not change any admission verdict
        from text_to_graph_spark.operators.similarity import semdedup_probe

        old = spark.createDataFrame(
            [(100 + i, v) for i, v in enumerate([[1.0, 0.0], [-1.0, 0.0]])],
            "vec_id long, embedding array<float>",
        )
        vecs = [[1.0, 0.01], [0.2, 0.9], [-1.0, -0.01]]
        a = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        b = spark.createDataFrame(
            [(9 - i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        ka = {
            tuple(map(float, vecs[r.vec_id])): r.kept
            for r in semdedup_probe(old, a, threshold=0.99, k=2).collect()
        }
        kb = {
            tuple(map(float, vecs[9 - r.vec_id])): r.kept
            for r in semdedup_probe(old, b, threshold=0.99, k=2).collect()
        }
        assert ka == kb


class TestKnnClassify:
    def test_mislabeled_point_outvoted_and_singleton_abstains(self, spark):
        # two separated groups; vec 4 carries the wrong label but its 3
        # cluster-mates outvote it; vec 6 sits alone in a far cell after
        # k=3 training and must abstain (-1)
        from text_to_graph_spark.operators.similarity import knn_classify

        pts = [
            (0, [1.0, 0.0], 7),    # seed of the label-7 cell
            (1, [-1.0, 0.0], 9),   # seed of the label-9 cell
            (2, [0.0, 50.0], 3),   # seed of its own far cell (isolated)
            (3, [0.95, 0.1], 7),
            (4, [-0.95, 0.1], 9),
            (5, [0.9, -0.1], 9),   # mislabeled: sits in the label-7 group
            (6, [-0.9, -0.1], 9),
        ]
        emb = spark.createDataFrame(
            pts, "vec_id long, embedding array<float>, label int"
        )
        got = {
            r.vec_id: (r.pred_label, r.correct)
            for r in knn_classify(emb, k=3, n_centroids=3, n_iter=2).collect()
        }
        assert len(got) == 7
        assert got[5] == (7, 0)   # neighbors 0, 3 vote 7 over its own 9
        # vec 0's electorate {3: 7, 5: 9} ties 1-1 -> smallest label wins
        assert got[0] == (7, 1) and got[3] == (7, 1)
        assert got[1] == (9, 1) and got[4] == (9, 1) and got[6] == (9, 1)
        assert got[2] == (-1, 0)  # no cluster-mates: abstain

    def test_deterministic_across_partitionings(self, spark, emb):
        from text_to_graph_spark.operators.similarity import knn_classify

        lab = emb.withColumn("label", (F.col("vec_id") % 2).cast("int"))
        a = sorted(map(tuple, knn_classify(lab, k=2, n_centroids=2).collect()))
        b = sorted(
            map(
                tuple,
                knn_classify(lab.repartition(7), k=2, n_centroids=2).collect(),
            )
        )
        assert a == b


def test_topk_ivf_trained_within_trained_cluster(spark):
    """The trained index must score only candidates sharing the query's
    k-means cluster, and ranks must be contiguous from 1."""
    from text_to_graph_spark.operators.similarity import (
        MICRO,
        _assign_micro,
        kmeans_train,
        micro_vec_expr,
        topk_ivf_trained,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    got = topk_ivf_trained(emb, emb.where("vec_id < 5"), k=3).collect()
    assert got, "no neighbors returned"

    model = kmeans_train(emb, k=4, n_iter=2)
    by_cid: dict = {}
    for r in model.collect():
        by_cid.setdefault(r.cluster, {})[r.dim] = r.centroid
    cents = [
        (cid, [int(round(v * MICRO)) for _, v in sorted(d.items())])
        for cid, d in sorted(by_cid.items())
    ]
    assigned = {
        r["id"]: r["cluster"]
        for r in _assign_micro(
            emb.select(
                F.col("vec_id").alias("id"), micro_vec_expr("embedding").alias("mic")
            ),
            cents,
        ).collect()
    }
    ranks: dict = {}
    for r in got:
        assert assigned[r.neighbor_id] == assigned[r.query_id]
        ranks.setdefault(r.query_id, []).append(r.rank)
    for q, rs in ranks.items():
        assert sorted(rs) == list(range(1, len(rs) + 1))


class TestQuantizedANN:
    def test_codes_in_range_and_deterministic(self, spark, emb):
        from text_to_graph_spark.operators.similarity import quantized_vectors

        got = {r.vec_id: list(r.qv) for r in quantized_vectors(emb).collect()}
        assert set(got) == {r[0] for r in EMB}
        for codes in got.values():
            assert all(0 <= c <= 255 for c in codes)
        again = {
            r.vec_id: list(r.qv)
            for r in quantized_vectors(emb.repartition(5)).collect()
        }
        assert again == got
        # extremes of each dim map to the ends of the code range
        dim0 = {v: got[v][0] for v in got}
        assert dim0[4] == 0      # -1.0 is the dim-0 min
        assert dim0[1] == 255    # 1.0 is the dim-0 max

    def test_python_mirror_parity(self, spark, emb):
        from text_to_graph_spark.operators.similarity import topk_quantized

        # mirror: micro-units -> per-dim affine codes -> integer dot
        mic = {v: [math.floor(x * 1e6 + 0.5) for x in e] for v, e in EMB}
        d = 3
        mn = [min(m[i] for m in mic.values()) for i in range(d)]
        span = [
            max(max(m[i] for m in mic.values()) - mn[i], 1) for i in range(d)
        ]
        q = {
            v: [(m[i] - mn[i]) * 255 // span[i] for i in range(d)]
            for v, m in mic.items()
        }

        def qdot(a, b):
            return sum(x * y for x, y in zip(q[a], q[b]))

        want = {}
        for qid in (1, 2):
            scored = sorted(
                ((qdot(qid, c), c) for c in q if c != qid),
                key=lambda t: (-t[0], t[1]),
            )[:2]
            for rank, (s, c) in enumerate(scored, 1):
                want[(qid, rank)] = (c, s)
        got = {
            (r.query_id, r.rank): (r.neighbor_id, r.qdot)
            for r in topk_quantized(
                emb, emb.where("vec_id IN (1, 2)"), k=2
            ).collect()
        }
        assert got == want


class TestDuplicatedSpanStats:
    def test_coverage_counts_positions(self, spark):
        from text_to_graph_spark.operators.dedup import duplicated_span_stats

        shared = "w1 w2 w3 w4 w5 w6 w7 w8"
        docs = spark.createDataFrame(
            [
                # doc 1: shared span at both ends, unique middle word
                (1, f"{shared} zz {shared}"),
                # doc 2: shared span once
                (2, f"aa bb {shared}"),
                # doc 3: all-unique text, long enough for spans
                (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
                # doc 4: too short for any 8-gram
                (4, "tiny text"),
            ],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_frac_e6)
            for r in duplicated_span_stats(docs).collect()
        }
        # doc1: 17 words -> 10 spans; spans at positions 1 and 10 are the
        # shared 8-gram (others straddle 'zz' or are offset)
        assert got[1] == (10, 2, 200000)
        # doc2: 10 words -> 3 spans, one of them shared
        assert got[2] == (3, 1, 333333)
        assert got[3] == (2, 0, 0)
        assert got[4] == (0, 0, 0)

    def test_within_doc_repeat_alone_not_duplicated(self, spark):
        from text_to_graph_spark.operators.dedup import duplicated_span_stats

        rep = "r1 r2 r3 r4 r5 r6 r7 r8"
        docs = spark.createDataFrame(
            [(1, f"{rep} {rep}"), (2, "x1 x2 x3 x4 x5 x6 x7 x8 x9")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r.n_dup_spans
            for r in duplicated_span_stats(docs).collect()
        }
        # the repeated span lives only in doc 1 — cross-doc count is 1
        assert got == {1: 0, 2: 0}


class TestMinhashRecall:
    def test_exact_duplicates_reach_full_recall(self, spark):
        # identical docs have jaccard 1.0 and collide in every band ->
        # recall must be exactly 1e6 ppm, with hits bounded by both sides
        from text_to_graph_spark.operators.dedup import minhash_recall

        text = "the quick brown fox jumps over the lazy dog again and again"
        docs = spark.createDataFrame(
            [(1, text), (2, text), (3, "a wholly different document body x y z")],
            "doc_id long, text string",
        )
        row = minhash_recall(docs, threshold=0.5).collect()[0]
        assert row.n_true == 1
        assert row.n_hit == 1
        assert row.recall_ppm == 1_000_000
        assert row.n_hit <= min(row.n_true, row.n_candidates)

    def test_disjoint_corpus_has_no_truth_and_no_hits(self, spark):
        from text_to_graph_spark.operators.dedup import minhash_recall

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon"), (2, "one two three four five")],
            "doc_id long, text string",
        )
        row = minhash_recall(docs, threshold=0.5).collect()[0]
        assert (row.n_true, row.n_hit, row.recall_ppm) == (0, 0, 0)


class TestSpanTrim:
    def test_shared_run_excised_whole_and_rest_kept(self, spark):
        from text_to_graph_spark.operators.dedup import span_trim

        shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"  # 10-word shared run
        docs = spark.createDataFrame(
            [
                (1, f"a1 a2 a3 {shared} a4 a5 a6"),
                (2, f"b1 b2 {shared} b3 b4 b5 b6 b7 b8 b9"),
                (3, "c1 c2 c3 c4 c5"),  # shorter than n: untouched
            ],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.text, r.n_words, r.n_removed)
            for r in span_trim(docs, n=8).collect()
        }
        # the 10-word run hosts 3 duplicated 8-gram starts per doc; their
        # union covers exactly the run — unique words all survive in order
        assert got[1] == ("a1 a2 a3 a4 a5 a6", 16, 10)
        assert got[2] == ("b1 b2 b3 b4 b5 b6 b7 b8 b9", 19, 10)
        assert got[3] == ("c1 c2 c3 c4 c5", 5, 0)

    def test_within_doc_repeat_not_trimmed(self, spark):
        from text_to_graph_spark.operators.dedup import span_trim

        rep = "r1 r2 r3 r4 r5 r6 r7 r8"
        docs = spark.createDataFrame(
            [(1, f"{rep} {rep}"), (2, "x1 x2 x3 x4 x5 x6 x7 x8 x9")],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.n_removed for r in span_trim(docs, n=8).collect()}
        assert got == {1: 0, 2: 0}

    def test_fully_duplicated_doc_trims_to_empty(self, spark):
        from text_to_graph_spark.operators.dedup import span_trim

        same = "d1 d2 d3 d4 d5 d6 d7 d8"
        docs = spark.createDataFrame(
            [(1, same), (2, same)], "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.text, r.n_removed)
            for r in span_trim(docs, n=8).collect()
        }
        assert got == {1: ("", 8), 2: ("", 8)}


class TestSourceOverlap:
    def test_pairwise_shingle_jaccard(self, spark):
        from text_to_graph_spark.operators.dedup import source_overlap

        shared = "alpha beta gamma"  # one 3-gram shared by s1 and s2
        docs = spark.createDataFrame(
            [
                (1, "s1", f"{shared} delta"),       # shingles: ab g, b g d
                (2, "s2", f"{shared}"),             # shingle: ab g
                (3, "s3", "zeta eta theta iota"),   # disjoint
            ],
            "doc_id long, source string, text string",
        )
        got = {
            (r.source_a, r.source_b): (r.n_shared, r.n_a, r.n_b, r.jaccard_e6)
            for r in source_overlap(docs).collect()
        }
        # s1 has 2 distinct shingles, s2 has 1, shared = 1
        assert got == {("s1", "s2"): (1, 2, 1, 500000)}


class TestLeakageSafeSplit:
    def test_clusters_never_straddle_folds(self, spark):
        from text_to_graph_spark.operators.curation import leakage_safe_split

        base = "the quick brown fox jumps over the lazy dog again and again"
        docs = spark.createDataFrame(
            [(i, base + f" tail{i % 3}") for i in range(30)]
            + [(100 + i, f"unique text number {i} " * 3) for i in range(10)],
            "doc_id long, text string",
        )
        rows = leakage_safe_split(docs).collect()
        assert len(rows) == 40
        by_cluster = {}
        for r in rows:
            by_cluster.setdefault(r.cluster, set()).add(r.split)
            assert r.split in {"train", "val", "test"}
            assert 0 <= r.bucket < 100
        for splits in by_cluster.values():
            assert len(splits) == 1  # a cluster lives in exactly one fold


class TestPcaFirstComponent:
    def test_dominant_axis_ordering_and_determinism(self, spark):
        from text_to_graph_spark.operators.similarity import pca_first_component

        # variance concentrated on dim 0: projections must order by dim 0
        pts = [
            (i, [float(x), 0.01 * (i % 3), 0.0])
            for i, x in enumerate([-9.0, -4.0, -1.0, 1.0, 4.0, 9.0])
        ]
        emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
        got = {r.vec_id: r.pc1_e6 for r in pca_first_component(emb).collect()}
        proj = [got[i] for i in range(6)]
        assert proj == sorted(proj) or proj == sorted(proj, reverse=True)
        # extremes dominate
        assert abs(proj[0]) > abs(proj[2]) and abs(proj[5]) > abs(proj[3])
        again = {
            r.vec_id: r.pc1_e6
            for r in pca_first_component(emb.repartition(4)).collect()
        }
        assert again == got


class TestIncrementalNeardupProbe:
    def test_new_probes_old_only(self, spark):
        from text_to_graph_spark.operators.dedup import incremental_neardup_probe

        shared = "one two three four five six"
        old = spark.createDataFrame(
            [(2, shared), (4, "totally different old text here")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [
                (1, shared),                       # dup of old doc 2
                (3, shared),                       # also dup of old doc 2
                (5, "fresh new content never seen"),  # no match
            ],
            "doc_id long, text string",
        )
        got = {
            r.new_id: (r.is_dup, r.dup_of, r.n_bands_shared)
            for r in incremental_neardup_probe(new, old).collect()
        }
        assert got[1] == (True, 2, 8)
        assert got[3] == (True, 2, 8)
        assert got[5] == (False, None, 0)
        # in-wave duplicates (1 vs 3) are NOT paired by the probe
        assert len(got) == 3

    def test_best_match_prefers_more_bands_then_smaller_id(self, spark):
        from text_to_graph_spark.operators.dedup import incremental_neardup_probe

        t = "alpha beta gamma delta epsilon"
        old = spark.createDataFrame(
            [(10, t), (8, t)], "doc_id long, text string"
        )
        new = spark.createDataFrame([(1, t)], "doc_id long, text string")
        r = incremental_neardup_probe(new, old).collect()[0]
        assert (r.dup_of, r.n_bands_shared) == (8, 8)  # tie -> smaller id


class TestSimhashNeardupPairs:
    def test_identical_docs_pair_at_zero_hamming(self, spark):
        from text_to_graph_spark.operators.dedup import simhash_neardup_pairs

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "the quick brown fox jumps over the lazy dog"),
                (3, "completely unrelated words about spark planning"),
            ],
            "doc_id long, text string",
        )
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in simhash_neardup_pairs(docs).collect()
        }
        assert got.get((1, 2)) == 0
        # unrelated doc never pairs within 3 bit flips
        assert all(k == (1, 2) for k in got)

    def test_pigeonhole_band_guarantee(self, spark):
        """Any pair the verify accepts (hamming <= 3) must have been
        produced by the band join — the operator's output equals the
        brute-force hamming filter."""
        from text_to_graph_spark.operators.dedup import (
            simhash,
            simhash_neardup_pairs,
        )

        base = "alpha beta gamma delta epsilon zeta eta theta"
        docs = spark.createDataFrame(
            [(i, base + f" extra{i % 4}") for i in range(12)],
            "doc_id long, text string",
        )
        sigs = {r.id: r.simhash for r in simhash(docs).collect()}

        def ham(a, b):
            return sum(x != y for x, y in zip(sigs[a], sigs[b]))

        want = {
            (a, b): ham(a, b)
            for a in sigs
            for b in sigs
            if a < b and ham(a, b) <= 3
        }
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in simhash_neardup_pairs(docs).collect()
        }
        assert got == want

    def test_invalid_pigeonhole_arguments_rejected(self, spark):
        """max_hamming >= bands (pigeonhole void) and bits not divisible
        by bands (high bits silently unbanded) both break the <=
        max_hamming recall guarantee — must error, not silently miss."""
        import pytest

        from text_to_graph_spark.operators.dedup import simhash_neardup_pairs

        docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        with pytest.raises(ValueError, match="pigeonhole"):
            simhash_neardup_pairs(docs, max_hamming=4, bands=4)
        with pytest.raises(ValueError, match="divide"):
            simhash_neardup_pairs(docs, bits=32, bands=5)


class TestLabelPrototypes:
    def test_means_and_outlier_pick(self, spark):
        from text_to_graph_spark.operators.similarity import (
            label_prototypes,
            prototype_outliers,
        )

        pts = [
            (1, 0, [0.0, 0.0]),
            (2, 0, [2.0, 0.0]),
            (3, 0, [10.0, 0.0]),   # the label-0 outlier
            (4, 1, [-1.0, -1.0]),
            (5, 1, [-1.0, -1.0]),
        ]
        emb = spark.createDataFrame(
            pts, "vec_id long, label int, embedding array<float>"
        )
        protos = {
            (r.label, r.dim): (r.n_members, r.mean_e6)
            for r in label_prototypes(emb).collect()
        }
        assert protos[(0, 1)] == (3, 4_000_000)   # mean of 0, 2, 10
        assert protos[(0, 2)] == (3, 0)
        assert protos[(1, 1)] == (2, -1_000_000)
        top = {
            r.label: r.vec_id
            for r in prototype_outliers(emb, k=1).collect()
        }
        assert top[0] == 3
        # label 1 is two identical points: tie -> smaller id
        assert top[1] == 4


def test_containment_catches_subset_jaccard_misses(spark):
    # doc 11 is fully quoted inside doc 10 (plus lots of wrapper text):
    # containment(11 in 10) = 1.0 while Jaccard is far below 0.5
    from text_to_graph_spark.operators.dedup import containment_pairs

    quote = "alpha beta gamma delta epsilon"
    wrap = ("intro one two three four five six seven eight nine ten "
            + quote + " outro eleven twelve thirteen fourteen fifteen")
    df = spark.createDataFrame(
        [(10, "g", wrap), (11, "g", quote), (12, "g", "unrelated words only here now")],
        "doc_id long, source string, text string",
    )
    rows = {(r["id_a"], r["id_b"]): r for r in
            containment_pairs(df, group_col="source", threshold=0.5).collect()}
    assert set(rows) == {(10, 11)}
    r = rows[(10, 11)]
    assert r["cont_b_in_a"] == 1.0            # the quote is fully contained
    assert r["cont_a_in_b"] < 0.25            # the wrapper is not
    # symmetric-Jaccard twin on the same input stays silent at 0.5
    j = ngram_jaccard_pairs(df, group_col="source", threshold=0.5).collect()
    assert j == []


def test_neardup_keep_best_prefers_quality_not_min_id(spark):
    # two near-dup docs: the LOWER-id one is low quality (repeated token),
    # the higher-id one is diverse -> keep_best must pick the higher id,
    # which plain near_dup_clusters representatives (min id) would not
    from text_to_graph_spark.operators.dedup import near_dup_clusters, neardup_keep_best

    # shingle jaccard 0.82 (9 of 11 trigrams shared) — calibrated offline
    # to land 3 of 8 r=4 band-key agreements, so the pair survives LSH
    dup_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda lambda"
    dup_b = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    df = spark.createDataFrame(
        [(1, dup_a), (2, dup_b), (9, "totally different content words here")],
        "doc_id long, text string",
    )
    kept = {r["cluster"]: r for r in neardup_keep_best(df).collect()}
    assert kept[1]["kept_id"] == 2            # quality argmax, not min id
    assert kept[1]["n_members"] == 2 and kept[1]["n_dropped"] == 1
    assert kept[9]["kept_id"] == 9 and kept[9]["n_members"] == 1
    # sanity: the min-id representative disagrees on this fixture
    reps = {r["cluster"]: r["doc_id"]
            for r in near_dup_clusters(df).where("is_representative").collect()}
    assert reps[1] == 1


def test_paragraph_dedup_rewrites_corpus(spark):
    """Global first occurrence (doc_id, pos) wins; later occurrences —
    including repeats WITHIN the same doc — are removed; docs reassemble in
    original order; fully-deduplicated and empty docs survive as rows."""
    import pytest as _pytest

    from text_to_graph_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [
            (1, "shared header\nunique one\nshared header"),  # self-repeat
            (2, "unique two\nshared header\nunique three"),
            (3, "shared header"),  # fully deduplicated away
            (4, ""),  # empty doc: zero units
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert got[1]["clean_text"] == "shared header\nunique one"
    assert (got[1]["n_paras"], got[1]["n_kept"]) == (3, 2)
    assert got[2]["clean_text"] == "unique two\nunique three"
    assert (got[2]["n_paras"], got[2]["n_kept"]) == (3, 2)
    assert got[3]["clean_text"] == "" and got[3]["n_kept"] == 0
    assert got[4]["clean_text"] == "" and got[4]["n_paras"] == 0
    with _pytest.raises(ValueError):
        paragraph_dedup(df, max_pos=0)
    # in-plan overflow guard fires instead of silently corrupting the order
    with _pytest.raises(Exception, match="max_pos"):
        paragraph_dedup(df, max_pos=2).collect()


def test_span_trim_matches_python_mirror_on_randomized_corpus(spark):
    """Seeded randomized corpus with planted shared phrases: the Spark
    trim must equal an independent python mirror of the rule (dup span
    starts -> sliding-window coverage -> excision) document for document,
    byte for byte."""
    import random

    from text_to_graph_spark.operators.dedup import span_trim

    rng = random.Random(42)
    alphabet = [f"t{i}" for i in range(12)]
    shared = ["s1 s2 s3 s4 s5 s6 s7 s8 s9", "p1 p2 p3 p4 p5 p6 p7 p8"]
    docs = []
    for d in range(24):
        w = [rng.choice(alphabet) for _ in range(rng.randint(3, 25))]
        if rng.random() < 0.6:
            phrase = rng.choice(shared).split(" ")
            at = rng.randint(0, len(w))
            w = w[:at] + phrase + w[at:]
        docs.append((d, " ".join(w)))

    n = 8
    words = {d: t.split(" ") for d, t in docs}
    span_docs: dict = {}
    for d, w in words.items():
        for i in range(len(w) - n + 1):
            span_docs.setdefault(" ".join(w[i : i + n]), set()).add(d)
    want = {}
    for d, w in words.items():
        ln = len(w)
        dup = {
            i
            for i in range(max(ln - n + 1, 0))
            if len(span_docs[" ".join(w[i : i + n])]) >= 2
        }
        covered = [
            any((j - k) in dup for k in range(n) if 0 <= j - k <= ln - n)
            for j in range(ln)
        ]
        kept = [w[j] for j in range(ln) if not covered[j]]
        want[d] = (" ".join(kept), ln, sum(covered))

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_words, r.n_removed)
        for r in span_trim(sdf, n=n).collect()
    }
    assert got == want


def test_span_trim_maximal_vs_fixed_differ_on_short_overlap(spark):
    """The distinguishing case between the fixed-8 cut and the published
    variable-length ExactSubstr rule: two docs sharing exactly one 8-gram
    (an idiom-sized overlap). span_trim excises those 8 words; the
    maximal rule with min_run=10 keeps them because the maximal run is
    shorter than the threshold."""
    from text_to_graph_spark.operators.dedup import span_trim, span_trim_maximal

    idiom = "i1 i2 i3 i4 i5 i6 i7 i8"
    docs = spark.createDataFrame(
        [
            (1, f"a1 a2 a3 {idiom} a4 a5 a6"),
            (2, f"b1 b2 {idiom} b3 b4 b5 b6"),
        ],
        "doc_id long, text string",
    )
    fixed = {r.doc_id: r for r in span_trim(docs, n=8).collect()}
    maximal = {
        r.doc_id: r for r in span_trim_maximal(docs, n=8, min_run=10).collect()
    }
    assert fixed[1].n_removed == 8 and fixed[2].n_removed == 8
    assert maximal[1].n_removed == 0 and maximal[2].n_removed == 0
    assert maximal[1].text == "a1 a2 a3 " + idiom + " a4 a5 a6"
    assert maximal[1].n_runs == 0


def test_span_trim_maximal_excises_long_runs_whole(spark):
    """A 12-word shared run (5 overlapping 8-gram anchors) crosses a
    min_run=10 threshold: the whole run — and nothing else — is excised
    as ONE maximal run, and two runs separated by enough unique words
    stay separate islands."""
    from text_to_graph_spark.operators.dedup import span_trim_maximal

    run_a = " ".join(f"r{i}" for i in range(12))
    run_b = " ".join(f"q{i}" for i in range(11))
    gap = " ".join(f"u{i}" for i in range(9))  # > n words, breaks islands
    docs = spark.createDataFrame(
        [
            (1, f"x1 x2 {run_a} {gap} {run_b} x3"),
            (2, f"y1 {run_a} y2 y3"),
            (3, f"{run_b} z1 z2 z3"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r for r in span_trim_maximal(docs, n=8, min_run=10).collect()
    }
    assert got[1].n_removed == 23 and got[1].n_runs == 2
    assert got[1].text == "x1 x2 " + gap + " x3"
    assert got[2].n_removed == 12 and got[2].n_runs == 1
    assert got[2].text == "y1 y2 y3"
    assert got[3].n_removed == 11 and got[3].n_runs == 1
    assert got[3].text == "z1 z2 z3"
