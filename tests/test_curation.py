"""Curation operators vs hand-computed oracles on crafted corpora (the
sf0.01 driver tables are covered by tools/check_correctness.py; these pin
the semantics on inputs with known answers)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from text_to_graph_spark.operators.curation import (
    PPM,
    balanced_mixture,
    benchmark_contamination,
    curated_corpus,
    repetition_stats,
    stratified_sample,
)

DOCS = [
    # doc_id, text, lang, source, n_chars
    (1, "alpha beta gamma delta epsilon zeta", "en", "s0", 35),
    (2, "alpha beta gamma delta nine ten", "en", "s0", 31),      # shares 4-gram w/ 1
    (3, "one two three four five six seven", "de", "s1", 33),
    (4, "eight nine ten eleven twelve", "de", "s1", 28),
    (5, "uno dos tres cuatro cinco seis", "es", "s1", 30),
    (6, "tiny doc", "en", "s0", 8),                               # < n tokens
    (7, "rep rep rep rep rep unique", "en", "s0", 26),            # repetitive
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16) % PPM


def test_contamination_hits_only_overlapping_docs(docs, spark):
    bench = docs.where("doc_id = 1")
    cand = docs.where("doc_id <> 1")
    got = {r["doc_id"]: r for r in benchmark_contamination(cand, bench, n=4).collect()}
    # only doc 2 shares a 4-gram ("alpha beta gamma delta") with the benchmark
    assert set(got) == {2}
    r = got[2]
    assert r["n_hits"] == 1 and r["n_shingles"] == 3
    assert r["sample_hit"] == "alpha beta gamma delta"
    assert r["hit_ratio"] == pytest.approx(0.3333)


def test_contamination_is_corpus_side_broadcast(docs):
    plan = benchmark_contamination(
        docs.where("doc_id <> 1"), docs.where("doc_id = 1"), n=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # benchmark side broadcast, corpus never shuffles for the probe


def test_stratified_sample_matches_hash_rule(docs):
    rates = {"en": 700000, "de": 400000}  # es absent -> dropped
    got = {r["doc_id"] for r in stratified_sample(docs, rates).collect()}
    want = {
        d
        for d, _, lang, _, _ in DOCS
        if lang in rates and _bucket(d) < rates[lang]
    }
    assert got == want and 5 not in got


def test_balanced_mixture_waterline_exact(docs):
    # en has 4 docs, de 2, es 1; weights en .5 / de .25 / es .25
    w = {"en": 500000, "de": 250000, "es": 250000}
    rows = balanced_mixture(docs, w).collect()
    by_stratum: dict[str, list] = {}
    for r in rows:
        by_stratum.setdefault(r["stratum"], []).append(r)
    # waterline T = min(4*1e6//5e5, 2*1e6//25e4, 1*1e6//25e4) = min(8,8,4)=4
    # -> keep en 2, de 1, es 1
    assert {s: len(v) for s, v in by_stratum.items()} == {"en": 2, "de": 1, "es": 1}
    # kept docs are the lowest-bucket ones per stratum
    en_sorted = sorted(
        [d for d, _, lang, _, _ in DOCS if lang == "en"], key=lambda d: (_bucket(d), d)
    )
    assert {r["doc_id"] for r in by_stratum["en"]} == set(en_sorted[:2])
    assert all(r["keep_target"] in (1, 2) for r in rows)


def test_repetition_stats(docs):
    got = {r["doc_id"]: r for r in repetition_stats(docs, n=3).collect()}
    # doc 7: grams = [rep rep rep, rep rep rep, rep rep rep, rep rep unique]
    assert got[7]["n_grams"] == 4 and got[7]["n_distinct_grams"] == 2
    assert got[7]["dup_gram_ratio"] == pytest.approx(0.5)
    # doc 6 has 2 tokens < n -> zero grams, ratio 0
    assert got[6]["n_grams"] == 0 and got[6]["dup_gram_ratio"] == 0.0
    # doc 1 is all-distinct
    assert got[1]["dup_gram_ratio"] == 0.0


def test_line_repetition_stats(spark):
    from text_to_graph_spark.operators.textstats import line_repetition_stats

    docs = spark.createDataFrame(
        [
            # 4 non-empty lines after trim, "spam spam" repeated twice:
            # dup lines 1/4; chars: total 9+9+2+5=25, distinct 9+2+5=16
            (1, "spam spam\n  spam spam  \nok\n\nlast!"),
            (2, "a\nb\nc"),  # no repeats
            (3, ""),  # no lines at all -> all zeros, no division error
            (4, "x\nx\nx\nx"),  # 4 lines, 1 distinct -> 3/4 dup
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in line_repetition_stats(docs).collect()}
    assert got[1]["n_lines"] == 4
    assert got[1]["dup_line_frac_ppm"] == 1_000_000 // 4
    assert got[1]["dup_line_char_frac_ppm"] == (25 - 16) * 1_000_000 // 25
    assert got[2]["dup_line_frac_ppm"] == 0
    assert got[3]["n_lines"] == 0 and got[3]["dup_line_frac_ppm"] == 0
    assert got[4]["dup_line_frac_ppm"] == 750_000


def test_remove_repeated_lines(spark):
    from text_to_graph_spark.operators.textstats import remove_repeated_lines

    docs = spark.createDataFrame(
        [
            # "nav" repeats (incl. a whitespace-padded variant — trimmed
            # match), blanks kept, original bytes of kept lines preserved
            (1, "nav\nbody text\n\n  nav  \nfooter\nnav"),
            (2, "a\nb\nc"),
            (3, ""),
            (4, "x\n\n\nx"),  # duplicate after blanks; blanks all kept
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in remove_repeated_lines(docs).collect()}
    assert got[1]["text"] == "nav\nbody text\n\nfooter"
    assert got[1]["n_dropped"] == 2
    assert got[2]["text"] == "a\nb\nc" and got[2]["n_dropped"] == 0
    assert got[3]["text"] == "" and got[3]["n_dropped"] == 0
    assert got[4]["text"] == "x\n\n" and got[4]["n_dropped"] == 1


def test_remove_repeated_lines_is_shuffle_free(spark):
    from text_to_graph_spark.operators.textstats import remove_repeated_lines

    docs = spark.createDataFrame([(1, "a\na")], "doc_id long, text string")
    plan = remove_repeated_lines(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_strip_host_boilerplate_lines(spark):
    from text_to_graph_spark.operators.curation import strip_host_boilerplate_lines

    docs = spark.createDataFrame(
        [
            # host a: "nav" on 2/3 pages (>=50%, >=2) -> stripped; "rare"
            # on 1/3 pages -> kept; blanks always kept
            ("a", 1, "nav\nbody one\n\nrare"),
            ("a", 2, "  nav \nbody two"),  # trimmed-match also stripped
            ("a", 3, "body three"),
            # host b: same "nav" text but only 1 page -> min_pages keeps it
            ("b", 4, "nav\nother"),
        ],
        "host string, doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in strip_host_boilerplate_lines(docs).collect()}
    assert got[1]["text"] == "body one\n\nrare" and got[1]["n_removed"] == 1
    assert got[2]["text"] == "body two" and got[2]["n_removed"] == 1
    assert got[3]["text"] == "body three" and got[3]["n_removed"] == 0
    assert got[4]["text"] == "nav\nother" and got[4]["n_removed"] == 0


def test_train_linear_classifier_first_round_is_full_update(spark):
    """With zero initial weights every doc scores 0 and (y*0 <= 0) makes
    the whole corpus misclassified, so the round-1 weights must equal the
    label-weighted feature mass summed over ALL docs — checked against
    hashed_features directly. Later rounds must keep integer weights and
    the full (round, dim) grid."""
    from text_to_graph_spark.operators.curation import train_linear_classifier
    from text_to_graph_spark.operators.textstats import hashed_features

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(35))),  # long -> y=+1
            (2, "short doc"),                            # y=-1
            (3, "tiny"),                                 # y=-1
        ],
        "doc_id long, text string",
    )
    labels = spark.createDataFrame([(1, 1), (2, -1), (3, -1)], "doc_id long, y int")
    out = train_linear_classifier(docs, labels, rounds=2).collect()
    assert len(out) == 2 * 64
    got_r1 = {r["dim"]: r["weight"] for r in out if r["round"] == 1}
    feats = hashed_features(docs).collect()
    y = {1: 1, 2: -1, 3: -1}
    expected: dict[int, int] = {d: 0 for d in range(64)}
    for f in feats:
        expected[f["dim"]] += y[f["doc_id"]] * f["weight"]
    assert got_r1 == expected
    assert any(r["weight"] != 0 for r in out)


def test_token_budget_mixture(spark):
    from text_to_graph_spark.operators.curation import token_budget_mixture

    long = " ".join(f"w{i}" for i in range(40))   # 40 tokens, high quality
    mid = " ".join(f"x{i}" for i in range(20))    # 20 tokens
    docs = spark.createDataFrame(
        [
            ("en", 1, long),
            ("en", 2, mid),
            ("en", 3, "the the the the"),          # low quality, 4 tokens
            ("fr", 4, long),                       # no budget -> dropped
        ],
        "lang string, doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           token_budget_mixture(docs, {"en": 60}).collect()}
    # quality order: doc1 (distinct, long) > doc2 > doc3 (all stopwords)
    assert got[1]["kept"] and got[1]["cum_tokens"] == 40
    assert got[2]["kept"] and got[2]["cum_tokens"] == 60  # exactly at cap
    assert not got[3]["kept"] and got[3]["cum_tokens"] == 64  # crosses cap
    assert not got[4]["kept"]  # unbudgeted language


def test_curated_corpus_gates(spark):
    long_good = " ".join(f"w{i}" for i in range(30))          # distinct, long, no stopwords
    other_long = " ".join(f"x{i}" for i in range(30))
    # langid: all-zero stopword scores tie -> 'fr' wins the lexicographic tiebreak
    docs = spark.createDataFrame(
        [
            (1, long_good, "fr", "s0", len(long_good)),       # passes all gates
            (2, long_good, "fr", "s0", len(long_good)),       # exact dup of 1 -> dropped
            (3, other_long, "en", "s0", len(other_long)),     # langid mismatch -> dropped
            (4, "short text here", "fr", "s0", 15),           # < 20 tokens -> dropped
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = curated_corpus(docs, min_quality=0.5, min_tokens=20).collect()
    assert [r["doc_id"] for r in got] == [1]
    assert got[0]["n_tokens"] == 30


def test_pack_sequences_prefix_layout(docs):
    from text_to_graph_spark.operators.curation import pack_sequences

    got = {
        r.doc_id: (r.stratum, r.n_tokens, r.seq_id, r.tok_offset)
        for r in pack_sequences(docs, budget_tokens=10).collect()
    }
    # s0 in id order: doc1 (6 toks @0), doc2 (6 @6), doc6 (2 @12), doc7 (6 @14)
    assert got[1] == ("s0", 6, 0, 0)
    assert got[2] == ("s0", 6, 0, 6)   # starts inside seq 0
    assert got[6] == ("s0", 2, 1, 2)   # 12 DIV 10 = seq 1, offset 2
    assert got[7] == ("s0", 6, 1, 4)
    # s1 packs independently: doc3 (7 @0), doc4 (5 @7), doc5 (6 @12)
    assert got[3] == ("s1", 7, 0, 0)
    assert got[4] == ("s1", 5, 0, 7)
    assert got[5] == ("s1", 6, 1, 2)


def test_hashed_features_matches_python_mirror(docs):
    from text_to_graph_spark.operators.textstats import hashed_features

    got = {
        (r.doc_id, r.dim): r.weight
        for r in hashed_features(docs, n_dims=8).collect()
    }
    exp: dict = {}
    for doc_id, text, *_ in DOCS:
        for tok in text.split(" "):
            if not tok:
                continue
            hv = int(hashlib.md5(tok.encode()).hexdigest()[:12], 16)
            sgn = -1 if (hv % 16) >= 8 else 1
            k = (doc_id, hv % 8)
            exp[k] = exp.get(k, 0) + sgn
    exp = {k: v for k, v in exp.items() if v != 0}
    assert got == exp


class TestSiteStats:
    def test_rollup_matches_pandas(self, spark):
        from text_to_graph_spark.operators.curation import site_stats
        from text_to_graph_spark.sources.pages import synthesize_pages

        pages = synthesize_pages(spark, "/root/testdata/sf0.001")
        got = {r.site: r for r in site_stats(pages).collect()}
        pdf = pages.select(
            F.split("url", "/").getItem(3).alias("site"),
            F.length("text").alias("nc"),
            F.length("html").alias("nb"),
            "lang",
            F.col("warc_ts").cast("long").alias("ep"),
        ).toPandas()
        for site, g in pdf.groupby("site"):
            r = got[site]
            assert r.n_pages == len(g)
            assert r.n_langs == g["lang"].nunique()
            assert r.total_chars == g["nc"].sum()
            assert r.total_html_bytes == g["nb"].sum()
            assert r.chars_per_page == g["nc"].sum() // len(g)
            assert (r.first_crawl_epoch, r.last_crawl_epoch) == (
                g["ep"].min(), g["ep"].max(),
            )
        assert set(got) == set(pdf["site"].unique())


class TestInvertedIndexAndNgrams:
    DOCS = [
        (1, "the cat sat"),
        (2, "the cat ran"),
        (3, "a dog sat"),
    ]

    def _docs(self, spark):
        return spark.createDataFrame(self.DOCS, "doc_id long, text string")

    def test_inverted_index_postings(self, spark):
        from text_to_graph_spark.operators.textstats import inverted_index

        got = {
            r.term: (r.df, list(r.postings))
            for r in inverted_index(self._docs(spark), min_df=2).collect()
        }
        assert got == {
            "the": (2, [1, 2]),
            "cat": (2, [1, 2]),
            "sat": (2, [1, 3]),
        }

    def test_ngram_counts_bigrams(self, spark):
        from text_to_graph_spark.operators.textstats import ngram_counts

        got = {
            r.ngram: (r.n_occurrences, r.n_docs)
            for r in ngram_counts(self._docs(spark), n=2, min_count=1).collect()
        }
        assert got == {
            "the cat": (2, 2),
            "cat sat": (1, 1),
            "cat ran": (1, 1),
            "a dog": (1, 1),
            "dog sat": (1, 1),
        }

    def test_ngram_short_doc_and_trigrams(self, spark):
        from text_to_graph_spark.operators.textstats import ngram_counts

        docs = spark.createDataFrame(
            [(1, "one"), (2, "x  y z")], "doc_id long, text string"
        )  # doc 1 too short for bigrams; doc 2 has a double space
        got = {
            r.ngram: r.n_occurrences
            for r in ngram_counts(docs, n=3, min_count=1).collect()
        }
        assert got == {"x y z": 1}


class TestTermCooccurrence:
    DOCS = [
        (1, "apple banana cherry"),
        (2, "apple banana"),
        (3, "apple banana date"),
        (4, "banana cherry"),
        (5, "solo"),
    ]

    def _docs(self, spark):
        return spark.createDataFrame(self.DOCS, "doc_id long, text string")

    def test_pair_counts_and_lift(self, spark):
        from text_to_graph_spark.operators.textstats import term_cooccurrence

        got = {
            (r.term_a, r.term_b): (r.n_docs_pair, r.df_a, r.df_b, r.lift_e6)
            for r in term_cooccurrence(
                self._docs(spark), min_pair_docs=2
            ).collect()
        }
        # apple+banana in docs 1,2,3; banana+cherry in docs 1,4
        # lift_e6 = n_pair * N(=5) * 1e6 DIV (df_a * df_b)
        assert got == {
            ("apple", "banana"): (3, 3, 4, 3 * 5 * 10**6 // (3 * 4)),
            ("banana", "cherry"): (2, 4, 2, 2 * 5 * 10**6 // (4 * 2)),
        }

    def test_max_terms_truncation(self, spark):
        from text_to_graph_spark.operators.textstats import term_cooccurrence

        # cap 2 keeps only the lexicographically first 2 distinct terms
        got = {
            (r.term_a, r.term_b)
            for r in term_cooccurrence(
                self._docs(spark), max_terms=2, min_pair_docs=1
            ).collect()
        }
        assert got == {("apple", "banana"), ("banana", "cherry")}

    def test_duplicates_within_doc_count_once(self, spark):
        from text_to_graph_spark.operators.textstats import term_cooccurrence

        docs = spark.createDataFrame(
            [(1, "x y x y x"), (2, "x y")], "doc_id long, text string"
        )
        got = {
            (r.term_a, r.term_b): r.n_docs_pair
            for r in term_cooccurrence(docs, min_pair_docs=1).collect()
        }
        assert got == {("x", "y"): 2}


class TestLmFamiliarity:
    def test_known_ratio(self, spark):
        from text_to_graph_spark.operators.textstats import lm_familiarity

        docs = spark.createDataFrame(
            [
                (1, "a b a b"),      # grams: "a b","b a","a b"
                (2, "a b c"),        # grams: "a b","b c"
                (3, "a b"),          # gram:  "a b"
                (4, "zzz"),          # no grams
            ],
            "doc_id long, text string",
        )
        # corpus counts: "a b" x4 (>=3 known), "b a" x1, "b c" x1
        got = {
            r.doc_id: (r.n_grams, r.n_known, r.known_ratio)
            for r in lm_familiarity(docs, min_count=3).collect()
        }
        assert got == {
            1: (3, 2, 0.6667),
            2: (2, 1, 0.5),
            3: (1, 1, 1.0),
            4: (0, 0, 0.0),
        }


class TestCcnetBuckets:
    def test_terciles_follow_score_order_within_language(self, spark):
        from text_to_graph_spark.operators.textstats import ccnet_buckets

        common = "a b a b a b"  # "a b" x3 + "b a" x2: "a b" is corpus-known
        docs = spark.createDataFrame(
            [
                (1, common, "en"),      # all grams known -> top score
                (2, "a b zz qq", "en"),  # partially known
                (3, "x y z w", "en"),    # nothing known -> 0
                (4, "solo", "fr"),       # own language, single doc
            ],
            "doc_id long, text string, lang string",
        )
        got = {
            r.doc_id: (r.lang, r.known_ppm, r.bucket)
            for r in ccnet_buckets(docs).collect()
        }
        assert len(got) == 4
        # en ranked 1 > 2 > 3 by ppm -> one doc per tercile in that order
        assert got[1][2] == "head" and got[3][2] == "tail"
        assert got[2][2] == "middle"
        assert got[1][1] > got[2][1] > got[3][1]
        # a single-doc language lands entirely in head
        assert got[4] == ("fr", 0, "head")

    def test_deterministic_and_total(self, spark):
        from text_to_graph_spark.operators.textstats import ccnet_buckets

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = sorted(map(tuple, ccnet_buckets(docs).collect()))
        b = sorted(map(tuple, ccnet_buckets(docs.repartition(9)).collect()))
        assert a == b
        assert len(a) == docs.count()


class TestLangidConfusion:
    def test_rows_sum_to_one_and_diagonal(self, spark):
        from text_to_graph_spark.operators.textstats import langid_confusion

        docs = spark.createDataFrame(
            [
                (1, "en", "the cat and the dog of note"),
                (2, "en", "a fine day and more of this"),
                (3, "de", "der hund und die katze das haus"),
                (4, "fr", "le chat et les chiens la maison"),
            ],
            "doc_id long, lang string, text string",
        )
        rows = langid_confusion(docs).collect()
        got = {(r.lang_declared, r.lang_pred): (r.n_docs, r.frac_e6) for r in rows}
        assert got[("en", "en")] == (2, 1000000)
        assert got[("de", "de")] == (1, 1000000)
        assert got[("fr", "fr")] == (1, 1000000)
        by_decl = {}
        for (d, _), (n, f) in got.items():
            by_decl.setdefault(d, 0)
            by_decl[d] += f
        for total in by_decl.values():
            assert 999998 <= total <= 1000000


class TestPii:
    def test_counts_and_redaction(self, spark):
        from text_to_graph_spark.operators.pii import pii_stats, redact_pii

        df = spark.createDataFrame(
            [
                (1, "mail me at bob@example.com or call 555-123-4567 now"),
                (2, "server at 192.168.0.1 serves https://a.example.com/x?q=1 daily"),
                (3, "nothing sensitive here at all"),
            ],
            "doc_id long, text string",
        )
        s = {r["doc_id"]: r for r in pii_stats(df).collect()}
        assert (s[1].n_emails, s[1].n_phones, s[1].n_ipv4, s[1].n_urls) == (1, 1, 0, 0)
        assert (s[2].n_emails, s[2].n_phones, s[2].n_ipv4, s[2].n_urls) == (0, 0, 1, 1)
        assert s[3].n_pii == 0
        r = {x["doc_id"]: x for x in redact_pii(df).collect()}
        assert r[1].redacted == "mail me at <EMAIL> or call <PHONE> now"
        assert r[2].redacted == "server at <IP> serves <URL> daily"
        assert r[3].redacted == r[3].text and not r[3].was_redacted

    def test_url_redacted_before_ip_and_email(self, spark):
        # the URL contains both a dotted host and an @-free path: the URL
        # placeholder must win, leaving no leftover for the other classes
        from text_to_graph_spark.operators.pii import redact_pii

        df = spark.createDataFrame(
            [(1, "see http://10.0.0.1/path.html for details")],
            "doc_id long, text string",
        )
        row = redact_pii(df).collect()[0]
        assert row.redacted == "see <URL> for details"

    def test_pii_is_pure_projection(self, spark):
        from text_to_graph_spark.operators.pii import pii_stats
        from text_to_graph_spark.plans.introspect import (
            count_exchanges,
            python_eval_count,
        )

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        out = pii_stats(df)
        assert python_eval_count(out) == 0
        assert count_exchanges(out) == 0


class TestJoinSkewProfile:
    def test_shares_and_salt_recommendation(self, spark):
        from text_to_graph_spark.operators.canonicalize import join_skew_profile

        # 10 rows: 'hot' carries 8, 'a' and 'b' one each -> 3 keys,
        # mean = 10/3; hot mean_x100 = 8*3*100//10 = 240 -> salt 2
        rows = [("hot",)] * 8 + [("a",), ("b",)]
        df = spark.createDataFrame(rows, "k string")
        out = {r["key"]: r for r in join_skew_profile(df, "k", top_k=10).collect()}
        assert out["hot"].n_rows == 8
        assert out["hot"].share_e6 == 800_000
        assert out["hot"].mean_x100 == 240
        assert out["hot"].salt_buckets == 2
        assert out["a"].salt_buckets == 1 and out["a"].mean_x100 == 30

    def test_top_k_is_deterministic_on_ties(self, spark):
        from text_to_graph_spark.operators.canonicalize import join_skew_profile

        df = spark.createDataFrame([("b",), ("a",), ("c",)], "k string")
        got = [r["key"] for r in join_skew_profile(df, "k", top_k=2).collect()]
        assert got == ["a", "b"]  # equal counts -> key asc


class TestClassifierScores:
    def test_score_matches_hand_dot_product(self, spark):
        import hashlib

        from text_to_graph_spark.operators.curation import classifier_scores
        from text_to_graph_spark.operators.textstats import hashed_features

        df = spark.createDataFrame(
            [(1, "alpha beta alpha"), (2, "")], "doc_id long, text string"
        )
        feats = {(r["doc_id"], r["dim"]): r["weight"]
                 for r in hashed_features(df).collect()}

        def w(dim):
            hv = int(hashlib.md5(f"w#{dim}".encode()).hexdigest()[:12], 16)
            return hv % 2001 - 1000

        exp1 = sum(weight * w(dim) for (d, dim), weight in feats.items() if d == 1)
        got = {r["doc_id"]: r for r in classifier_scores(df).collect()}
        assert got[1].score == exp1
        assert got[1].kept == (exp1 >= 0)
        # empty doc: no features, still present with score 0 / kept
        assert got[2].score == 0 and got[2].kept

    def test_inference_is_expression_only(self, spark):
        from text_to_graph_spark.operators.curation import classifier_scores
        from text_to_graph_spark.plans.introspect import python_eval_count

        df = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
        assert python_eval_count(classifier_scores(df)) == 0


class TestQualityPercentileGate:
    def test_per_source_cut_is_exact_and_tie_stable(self, spark):
        from text_to_graph_spark.operators.curation import quality_percentile_gate

        # source A: 3 docs with strictly ordered quality; 50% of 3 -> keep 1
        # (rank*100 <= 50*3 only for rank 1). source B: 2 docs -> keep 1.
        df = spark.createDataFrame(
            [
                (1, "A", "alpha beta gamma delta epsilon zeta"),
                (2, "A", "alpha alpha alpha alpha alpha alpha"),
                (3, "A", "alpha beta gamma delta epsilon eta theta iota"),
                (4, "B", "one two three four five"),
                (5, "B", "one one one one one"),
            ],
            "doc_id long, source string, text string",
        )
        out = {r["doc_id"]: r for r in quality_percentile_gate(df, keep_pct=50).collect()}
        kept = {d for d, r in out.items() if r["kept"]}
        assert out[1].src_docs == 3 and out[4].src_docs == 2
        # doc 3 has highest ttr+length score in A; doc 4 beats doc 5 in B
        assert kept == {3, 4}
        assert out[3].src_rank == 1 and out[2].src_rank == 3

    def test_keep_pct_100_keeps_everything(self, spark):
        from text_to_graph_spark.operators.curation import quality_percentile_gate

        df = spark.createDataFrame(
            [(1, "A", "x y"), (2, "A", "x x")], "doc_id long, source string, text string"
        )
        out = quality_percentile_gate(df, keep_pct=100).collect()
        assert all(r["kept"] for r in out)


class TestBoilerplate:
    def _docs(self, spark):
        # host A: both pages share the 5-word footer "x y z w q"; page text
        # otherwise unique. host B: single page (min_pages=2 excludes it).
        rows = [
            ("A", 1, "alpha beta gamma delta eps x y z w q"),
            ("A", 2, "one two three four five x y z w q"),
            ("B", 3, "lone page body text here x y z w q"),
        ]
        return spark.createDataFrame(rows, "host string, doc_id long, text string")

    def test_mined_shingles_and_threshold(self, spark):
        from text_to_graph_spark.operators.curation import host_boilerplate_shingles

        out = host_boilerplate_shingles(
            self._docs(spark), n=5, min_frac_ppm=500_000, min_pages=2
        ).collect()
        # only host A qualifies; only the pure-footer 5-gram is on BOTH pages
        assert {(r.host, r.shingle) for r in out} == {("A", "x y z w q")}
        r = out[0]
        assert (r.n_pages, r.frac_ppm) == (2, 1_000_000)

    def test_coverage_counts_positions_and_keeps_spine(self, spark):
        from text_to_graph_spark.operators.curation import (
            boilerplate_coverage,
            host_boilerplate_shingles,
        )
        from pyspark.sql import functions as F

        docs = self._docs(spark).unionByName(
            # a too-short page: keeps a zero row (spine preserved)
            spark.createDataFrame(
                [("A", 4, "tiny page")], "host string, doc_id long, text string"
            )
        )
        bp = host_boilerplate_shingles(docs, n=5, min_frac_ppm=500_000, min_pages=2)
        got = {r.doc_id: r for r in boilerplate_coverage(docs, bp, n=5).collect()}
        # doc 1 has 10 words -> 6 shingle positions, 1 boilerplate hit
        assert (got[1].n_shingles, got[1].n_boiler, got[1].boiler_ppm) == (
            6, 1, 166_666,
        )
        # host B's page probes host A's set never: zero hits
        assert got[3].n_boiler == 0 and got[3].n_shingles == 6
        assert (got[4].n_shingles, got[4].n_boiler, got[4].boiler_ppm) == (0, 0, 0)


class TestRakeKeyphrases:
    def test_scores_match_hand_rake(self, spark):
        from text_to_graph_spark.operators.textstats import rake_keyphrases

        docs = spark.createDataFrame(
            [
                # phrases: [key scan] x2, [join]
                (1, "key scan the key scan a join"),
                # phrases: [merge], [merge sort]
                (2, "merge fast merge sort"),
                (3, "the a big"),  # all stopwords -> no candidates
            ],
            "doc_id long, text string",
        )
        rows = rake_keyphrases(docs, top_k=3).collect()
        got = {(r.doc_id, r.rank): (r.phrase, r.n_words, r.n_occurrences, r.score_e6) for r in rows}
        assert got == {
            # key: deg 4 freq 2 -> 2e6; scan same; phrase = 4e6
            (1, 1): ("key scan", 2, 2, 4_000_000),
            (1, 2): ("join", 1, 1, 1_000_000),
            # merge: deg 3 freq 2 -> 1.5e6; sort: deg 2 freq 1 -> 2e6
            (2, 1): ("merge sort", 2, 1, 3_500_000),
            (2, 2): ("merge", 1, 1, 1_500_000),
        }
        assert not [r for r in rows if r.doc_id == 3]

    def test_top_k_and_tiebreak(self, spark):
        from text_to_graph_spark.operators.textstats import rake_keyphrases

        # two single-word phrases with identical scores -> lexicographic
        docs = spark.createDataFrame(
            [(1, "zeta the alpha the beta")], "doc_id long, text string"
        )
        rows = rake_keyphrases(docs, top_k=2).collect()
        assert [(r.rank, r.phrase) for r in sorted(rows, key=lambda r: r.rank)] == [
            (1, "alpha"),
            (2, "beta"),
        ]


class TestRakeCorpus:
    def test_occurrence_weighted_rollup(self, spark):
        from text_to_graph_spark.operators.textstats import rake_corpus_keyphrases

        docs = spark.createDataFrame(
            [
                (1, "key scan the key scan a join"),  # key scan: 4e6 x2 occ
                (2, "key scan the join"),             # key scan: 4e6 x1 occ
            ],
            "doc_id long, text string",
        )
        rows = rake_corpus_keyphrases(docs, top_k=5, min_docs=2).collect()
        got = [(r.rank, r.phrase, r.n_docs, r.corpus_score_e6) for r in rows]
        assert got == [
            (1, "key scan", 2, 12_000_000),
            (2, "join", 2, 2_000_000),
        ]


class TestBottomKSample:
    def test_exact_size_deterministic_and_matches_python(self, spark):
        import hashlib

        from text_to_graph_spark.operators.curation import bottomk_sample

        from tests.conftest import SF_SMOKE

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        got = bottomk_sample(docs, k=25).orderBy("sample_rank").collect()
        assert len(got) == 25
        ids = [d["doc_id"] for d in docs.select("doc_id").collect()]
        exp = sorted(
            (hashlib.md5(str(i).encode()).hexdigest(), i) for i in ids
        )[:25]
        assert [(r["priority"], r["doc_id"]) for r in got] == exp
        assert [r["sample_rank"] for r in got] == list(range(1, 26))

    def test_mergeable_bottomk_of_shards(self, spark):
        from text_to_graph_spark.operators.curation import bottomk_sample

        from tests.conftest import SF_SMOKE

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        lo = bottomk_sample(docs.where("doc_id % 2 = 0"), k=10)
        hi = bottomk_sample(docs.where("doc_id % 2 = 1"), k=10)
        merged = bottomk_sample(
            lo.unionByName(hi).select("doc_id"), k=10, id_col="doc_id"
        )
        direct = bottomk_sample(docs, k=10)
        assert sorted(r["doc_id"] for r in merged.collect()) == sorted(
            r["doc_id"] for r in direct.collect()
        )

    def test_per_stratum_k(self, spark):
        from text_to_graph_spark.operators.curation import bottomk_sample

        from tests.conftest import SF_SMOKE

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        got = bottomk_sample(docs, k=5, stratum_col="lang").collect()
        per = {}
        for r in got:
            per.setdefault(r["lang"], []).append(r["sample_rank"])
        n_langs = docs.select("lang").distinct().count()
        assert len(per) == n_langs
        for ranks in per.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
            assert len(ranks) <= 5


def test_gopher_rules_battery(spark):
    from text_to_graph_spark.operators.textstats import gopher_rules

    good = "the quick brown fox jumps over a lazy dog " * 6  # 60 words
    docs = spark.createDataFrame(
        [
            (1, good.strip()),
            (2, "the a " + "ok " * 58),  # mean word len < 3 -> fails rule 2
            (3, good.strip() + " ###### ###### ###### ######"),  # symbols
            (4, "\n".join(["- item the a"] * 20)),  # all-bullet lines
            (5, "\n".join(["the a trailing..."] * 10)),  # ellipsis lines
            (6, ("12345 " * 60 + "the a").strip()),  # non-alpha words
            (7, "word " * 60),  # zero stopword hits
            (8, "the a few words only"),  # word count < 50
            (9, good.strip() + " {code} lorem ipsum text."),  # C4 tells
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r
        for r in gopher_rules(docs, stopwords=("the", "a")).collect()
    }
    assert got[1]["passes_gopher"] and all(
        got[1][f]
        for f in (
            "pass_word_count",
            "pass_mean_word_len",
            "pass_symbol_ratio",
            "pass_bullet_lines",
            "pass_ellipsis_lines",
            "pass_alpha_words",
            "pass_stopwords",
        )
    )
    assert not got[2]["pass_mean_word_len"] and not got[2]["passes_gopher"]
    assert not got[3]["pass_symbol_ratio"]
    assert got[4]["bullet_line_ppm"] == 1_000_000
    assert not got[4]["pass_bullet_lines"]
    assert got[5]["ellipsis_line_ppm"] == 1_000_000
    assert not got[5]["pass_ellipsis_lines"]
    assert not got[6]["pass_alpha_words"]
    assert got[7]["stopword_hits"] == 0 and not got[7]["pass_stopwords"]
    assert not got[8]["pass_word_count"]
    # C4: doc 1 has no sentences (no terminal punct) -> fails; doc 9 has
    # a sentence but trips both the curly-brace and lorem-ipsum tells
    assert not got[1]["passes_c4"]
    assert got[9]["has_curly"] and got[9]["has_lorem"]
    assert not got[9]["passes_c4"]


def test_gopher_rules_is_shuffle_free(spark):
    from text_to_graph_spark.operators.textstats import gopher_rules

    docs = spark.createDataFrame([(1, "the a x")], "doc_id int, text string")
    plan = gopher_rules(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_curated_corpus_gopher_gate_subsets(spark):
    """gopher_stopwords=None is unchanged behavior; with the battery on,
    the kept set is a subset (docs failing any published rule drop)."""
    from text_to_graph_spark.operators.curation import curated_corpus

    base = "the quick brown fox jumps over a lazy dog " * 6
    rows = [
        (1, base.strip(), "en", "s0"),
        (2, ("word " * 60).strip(), "en", "s0"),  # no stopwords -> gopher drop
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    loose = {
        r["doc_id"]
        for r in curated_corpus(docs, min_quality=0.0, min_tokens=1).collect()
    }
    tight = {
        r["doc_id"]
        for r in curated_corpus(
            docs,
            min_quality=0.0,
            min_tokens=1,
            gopher_stopwords=("the", "a"),
        ).collect()
    }
    assert tight <= loose
    assert 1 in tight and 2 not in tight


def test_dsir_gate_prefers_target_distribution(spark):
    """Docs whose n-grams come from the target distribution's vocabulary
    must outweigh off-distribution docs, the kept set is the per-source
    top-25% exactly, and the whole gate is partitioning-invariant."""
    from text_to_graph_spark.operators.curation import dsir_gate

    target_text = "the quick brown fox jumps over a lazy dog again"
    offdist_text = "zzq wwx vvy uut rrs ppq nno llm jjk hhi"
    rows = []
    for i in range(8):
        rows.append((i, target_text, "en", "s0"))          # target members
    for i in range(8, 12):
        rows.append((i, target_text + " extra", "de", "s0"))  # on-dist, non-target
    for i in range(12, 16):
        rows.append((i, offdist_text, "de", "s0"))         # off-distribution
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r.doc_id: r for r in dsir_gate(docs, keep_pct=25).collect()}
    on_dist = min(out[i].weight_ppm for i in range(8, 12))
    off_dist = max(out[i].weight_ppm for i in range(12, 16))
    assert on_dist > off_dist
    kept = {i for i, r in out.items() if r.kept}
    assert len(kept) == 4  # 25% of 16
    assert kept <= set(range(12))  # never the off-distribution docs
    out2 = {
        r.doc_id: (r.weight_ppm, r.kept)
        for r in dsir_gate(docs.repartition(7, "lang"), keep_pct=25).collect()
    }
    assert out2 == {i: (r.weight_ppm, r.kept) for i, r in out.items()}


def test_dsir_admit_scores_against_frozen_model(spark):
    """The probe must score against the FROZEN fit-time table: a doc made
    of grams never seen at fit time scores 0 (not smoothed into the
    model), on-distribution docs clear the 1.0 threshold, and refitting
    is never triggered by the probe (model rows unchanged)."""
    from text_to_graph_spark.operators.curation import (
        dsir_admit,
        dsir_bucket_ratios,
    )

    fit_docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over a lazy dog", "en")
         for i in range(6)]
        + [(i, "der schnelle braune fuchs springt", "de")
           for i in range(6, 10)],
        "doc_id long, text string, lang string",
    )
    model = dsir_bucket_ratios(fit_docs).localCheckpoint(eager=True)
    n_model_rows = model.count()
    probe = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps"),        # target-like
            (101, "zzzz yyyy xxxx wwww vvvv uuuu"),    # unseen grams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in dsir_admit(probe, model).collect()}
    assert got[100].admitted and got[100].weight_ppm >= 1_000_000
    assert got[101].weight_ppm == 0 and not got[101].admitted
    assert model.count() == n_model_rows  # probe never mutates the model
