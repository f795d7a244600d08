"""Text analysis operators for a training-data pipeline.

- ``quality_stats``: length / distinct-token / stopword-ratio features and a
  composite quality score per document.
- ``token_counts``: whitespace + regex ("BPE-ish" word/number/symbol pieces)
  token counting.
- ``language_id``: n-gram/stopword heuristic language guess with confidence,
  compared against the declared ``lang`` column.
- ``fingerprint``: content fingerprint (md5 hex + 60-bit integer prefix) for
  provenance joins; the rolling/winnowing variant lives in dedup shingles.

Everything is built-in expressions (codegen'd); ratios are integer-count
divisions rounded to 4 dp so they hash identically across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from text_to_graph_spark.functions.portable import round_half_up

STOPWORDS_EN = ("the", "a")
# phrase-boundary set for RAKE: the full corpus stopword vocabulary
# (kit/extract.py STOPWORDS — determiners + degree adjectives)
RAKE_STOPWORDS = ("the", "a", "fast", "slow", "small", "big")
# lowercase word / number runs / single non-alnum — a BPE-ish pre-tokenizer
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def quality_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    w = F.split(F.col(text_col), " ")
    n_tokens = F.size(w)
    n_distinct = F.size(F.array_distinct(w))
    n_stop = F.size(F.filter(w, lambda t: t.isin(*STOPWORDS_EN)))
    n_chars = F.length(text_col)
    ttr = round_half_up(n_distinct / n_tokens.cast("double"), 4)
    stop_ratio = round_half_up(n_stop / n_tokens.cast("double"), 4)
    avg_len = round_half_up(
        (n_chars - (n_tokens - 1)) / n_tokens.cast("double"), 4
    )  # chars minus separators / tokens
    score = round_half_up(
        ttr * F.lit(0.5)
        + (F.lit(1.0) - stop_ratio) * F.lit(0.3)
        + F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * F.lit(0.2),
        4,
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.cast("bigint").alias("n_tokens"),
        n_distinct.cast("bigint").alias("n_distinct_tokens"),
        n_chars.cast("bigint").alias("n_chars"),
        ttr.alias("type_token_ratio"),
        stop_ratio.alias("stopword_ratio"),
        avg_len.alias("avg_token_len"),
        score.alias("quality_score"),
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), 0))
        .cast("bigint")
        .alias("n_regex_tokens"),
        F.length(text_col).cast("bigint").alias("n_chars"),
    )


# tiny per-language stopword profiles for the heuristic guesser
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "la", "y", "los"),
}


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-profile language guess: score(lang) = matching tokens /
    total; prediction = argmax with deterministic lexical tiebreak."""
    w = F.split(F.col(text_col), " ")
    n = F.size(w).cast("double")
    scores = [
        F.struct(
            round_half_up(
                F.size(F.filter(w, lambda t: t.isin(*stops))) / n, 4
            ).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, stops in sorted(LANG_PROFILES.items())
    ]
    # array_max on struct(score, lang): max score, ties -> max lang; invert
    # lang for a deterministic *ascending* tiebreak by negating via sort
    best = F.array_max(F.array(*scores))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col("lang").alias("lang_declared"),
        best["lang"].alias("lang_pred"),
        best["score"].alias("lang_score"),
        (F.col("lang") == best["lang"]).alias("is_match"),
    )


# Gopher rule 7's published stopword list (Rae et al. 2021, table A1:
# "contains at least 2 of the following stop words"); the list is an
# English-specific CONFIG, so callers curating a different corpus (or the
# synthetic fixture, whose function words are just the/a) pass their own.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_BULLET_CHARS = ("•", "‣", "▪", "-", "*")


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    max_symbol_word_ppm: int = 100_000,
    max_bullet_line_ppm: int = 900_000,
    max_ellipsis_line_ppm: int = 300_000,
    min_alpha_word_ppm: int = 800_000,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The published Gopher document-quality rule battery (Rae et al. 2021,
    arXiv:2112.11446, table A1) plus the C4 doc-level filters (Raffel et
    al. 2020, arXiv:1910.10683 §2.2), as ONE zero-shuffle projection —
    per-rule exact-integer ppm metrics, per-rule pass flags, and the
    composed gates. Defaults are the published thresholds:

    1. word count in [50, 100 000]
    2. mean word length in [3, 10] characters
    3. symbol-to-word ratio (``#`` or ellipsis) <= 0.1
    4. <= 90% of lines start with a bullet character
    5. <= 30% of lines end with an ellipsis
    6. >= 80% of words contain at least one alphabetic character
    7. contains >= 2 stopwords from the (configurable) list

    C4 extras: no ``{`` (code/markup tell), no "lorem ipsum", and at least
    3 sentences (sentences approximated as terminal-punctuation count —
    the cross-engine-exact form of C4's sentence split).

    Counting is replace/length arithmetic and array higher-order functions
    only — every metric is an integer, every ratio an exact ``ppm`` via
    integer DIV, so Spark and the DuckDB oracle hash identically. Scale
    shape: pure projection, no shuffle, no UDF; at 100 TB this runs at
    parquet-scan speed with the read pruned to (id, text), and the
    composed boolean is exactly the filter a curation job pushes down.
    """
    t = F.col(text_col)

    def occurrences(token: str):
        return (F.length(t) - F.length(F.replace(t, F.lit(token)))) / len(token)

    words = F.filter(F.split(t, " "), lambda x: x != F.lit(""))
    lines = F.split(t, "\n")
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).cast("bigint").alias("n_words"),
        # words come from a single-space split, so total word chars ==
        # chars with separators removed — no per-word aggregate needed
        F.length(F.replace(t, F.lit(" "))).cast("bigint").alias("word_chars"),
        (occurrences("#") + occurrences("...") + occurrences("…"))
        .cast("bigint")
        .alias("n_symbols"),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(
            F.filter(
                lines,
                lambda l: F.substring(l, 1, 1).isin(*_BULLET_CHARS),
            )
        )
        .cast("bigint")
        .alias("n_bullet_lines"),
        F.size(
            F.filter(
                lines, lambda l: l.endswith("...") | l.endswith("…")
            )
        )
        .cast("bigint")
        .alias("n_ellipsis_lines"),
        F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]")))
        .cast("bigint")
        .alias("n_alpha_words"),
        F.size(
            F.array_intersect(
                F.array_distinct(
                    F.filter(F.split(F.lower(t), " "), lambda x: x != F.lit(""))
                ),
                stop_arr,
            )
        )
        .cast("bigint")
        .alias("stopword_hits"),
        (occurrences(".") + occurrences("!") + occurrences("?"))
        .cast("bigint")
        .alias("n_sentences"),
        t.contains("{").alias("has_curly"),
        F.lower(t).contains("lorem ipsum").alias("has_lorem"),
    )

    def ppm(part: str, total: str):
        return F.expr(f"{part} * 1000000 DIV greatest({total}, 1)").cast(
            "bigint"
        )

    m = base.select(
        "doc_id",
        "n_words",
        ppm("word_chars", "n_words").alias("mean_word_len_ppm"),
        ppm("n_symbols", "n_words").alias("symbol_word_ppm"),
        ppm("n_bullet_lines", "n_lines").alias("bullet_line_ppm"),
        ppm("n_ellipsis_lines", "n_lines").alias("ellipsis_line_ppm"),
        ppm("n_alpha_words", "n_words").alias("alpha_word_ppm"),
        "stopword_hits",
        "n_sentences",
        "has_curly",
        "has_lorem",
    )
    flags = m.select(
        "*",
        F.col("n_words").between(min_words, max_words).alias("pass_word_count"),
        F.col("mean_word_len_ppm")
        .between(min_mean_word_len * 1_000_000, max_mean_word_len * 1_000_000)
        .alias("pass_mean_word_len"),
        (F.col("symbol_word_ppm") <= max_symbol_word_ppm).alias(
            "pass_symbol_ratio"
        ),
        (F.col("bullet_line_ppm") <= max_bullet_line_ppm).alias(
            "pass_bullet_lines"
        ),
        (F.col("ellipsis_line_ppm") <= max_ellipsis_line_ppm).alias(
            "pass_ellipsis_lines"
        ),
        (F.col("alpha_word_ppm") >= min_alpha_word_ppm).alias(
            "pass_alpha_words"
        ),
        (F.col("stopword_hits") >= min_stopword_hits).alias("pass_stopwords"),
    )
    return flags.select(
        "*",
        (
            F.col("pass_word_count")
            & F.col("pass_mean_word_len")
            & F.col("pass_symbol_ratio")
            & F.col("pass_bullet_lines")
            & F.col("pass_ellipsis_lines")
            & F.col("pass_alpha_words")
            & F.col("pass_stopwords")
        ).alias("passes_gopher"),
        (
            (F.col("n_sentences") >= 3)
            & ~F.col("has_curly")
            & ~F.col("has_lorem")
        ).alias("passes_c4"),
    )


def line_repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style LINE-level repetition signals (Rae et al. 2021,
    arXiv:2112.11446, table A1 rows "duplicate line fraction" /
    "duplicate line character fraction") — the structural complement of
    ``curation.repetition_stats`` (which measures word-n-gram repeats):
    templated spam and boilerplate loops repeat whole lines, not just
    n-grams, and the char-mass variant catches a page whose few repeated
    lines are very long.

    Per document (lines = newline-split, trimmed, non-empty):
    - ``n_lines`` and ``dup_line_frac_ppm``: share of line occurrences
      beyond each distinct line's first,
    - ``dup_line_char_frac_ppm``: character mass of those repeats.

    Scale shape: pure projection over array higher-order functions — no
    shuffle, no UDF, no explode; at 100 TB this runs at parquet-scan speed
    with the read pruned to (id, text). Ratios are exact integer ppm
    (``x * 1e6 DIV total``), so results hash identically across engines.
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )

    def chars(arr):
        return F.aggregate(
            arr, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        )

    def ppm(part: str, total: str):
        return (
            F.when(
                F.col(total) > 0,
                F.expr(f"CAST({part} AS bigint) * 1000000 DIV {total}"),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
        )

    base = docs.select(
        F.col(id_col).alias("doc_id"), lines.alias("l")
    ).select(
        "doc_id",
        F.size("l").alias("n_lines"),
        F.size(F.array_distinct("l")).alias("n_dl"),
        chars(F.col("l")).alias("lc"),
        chars(F.array_distinct("l")).alias("dlc"),
    )
    return base.select(
        "doc_id",
        F.col("n_lines").cast("bigint").alias("n_lines"),
        ppm("n_lines - n_dl", "n_lines").alias("dup_line_frac_ppm"),
        ppm("lc - dlc", "lc").alias("dup_line_char_frac_ppm"),
    )


def remove_repeated_lines(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The removal TRANSFORM behind :func:`line_repetition_stats`: drop
    every later occurrence of a previously-seen non-blank trimmed line
    within a document (templated nav bars, repeated boilerplate footers,
    spam loops), keeping first occurrences and all blank lines (paragraph
    structure), preserving original line bytes and order.

    Output: (doc_id, text, n_dropped) — ``text`` byte-exactly equal to the
    newline-join of the kept lines, so the oracle compares the cleaned
    document itself, not a proxy statistic.

    Scale shape: one document per row and the rule is order-dependent only
    WITHIN a document, so this is a shuffle-free Arrow-batched
    ``mapInPandas`` projection (the chunker's shape) — at 100 TB it runs at
    scan speed with no exchange. A windowed JVM formulation
    (posexplode -> row_number per (doc, line) -> re-aggregate) would pay
    two corpus-sized shuffles for the same answer.
    """
    from collections.abc import Iterator

    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, outs, drops = [], [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                seen: set[str] = set()
                kept: list[str] = []
                dropped = 0
                for ln in ("" if txt is None else txt).split("\n"):
                    key = ln.strip()
                    if key and key in seen:
                        dropped += 1
                        continue
                    if key:
                        seen.add(key)
                    kept.append(ln)
                ids.append(did)
                outs.append("\n".join(kept))
                drops.append(dropped)
            yield pd.DataFrame(
                {"doc_id": ids, "text": outs, "n_dropped": drops}
            )

    return docs.select(
        F.col(id_col).alias(id_col), F.col(text_col).alias(text_col)
    ).mapInPandas(batches, "doc_id bigint, text string, n_dropped bigint")


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per document by a tf-idf-style score.

    The idf factor is LINEARIZED to exact integer arithmetic:
    idf_e6 = (1e6 * N) DIV df, score = tf * idf_e6 — same per-document
    ranking direction as tf*log(N/df) for the common case, but
    bit-reproducible across engines and shuffle orders (ln() is libm- and
    engine-dependent in the last ulp; an integer pipeline has no such
    seam). Ties break by term asc.

    Scale: one shuffle for (doc, term) counts, one for term df, a shuffle
    equi-join on term (the df side is term-cardinality sized — broadcast
    only if the vocabulary is small), and a per-doc top-k window.
    """
    from pyspark.sql import Window

    terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).where(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(id_col).distinct().count()
    scored = tf.join(df_, "term").select(
        "doc_id",
        "term",
        "tf",
        F.expr(f"tf * (({10**6} * CAST({n_docs} AS BIGINT)) DIV df)").alias(
            "score_e6"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_e6").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", F.col("rank").cast("int").alias("rank"), "term",
                "tf", "score_e6")
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
) -> DataFrame:
    """Whole-corpus inverted index: per term, document frequency and the
    sorted posting list of documents containing it.

    Scale shape: one explode, one distinct (term, doc) shuffle with partial
    aggregation, one groupBy(term) building the postings — at corpus scale
    the posting-list agg is the canonical search-index build and each term's
    list lands on one reducer (hot stopword terms are the skew case; the
    ``min_df`` floor plus an upstream stopword filter is the standard
    mitigation, and AQE skew-split handles the residual). Posting lists are
    ``array_sort``-ed so output is partition-order independent.
    """
    td = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    return (
        td.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.array_sort(F.collect_list("doc_id")).alias("postings"),
        )
        .where(F.col("df") >= min_df)
    )


def ngram_counts(
    docs: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 3,
) -> DataFrame:
    """Corpus n-gram statistics (the LM-training staple): every
    whitespace n-gram with total occurrences and document frequency.

    The n-gram expansion is a pure array expression (split -> indexed
    ``transform`` -> explode), fully codegen'd — no UDF; one shuffle for
    the (ngram) partial-aggregated count. ``min_count`` bounds the output
    tail (at web scale the count-count distribution is Zipfian; the floor
    is what every n-gram LM pipeline applies before the join stage).
    """
    w = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    # slice length clamps to 0 for short docs -> empty gram array, no CASE
    grams = F.expr(
        f"transform(slice(w, 1, greatest(size(w) - {n - 1}, 0)), "
        f"(x, i) -> concat_ws(' ', slice(w, i + 1, {n})))"
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), w.alias("w"))
        .select("doc_id", F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .where(F.col("n_occurrences") >= min_count)
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    md5 = F.md5(F.trim(F.col(text_col)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        md5.alias("fp_md5"),
        F.conv(F.substring(md5, 1, 15), 16, 10).cast("bigint").alias("fp_int60"),
    )


def hashed_features(
    docs: DataFrame,
    n_dims: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Feature-hashing (hashing-trick) document vectors — the scalable
    featurization that needs no vocabulary pass: token t contributes
    sign(md5(t)) into dimension md5(t) mod n_dims, summed per document.

    One explode + one partial-aggregated shuffle keyed (doc_id, dim) whose
    width is bounded by n_dims per document regardless of document length;
    no model state, no driver round-trip, deterministic across engines
    (md5-prefix integer arithmetic only). Sparse output rows
    (doc_id, dim, weight), zero-weight dims omitted.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    h = F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10).cast("bigint")
    sgn = F.when((h % (2 * n_dims)) >= n_dims, F.lit(-1)).otherwise(F.lit(1))
    return (
        tok.select("doc_id", (h % n_dims).cast("int").alias("dim"), sgn.alias("sgn"))
        .groupBy("doc_id", "dim")
        .agg(F.sum("sgn").cast("bigint").alias("weight"))
        .where(F.col("weight") != 0)
    )


def term_cooccurrence(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_terms: int = 50,
    min_pair_docs: int = 3,
) -> DataFrame:
    """Term co-occurrence pairs with a linearized PMI ("lift") score:
    lift_e6 = (n_docs_pair * N * 1e6) DIV (df_a * df_b) — the integer
    linearization of P(a,b)/(P(a)P(b)) (same ranking as PMI without the
    engine-dependent log), computed over each document's sorted distinct
    term set truncated to ``max_terms``.

    Scale shape: the pair expansion is a pure nested-``transform`` array
    expression (codegen'd, no self-join on doc_id — a per-doc quadratic
    join is the classic co-occurrence scale trap); output is bounded by
    ``max_terms``² per doc and the ``min_pair_docs`` floor kills the
    Zipfian tail before the df joins. One shuffle for pair counts, one for
    df, two equi-joins on term keys.
    """
    w = F.slice(
        F.array_sort(
            F.array_distinct(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
            )
        ),
        1,
        max_terms,
    )
    base = docs.select(F.col(id_col).alias("doc_id"), w.alias("w"))
    n_total = docs.count()
    df_ = (
        base.select(F.explode("w").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    pairs = F.expr(
        "flatten(transform(w, (x, i) -> "
        "transform(slice(w, i + 2, size(w)), y -> struct(x AS a, y AS b))))"
    )
    pc = (
        base.select(F.explode(pairs).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_docs_pair"))
        .where(F.col("n_docs_pair") >= min_pair_docs)
    )
    return (
        pc.join(df_.select(F.col("term").alias("a"), F.col("df").alias("df_a")), "a")
        .join(df_.select(F.col("term").alias("b"), F.col("df").alias("df_b")), "b")
        .select(
            F.col("a").alias("term_a"),
            F.col("b").alias("term_b"),
            F.col("n_docs_pair").cast("bigint").alias("n_docs_pair"),
            F.col("df_a").cast("bigint").alias("df_a"),
            F.col("df_b").cast("bigint").alias("df_b"),
            # decimal(38,0) product: overflows int64 once
            # n_docs_pair * n_total > ~9.2e12 (trivially hit at corpus scale)
            F.expr(
                f"CAST(n_docs_pair AS decimal(38,0)) * {n_total} * 1000000"
                " DIV (df_a * df_b)"
            ).cast("bigint").alias("lift_e6"),
        )
    )


def lm_familiarity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 3,
) -> DataFrame:
    """LM-style familiarity score: the fraction of each document's bigrams
    that are corpus-frequent (total occurrences >= ``min_count``) — the
    cheap engine-portable stand-in for the KenLM-perplexity filter every
    web-corpus pipeline runs (rare-bigram-heavy docs score low). One row
    per document, including gram-less ones (ratio 0.0).

    Scale shape: the gram stream is computed ONCE and reused for both the
    corpus table and the per-doc join; corpus counts partial-aggregate on
    the gram key, the membership join is an equi-join on ngram (broadcast
    when the frequent-gram table is small), then one doc_id agg.
    """
    w = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    grams = F.expr(
        "transform(slice(w, 1, greatest(size(w) - 1, 0)), "
        "(x, i) -> concat_ws(' ', slice(w, i + 1, 2)))"
    )
    g = docs.select(F.col(id_col).alias("doc_id"), w.alias("w")).select(
        "doc_id", F.explode(grams).alias("ngram")
    )
    corpus = (
        g.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .select("ngram", F.lit(1).alias("known"))
    )
    per = (
        g.join(corpus, "ngram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.coalesce("known", F.lit(0))).cast("bigint").alias("n_known"),
        )
    )
    return docs.select(F.col(id_col).alias("doc_id")).join(
        per, "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
        F.coalesce("n_known", F.lit(0)).cast("bigint").alias("n_known"),
        F.when(F.coalesce("n_grams", F.lit(0)) == 0, F.lit(0.0))
        .otherwise(
            round_half_up(F.col("n_known") / F.col("n_grams").cast("double"), 4)
        )
        .alias("known_ratio"),
    )


def ccnet_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    min_count: int = 3,
) -> DataFrame:
    """CCNet-style per-language quality bucketing (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): rank each language's documents by LM familiarity
    (:func:`lm_familiarity`, the engine-portable KenLM-perplexity
    stand-in) and split them into head / middle / tail terciles — the
    exact partitioning CCNet publishes its corpora in, and the knob
    training mixes use ("head+middle only" is the common recipe).

    Determinism: the score is exact integer ppm and the tercile is
    ``ntile(3)`` over the total order (ppm DESC, doc_id ASC) within each
    language — no float rank, no rand(), identical on any engine.

    Scale shape: familiarity's shuffles (gram count + doc rollup) plus ONE
    per-language window sort; languages are the partition key, so skew is
    bounded by the largest language — at corpus scale CCNet itself shards
    by (lang, size-bucket), and the window slides to a two-pass
    percentile-threshold split; the tercile CONTRACT is unchanged.

    Output: (doc_id, lang, known_ppm, bucket) with bucket in
    {'head', 'middle', 'tail'}.
    """
    from pyspark.sql import Window

    fam = lm_familiarity(docs, id_col, text_col, min_count).select(
        "doc_id",
        F.expr("n_known * 1000000 DIV greatest(n_grams, 1)")
        .cast("bigint")
        .alias("known_ppm"),
    )
    scored = docs.select(
        F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")
    ).join(fam, "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.desc("known_ppm"), F.asc("doc_id")
    )
    return scored.select(
        "doc_id",
        "lang",
        "known_ppm",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
            F.ntile(3).over(w),
        ).alias("bucket"),
    )


def langid_confusion(docs: DataFrame) -> DataFrame:
    """Language-ID confusion matrix — declared label vs heuristic
    prediction (:func:`language_id`), the corpus-level diagnostic that
    tells you whether to trust the upstream ``lang`` column, the guesser,
    or neither before language-filtering a training mix.

    (lang_declared, lang_pred, n_docs, frac_e6): ``frac_e6`` is the exact
    ppm share within the declared language (rows of the matrix sum to
    ~1e6). One partial-agg rollup over the per-doc predictions; the share
    window runs over the ≤|langs|² aggregate, never the corpus.
    """
    conf = (
        language_id(docs)
        .groupBy("lang_declared", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return conf.select(
        "lang_declared",
        "lang_pred",
        "n_docs",
        F.expr(
            "n_docs * 1000000 DIV "
            "sum(n_docs) OVER (PARTITION BY lang_declared)"
        ).cast("bigint").alias("frac_e6"),
    )


def vocab_coverage(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 200,
) -> DataFrame:
    """Vocabulary coverage curve — the "how many types cover how much of
    the corpus" table that sizes tokenizer vocabularies and stopword lists.

    Top-``k`` terms by corpus frequency (ties by term ascending) with each
    term's rank, count, and the CUMULATIVE corpus share in exact ppm
    (denominator = ALL token occurrences, so the curve is honest about the
    tail the cut drops). The heavy step is one partial-agg'd term count;
    ranking is a TakeOrdered top-k (never a global sort), and the
    cumulative window runs over k rows on the driver-scale result.
    Returns (rank, term, n_occurrences, cum_frac_e6).
    """
    terms = docs.select(
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("term")
    )
    total = terms.count()
    top = (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("term"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("term"))
    return top.select(
        F.row_number().over(w).alias("rank"),
        "term",
        "n_occurrences",
        # decimal(38,0) product: cumulative count * 1e6 overflows int64
        # past ~9.2e12 total token occurrences (a few TB of text)
        F.expr(
            f"CAST(sum(n_occurrences) OVER (ORDER BY n_occurrences DESC, "
            f"term ROWS UNBOUNDED PRECEDING) AS decimal(38,0)) * 1000000 "
            f"DIV {total}"
        ).cast("bigint").alias("cum_frac_e6"),
    )


def rake_keyphrases(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) — the classic
    unsupervised "what is this page about" signal a KG pipeline attaches to
    entity cards and crawl prioritization.

    Candidate phrases are maximal stopword-free token runs; each content
    word scores deg(w)/freq(w) where deg counts co-occurring phrase slots
    (phrase length, self included) and freq counts occurrences, both
    per-document; a phrase scores the sum of its member-word scores. The
    score is kept in exact integer micro-units (``deg*1e6 DIV freq``,
    summed) so both engines hash identically — no float seam.

    Distribution: one posexplode + a doc-partitioned running-sum window
    assigns phrase group ids (single shuffle on doc_id); word stats and the
    phrase-score join are equi-keyed on (doc_id, term) — co-partitioned
    with the phrase build, never corpus-global; top-k is a per-doc
    row_number window. No UDF anywhere; every doc is independent, so the
    job scales with the corpus like the extraction pipeline itself.
    """
    w = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    toks = docs.select(F.col(id_col).alias("doc_id"), F.posexplode(w).alias("pos", "term"))
    is_stop = F.col("term").isin(*stopwords)
    run = Window.partitionBy("doc_id").orderBy("pos")
    grouped = toks.withColumn(
        "grp", F.sum(F.when(is_stop, 1).otherwise(0)).over(run)
    ).where(~is_stop)
    phrases = grouped.groupBy("doc_id", "grp").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "term"))),
                lambda x: x.term,
            ),
        ).alias("phrase"),
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
    )
    word_scores = (
        phrases.select(
            "doc_id", "n_words", F.explode(F.split("phrase", " ")).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(
            F.sum("n_words").alias("deg"),
            F.count(F.lit(1)).alias("freq"),
        )
        .select(
            "doc_id",
            "term",
            F.expr("(deg * 1000000) DIV freq").alias("wscore_e6"),
        )
    )
    distinct_phrases = phrases.groupBy("doc_id", "phrase", "n_words").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )
    scored = (
        distinct_phrases.select(
            "doc_id",
            "phrase",
            "n_words",
            "n_occurrences",
            F.explode(F.split("phrase", " ")).alias("term"),
        )
        .join(word_scores, ["doc_id", "term"])
        .groupBy("doc_id", "phrase", "n_words", "n_occurrences")
        .agg(F.sum("wscore_e6").cast("bigint").alias("score_e6"))
    )
    top = Window.partitionBy("doc_id").orderBy(F.desc("score_e6"), F.asc("phrase"))
    return (
        scored.withColumn("rank", F.row_number().over(top))
        .where(F.col("rank") <= top_k)
        .select("doc_id", F.col("rank").cast("int").alias("rank"),
                "phrase", "n_words", "n_occurrences", "score_e6")
    )


def rake_corpus_keyphrases(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 20,
    min_docs: int = 2,
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
) -> DataFrame:
    """Corpus-level RAKE salience — the "what is this crawl about" rollup
    that feeds topic routing and crawl-seed selection.

    Every candidate phrase keeps its per-document RAKE score (exact integer
    micro-units; no per-doc top-k cut, so the rollup sees the full candidate
    set); the corpus score is the SUM of per-doc scores with document
    frequency alongside, floored at ``min_docs`` to drop one-off tails.
    One extra partial-agg'd shuffle on the phrase string over the per-doc
    scored table; top-k is a TakeOrdered, never a global sort.
    """
    scored = rake_keyphrases(
        docs, id_col, text_col, top_k=2**31 - 1, stopwords=stopwords
    )
    agg = (
        scored.groupBy("phrase")
        .agg(
            F.max("n_words").alias("n_words"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.sum(F.col("score_e6") * F.col("n_occurrences"))
            .cast("bigint")
            .alias("corpus_score_e6"),
        )
        .where(F.col("n_docs") >= min_docs)
    )
    rank = Window.orderBy(F.desc("corpus_score_e6"), F.asc("phrase"))
    return (
        agg.orderBy(F.desc("corpus_score_e6"), F.asc("phrase"))
        .limit(top_k)
        .select(
            F.row_number().over(rank).alias("rank"),
            "phrase",
            "n_words",
            "n_docs",
            "corpus_score_e6",
        )
    )


def vocab_concentration(
    docs: DataFrame,
    ks: tuple[int, ...] = (10, 100),
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-concentration report — how much of each slice's token
    mass its most frequent types carry (the Zipf-head telemetry a mixture
    designer reads next to the source-overlap matrix: a slice whose top-10
    types cover half its tokens is template/boilerplate-heavy and gains
    little from upsampling). Per ``group_col``: type count, token count,
    and the exact-ppm mass share of the top-k types for each k in ``ks``
    (ranked by count desc, token asc — deterministic ties).

    Scale shape: one explode + one (group, token) partial-agg'd shuffle;
    the rank window partitions per group over the TYPE table (vocabulary-
    sized, not corpus-sized); the final rollup is group-count rows. Exact
    integer ppm end to end.
    """
    w = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    tok = docs.select(
        F.col(group_col).alias("grp"), F.explode(w).alias("token")
    )
    counts = tok.groupBy("grp", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    ranked = counts.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("grp").orderBy(
                F.col("cnt").desc(), F.col("token").asc()
            )
        ),
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum("cnt").cast("bigint").alias("total_tokens"),
    ]
    for k in ks:
        aggs.append(
            F.expr(
                f"sum(CASE WHEN rnk <= {k} THEN cnt ELSE 0 END) * 1000000 "
                f"DIV sum(cnt)"
            )
            .cast("bigint")
            .alias(f"top{k}_mass_ppm")
        )
    return ranked.groupBy(F.col("grp").alias(group_col)).agg(*aggs)
