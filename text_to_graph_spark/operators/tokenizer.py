"""Distributed BPE tokenizer training — the 100-TB path for learning the
merge table that ``kit/bpe.py`` applies.

The reference's tokenizer is a fixed downloaded artifact (tiktoken,
``gpt.py:27-34``); ``kit.train_bpe`` is this repo's deterministic
driver-side trainer for bounded samples. This module is the corpus-scale
twin: identical semantics (Sennrich et al. 2016, arXiv:1508.07909; most
frequent adjacent byte pair per round, ties broken by byte values
ascending), but the corpus never leaves the cluster:

- ONE corpus-sized shuffle up front: pre-token pieces -> frequency table.
  Everything after runs on the piece VOCABULARY (Zipf: orders of magnitude
  smaller than the corpus; 100 TB of web text is ~10^7 distinct pieces).
- per merge round: one partial-agg pair-count shuffle over the vocabulary,
  one scalar argmax to the driver (the model parameter — 1 row), and one
  codegen'd regexp_replace to apply the merge (no Python, no fold UDF).
- piece state is a comma-joined list of lowercase-hex byte symbols, so a
  merge is literal string surgery and the tie-break order on hex strings
  equals the byte lexicographic order the driver trainer uses (each byte
  maps to a fixed 2-char chunk, monotone in the byte value; '0'-'9' <
  'a'-'f' in ASCII).

Applying a merge with ``regexp_replace(',' || state || ',', ',A,B(?=,)',
',AB')`` reproduces BPE's left-to-right non-overlapping scan exactly: the
engine resumes after each consumed match, the lookahead asserts the right
symbol boundary without consuming the next pair's leading comma, and
symbols cannot false-match because commas appear only at symbol
boundaries. (The DuckDB oracle uses a list_reduce fold instead — RE2 has
no lookahead — and the driver gate checks the two derivations agree.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from text_to_graph_spark.kit.bpe import PRETOKEN_PATTERN


def piece_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(state, freq): distinct pre-token pieces with corpus frequencies,
    piece rendered as the comma-joined lowercase-hex byte-symbol state the
    merge rounds operate on. The one corpus-sized exchange of training."""
    pieces = docs.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_PATTERN), F.lit(0))
        ).alias("piece")
    )
    hexed = pieces.select(
        F.lower(F.hex(F.encode("piece", "utf-8"))).alias("h")
    ).where(F.length("h") > 0)
    state = hexed.select(
        F.expr(
            "array_join(transform(sequence(1, length(h) DIV 2),"
            " i -> substring(h, (i-1)*2+1, 2)), ',')"
        ).alias("state")
    )
    return state.groupBy("state").agg(F.count(F.lit(1)).alias("freq"))


def _pair_counts(pf: DataFrame) -> DataFrame:
    """(a, b, f): adjacent-symbol pair counts over the piece table,
    overlapping occurrences included (training counts every adjacency;
    only APPLYING a merge is non-overlapping — mirrors kit.train_bpe)."""
    return (
        pf.select(F.split("state", ",").alias("sy"), "freq")
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(sy, 1, size(sy)-1), slice(sy, 2, size(sy)-1),"
                    " (x, y) -> struct(x AS a, y AS b))"
                )
            ).alias("p"),
            "freq",
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("f"))
    )


def train_bpe_merges(
    docs: DataFrame, text_col: str = "text", n_merges: int = 10
) -> DataFrame:
    """Learn ``n_merges`` merges distributed; returns the merge table
    (rank, left_hex, right_hex, freq) — identical to ``kit.train_bpe`` on
    the same corpus (pytest-pinned), with the same stop rules (no pairs
    left, or best frequency < 2).

    The returned table is the MODEL (k rows) and is built driver-side from
    the k collected argmax scalars — the corpus itself never leaves the
    executors.
    """
    spark = docs.sparkSession
    pf = piece_frequencies(docs, text_col).localCheckpoint(eager=True)
    rows = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(pf)
            .orderBy(F.col("f").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["f"] < 2:
            break
        a, b, f = best[0]["a"], best[0]["b"], best[0]["f"]
        rows.append((rank, a, b, int(f)))
        # non-overlapping left-to-right merge application (see module doc)
        pf = (
            pf.select(
                F.regexp_replace(
                    F.concat(F.lit(","), F.col("state"), F.lit(",")),
                    F.lit(f",{a},{b}(?=,)"),
                    F.lit(f",{a}{b}"),
                ).alias("padded"),
                "freq",
            )
            .select(
                F.expr("substring(padded, 2, length(padded)-2)").alias("state"),
                "freq",
            )
            .localCheckpoint(eager=True)
        )
    return spark.createDataFrame(
        rows, "rank int, left_hex string, right_hex string, freq long"
    )


def subword_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    key_col: str = "url",
) -> DataFrame:
    """(key, n_pretokens, n_subwords): per-document token counts after
    applying the ranked merge table SEQUENTIALLY in rank order — each rule
    applied once, globally, left-to-right non-overlapping. That is exactly
    the segmentation training itself produced (each round applies one
    merge globally), so on the training corpus these counts ARE the
    training-final symbol counts. (kit.BPE.encode uses the rank-priority
    order instead; the two agree on tables BPE training can emit, where
    every rule's operands come from strictly earlier rules.)

    ``merges`` is the (left_hex, right_hex) list in rank order — the
    k-row model from :func:`train_bpe_merges`, a driver-side literal, so
    the whole apply chain is k codegen'd regexp_replace passes: no
    Python in the per-document path, no shuffle before the final per-key
    rollup. Documents with no pre-token pieces keep a 0-count row (doc-id
    spine left join)."""
    hexdigits = set("0123456789abcdef")
    for a, b in merges:
        if not (a and b and set(a) <= hexdigits and set(b) <= hexdigits):
            raise ValueError(f"merge symbols must be lowercase hex: {(a, b)}")
    hexed = docs.select(
        key_col,
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_PATTERN), F.lit(0))
        ).alias("piece"),
    ).select(
        key_col, F.lower(F.hex(F.encode("piece", "utf-8"))).alias("h")
    ).where(F.length("h") > 0)
    padded = hexed.select(
        key_col,
        F.expr(
            "',' || array_join(transform(sequence(1, length(h) DIV 2),"
            " i -> substring(h, (i-1)*2+1, 2)), ',') || ','"
        ).alias("padded"),
    )
    state = F.col("padded")
    for a, b in merges:
        # one non-overlapping left-to-right pass (module doc: the engine
        # resumes after each consumed match; the lookahead asserts the
        # right boundary without consuming the next pair's comma)
        state = F.regexp_replace(state, F.lit(f",{a},{b}(?=,)"), F.lit(f",{a}{b}"))
    per_piece = padded.select(key_col, state.alias("padded")).select(
        key_col,
        F.size(
            F.split(F.expr("substring(padded, 2, length(padded)-2)"), ",")
        ).alias("n_sym"),
    )
    counts = per_piece.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_pretokens"),
        F.sum("n_sym").alias("n_subwords"),
    )
    spine = docs.select(key_col).distinct()
    return spine.join(counts, key_col, "left").select(
        key_col,
        F.coalesce("n_pretokens", F.lit(0)).cast("long").alias("n_pretokens"),
        F.coalesce("n_subwords", F.lit(0)).cast("long").alias("n_subwords"),
    )


def _wordpiece_candidates(words: DataFrame, max_len: int) -> DataFrame:
    """All WordPiece piece candidates per distinct word: word-initial
    substrings verbatim, continuations '##'-prefixed (the BERT wire
    convention; callers must guarantee '#' is not a corpus character —
    the contract query's corpus has none). One row per (word, start,
    length) with start/length 1-based; weighted by the word's corpus
    occurrence count downstream."""
    spans = F.expr(
        f"flatten(transform(sequence(1, length(word)), i ->"
        f" transform(sequence(i, least(i + {max_len - 1}, length(word))),"
        f" j -> named_struct('i', i, 'l', j - i + 1))))"
    )
    return words.select(
        "word",
        "cnt",
        F.explode(spans).alias("s"),
    ).select(
        "word",
        "cnt",
        F.col("s.i").alias("pos"),
        F.col("s.l").alias("l"),
        F.when(
            F.col("s.i") == 1, F.expr("substring(word, s.i, s.l)")
        )
        .otherwise(F.concat(F.lit("##"), F.expr("substring(word, s.i, s.l)")))
        .alias("piece"),
    )


def _distinct_words(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def wordpiece_vocab(
    docs: DataFrame,
    text_col: str = "text",
    max_len: int = 6,
    min_count: int = 3,
) -> DataFrame:
    """WordPiece-style vocabulary trainer (the BERT tokenizer family —
    the third mainstream subword algorithm next to the trained byte-BPE
    and the GPT-2 merge-table path): every word-initial / '##'-marked
    continuation substring up to ``max_len`` chars whose corpus-weighted
    frequency reaches ``min_count``, plus ALL single-character pieces in
    both forms unconditionally (the fallback that guarantees greedy
    segmentation never fails — exactly why BERT's vocab always contains
    the byte alphabet).

    Scale shape: word rollup (one shuffle, distinct-words-sized output —
    the corpus text never leaves the first aggregation), candidate
    explode bounded by max_len x word length over DISTINCT words only,
    one piece-keyed partial-agg shuffle. Output (piece, freq, is_char).
    """
    cand = _wordpiece_candidates(_distinct_words(docs, text_col), max_len)
    return (
        cand.groupBy("piece")
        .agg(F.sum(F.col("cnt")).cast("bigint").alias("freq"))
        .withColumn(
            "is_char",
            (
                F.length("piece")
                - F.when(F.col("piece").startswith("##"), F.lit(2)).otherwise(
                    F.lit(0)
                )
                == 1
            ).cast("int"),
        )
        .where((F.col("freq") >= min_count) | (F.col("is_char") == 1))
    )


def wordpiece_counts(
    docs: DataFrame,
    text_col: str = "text",
    max_len: int = 6,
    min_count: int = 3,
) -> DataFrame:
    """Corpus piece counts under greedy longest-match-first WordPiece
    segmentation with the :func:`wordpiece_vocab` trained on the SAME
    corpus — trainer and tokenizer composed end to end, fully JVM-side.

    The greedy chain is followed WITHOUT iteration or Python: the greedy
    step at (word, position) is path-independent, so the per-position
    longest vocab match ("steps") is one max-aggregate over the
    vocab-filtered candidate set, each word gathers its own steps into a
    sorted array, and ONE fold over the word's characters
    (``aggregate(sequence(1, len))``) walks the chain — consuming a piece
    whenever the iteration index reaches the current position, skipping
    otherwise. No per-word loop, no driver round-trips, no UDF; the only
    shuffles are the word rollup, the piece-keyed vocab aggregation, and
    the final piece-count aggregation (all partial-agg'd).

    Output: (piece, n) — occurrences weighted by word frequency, exact.
    """
    words = _distinct_words(docs, text_col)
    cand = _wordpiece_candidates(words, max_len)
    vocab = wordpiece_vocab(docs, text_col, max_len, min_count).select("piece")
    steps = (
        cand.join(vocab, "piece", "left_semi")
        .groupBy("word", "pos")
        .agg(F.max("l").alias("l"))
    )
    nxt = steps.groupBy("word").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("pos").alias("pos"), F.col("l").alias("l")))
        ).alias("nxt")
    )
    walk = F.expr(
        """
        aggregate(
          sequence(1, length(word)),
          named_struct('pos', 1, 'ps', CAST(array() AS array<string>)),
          (acc, i) -> IF(i <> acc.pos, acc,
            named_struct(
              'pos', acc.pos + element_at(filter(nxt, x -> x.pos = acc.pos), 1).l,
              'ps', array_append(acc.ps,
                IF(acc.pos = 1,
                   substring(word, 1,
                     element_at(filter(nxt, x -> x.pos = acc.pos), 1).l),
                   concat('##', substring(word, acc.pos,
                     element_at(filter(nxt, x -> x.pos = acc.pos), 1).l)))))),
          acc -> acc.ps)
        """
    )
    seg = words.join(nxt, "word").select("cnt", walk.alias("pieces"))
    return (
        seg.select(F.explode("pieces").alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("n"))
    )


def tokenizer_comparison(
    docs: DataFrame,
    text_col: str = "text",
    max_len: int = 6,
    min_count: int = 3,
) -> DataFrame:
    """The which-tokenizer decision table: corpus unit totals and
    fertility (units per whitespace word, exact ppm) for the three
    shipped families over the SAME text — whitespace words, the BPE
    byte-level pre-tokenizer, and greedy WordPiece with its
    corpus-trained vocab. Mixture designs divide token budgets by
    exactly this table; computing it inside the engine keeps the choice
    measured instead of assumed.

    One corpus scan covers the two regex families (a single two-column
    aggregate); the WordPiece total reuses :func:`wordpiece_counts`'
    shuffles; the three 1-row aggregates cross-join as broadcast
    waterlines and unpivot in-plan to one row per tokenizer.
    """
    from text_to_graph_spark.kit.bpe import PRETOKEN_PATTERN

    base = docs.agg(
        F.sum(
            F.size(F.filter(F.split(F.col(text_col), " "), lambda t: t != ""))
        )
        .cast("bigint")
        .alias("n_words"),
        F.sum(
            F.size(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(PRETOKEN_PATTERN), F.lit(0)
                )
            )
        )
        .cast("bigint")
        .alias("n_pre"),
    )
    wp = wordpiece_counts(docs, text_col, max_len, min_count).agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_wp")
    )
    one = base.crossJoin(wp)  # two 1-row aggregates — waterline pattern
    rows = F.array(
        F.struct(
            F.lit("whitespace").alias("tokenizer"),
            F.col("n_words").alias("n_units"),
        ),
        F.struct(
            F.lit("bpe_pretoken").alias("tokenizer"),
            F.col("n_pre").alias("n_units"),
        ),
        F.struct(
            F.lit("wordpiece").alias("tokenizer"),
            F.col("n_wp").alias("n_units"),
        ),
    )
    return (
        one.select(F.col("n_words"), F.explode(rows).alias("t"))
        .select(
            F.col("t.tokenizer").alias("tokenizer"),
            F.col("t.n_units").alias("n_units"),
            # whitespace fertility is definitionally 1.0 (n_words / n_words);
            # emitting the constant keeps the degenerate zero-word corpus in
            # agreement with the oracle, which hardcodes the same constant
            F.when(F.col("t.tokenizer") == "whitespace", F.lit(1000000))
            .otherwise(
                F.expr("t.n_units * 1000000 DIV greatest(n_words, 1)")
            )
            .cast("bigint")
            .alias("units_per_word_ppm"),
        )
    )
