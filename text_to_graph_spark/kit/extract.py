"""Deterministic batched extraction models (the replaced "AI step").

The reference sends each chunk to an LLM and gets back two CSV tables —
mentions (``prompts.py:3-11``) and nodes+edges
(``graph_extractor/src/prompts.py:50-83``): nodes ``id,entity,category`` with
per-chunk ids from 0, edges ``source,target,relationship`` with a short
active-voice predicate, directed, articles excluded. Per the build contract
the LLM is replaced by *deterministic batched model inference*: same
contract, pure function of the chunk text, executed vectorized over whole
Arrow batches inside ``mapInPandas`` (no per-row Python in the hot path).

Two interchangeable models:

- :class:`VocabModel` — closed-vocabulary model for the corpus-style tables
  in ``/root/testdata`` (lowercase token streams): entity nouns, predicate
  verbs, articles/adjectives ignored. A triple is every token trigram
  ``ENTITY PREDICATE ENTITY``. Fully vectorized via explode+shift.
- :class:`ProseModel` — capitalized-span model for natural-language prose
  (the reference's own fixture style, ``response_parser.py:252-573``):
  mentions are capitalized spans (articles stripped per the prompt contract),
  triples link adjacent mentions within one sentence through the normalized
  connecting words.

Both emit *positional* frames so the caller can reconstruct the reference's
first-occurrence ordering guarantees deterministically.
"""

from __future__ import annotations

import re

import pandas as pd

# ---------------------------------------------------------------------------
# VocabModel — closed vocabulary over the synthetic web-corpus token stream
# ---------------------------------------------------------------------------

ENTITY_CATEGORIES: dict[str, str] = {
    "customer": "actor",
    "spark": "system",
    "query": "system",
    "agg": "system",
    "table": "storage",
    "row": "storage",
    "column": "storage",
    "key": "storage",
    "part": "storage",
    "batch": "storage",
    "value": "data",
    "data": "data",
    "stream": "data",
    "vector": "data",
    "hash": "data",
    "order": "data",
    "window": "data",
    "line": "data",
    "dup": "data",
}

PREDICATES: tuple[str, ...] = ("join", "scan", "merge", "filter", "sort", "group")

# articles + adjectives — excluded from mentions per the reference prompt
# contract ("Exclude articles", prompts.py:8)
STOPWORDS: tuple[str, ...] = ("the", "a", "fast", "slow", "small", "big")

_ENTITIES = frozenset(ENTITY_CATEGORIES)
_PREDSET = frozenset(PREDICATES)


class VocabModel:
    """Deterministic extraction over a closed vocabulary.

    mention  := any token in ENTITY_CATEGORIES
    triple   := tokens (t[i], t[i+1], t[i+2]) with t[i],t[i+2] entities and
                t[i+1] a predicate (sliding window — overlapping trigrams all
                count)
    category := ENTITY_CATEGORIES[mention]
    """

    name = "vocab-v1"

    @staticmethod
    def _token_frame(texts: pd.Series) -> pd.DataFrame:
        """Explode a batch of texts into (row, pos, w) — vectorized."""
        toks = texts.fillna("").str.split(" ")
        out = toks.explode().rename("w").reset_index()
        out.columns = ["row", "w"]
        out["pos"] = out.groupby("row").cumcount()
        return out

    def mentions(self, texts: pd.Series) -> pd.DataFrame:
        """Return (row, pos, mention) for every entity-token occurrence."""
        tf = self._token_frame(texts)
        return tf[tf["w"].isin(_ENTITIES)].rename(columns={"w": "mention"})[
            ["row", "pos", "mention"]
        ]

    def triples(self, texts: pd.Series) -> pd.DataFrame:
        """Return (row, pos, subj, pred, obj) for every trigram match."""
        tf = self._token_frame(texts)
        g = tf.groupby("row")["w"]
        tf = tf.assign(w1=g.shift(-1), w2=g.shift(-2))
        m = (
            tf["w"].isin(_ENTITIES)
            & tf["w1"].isin(_PREDSET)
            & tf["w2"].isin(_ENTITIES)
        )
        out = tf[m].rename(columns={"w": "subj", "w1": "pred", "w2": "obj"})
        return out[["row", "pos", "subj", "pred", "obj"]]

    @staticmethod
    def category(label: str) -> str:
        return ENTITY_CATEGORIES.get(label.lower(), "entity")


# ---------------------------------------------------------------------------
# ProseModel — capitalized spans for natural-language fixtures
# ---------------------------------------------------------------------------

_MENTION_RE = re.compile(r"[A-Z][A-Za-z]+(?: [A-Z][A-Za-z]+)*")
# splitting a sentence by the capturing mention pattern yields strictly
# alternating [gap, mention, gap, mention, ..., gap] pieces whose
# concatenation is the sentence — the vectorized equivalent of finditer()
# with the interstitial text preserved for connector extraction
_MENTION_SPLIT = f"({_MENTION_RE.pattern})"
_SENT_PAT = r"(?<=[.!?])\s+"
_ARTICLE_PREFIX = r"(?i)^(?:(?:the|an|a) )+"
_ARTICLE_ONLY = r"(?i)^(?:the|an|a)$"
_CONNECTOR_DROP = frozenset({"the", "a", "an", "of", "to", "and", "then"})
_ORG_SUFFIXES = ("Inc", "Ltd", "GmbH", "Corp", "BV")

_EMPTY_MENTIONS = {"row": [], "pos": [], "mention": []}
_EMPTY_TRIPLES = {"row": [], "pos": [], "subj": [], "pred": [], "obj": []}


def _clean_spans(spans: pd.Series) -> pd.Series:
    """Strip leading articles from capitalized spans (prompt contract:
    "Exclude articles"); a span that is nothing but articles cleans to ''."""
    return spans.str.replace(_ARTICLE_PREFIX, "", regex=True).str.replace(
        _ARTICLE_ONLY, "", regex=True
    )


def _piece_frame(strs: pd.Series, key: str) -> pd.DataFrame:
    """Explode strings into mention/gap pieces with char offsets — vectorized.

    Output columns: ``key`` (the input's group id), ``piece``, ``pidx``
    (piece ordinal; odd = mention span), ``pstart`` (char offset of the piece
    inside its string).
    """
    parts = strs.str.split(_MENTION_SPLIT, regex=True)
    p = parts.explode().rename("piece").reset_index()
    p.columns = [key, "piece"]
    p["piece"] = p["piece"].fillna("")
    p["pidx"] = p.groupby(key).cumcount()
    plen = p["piece"].str.len()
    p["pstart"] = plen.groupby(p[key]).cumsum() - plen
    return p


class ProseModel:
    """Deterministic extraction over capitalized prose.

    mention := maximal capitalized span, leading article stripped, dropped if
               empty afterwards (prompt contract: "Exclude articles")
    triple  := adjacent mention pair within a sentence whose connecting words
               (lowercased, connector stopwords removed) number 1..3; the
               predicate is their '_'-join (reference prompt demands a short
               active-voice predicate, prompts.py:64)

    Both passes are vectorized pandas string ops over the whole Arrow batch
    (split-by-capturing-pattern + groupby cumsum/shift) — no per-row Python
    regex loop in the hot path.
    """

    name = "prose-v1"

    def mentions(self, texts: pd.Series) -> pd.DataFrame:
        p = _piece_frame(texts.fillna(""), "row")
        m = p[p["pidx"] % 2 == 1]
        if m.empty:
            return pd.DataFrame(_EMPTY_MENTIONS)
        cleaned = _clean_spans(m["piece"])
        keep = cleaned != ""
        return pd.DataFrame(
            {
                "row": m.loc[keep, "row"].to_numpy(),
                "pos": m.loc[keep, "pstart"].to_numpy(),
                "mention": cleaned[keep].to_numpy(),
            }
        )

    def triples(self, texts: pd.Series) -> pd.DataFrame:
        # sentence frame: (row, sid, sent, offset) — offset reproduces the
        # reference accumulation offset += len(sentence) + 1
        s = (
            texts.fillna("")
            .str.strip()
            .str.split(_SENT_PAT, regex=True)
            .explode()
            .rename("sent")
            .reset_index()
        )
        s.columns = ["row", "sent"]
        s["sent"] = s["sent"].fillna("")
        s["sid"] = range(len(s))
        slen1 = s["sent"].str.len() + 1
        s["offset"] = slen1.groupby(s["row"]).cumsum() - slen1

        p = _piece_frame(s.set_index("sid")["sent"], "sid")
        is_span = p["pidx"] % 2 == 1
        p["cleaned"] = ""
        p.loc[is_span, "cleaned"] = _clean_spans(p.loc[is_span, "piece"])
        p["surv"] = is_span & (p["cleaned"] != "")
        # mord: for a surviving mention its 1-based ordinal; for any other
        # piece (gaps AND article-only spans) the ordinal of the mention it
        # follows — so grouping non-survivors by (sid, mord) concatenates
        # exactly sentence[end(mention k):start(mention k+1)]
        p["mord"] = p.groupby("sid")["surv"].cumsum()

        m = p.loc[p["surv"], ["sid", "mord", "cleaned", "pstart"]].copy()
        if m.empty:
            return pd.DataFrame(_EMPTY_TRIPLES)
        m["obj"] = m.groupby("sid")["cleaned"].shift(-1)
        pairs = m[m["obj"].notna()]
        if pairs.empty:
            return pd.DataFrame(_EMPTY_TRIPLES)

        gaps = (
            p.loc[~p["surv"]]
            .groupby(["sid", "mord"])["piece"]
            .agg("".join)
            .rename("gap")
            .reset_index()
        )
        pairs = pairs.merge(gaps, on=["sid", "mord"], how="left").reset_index(
            drop=True
        )
        w = pairs["gap"].fillna("").str.findall(r"[A-Za-z]+").explode().str.lower()
        w = w[w.notna() & ~w.isin(_CONNECTOR_DROP)]
        n_conn = w.groupby(level=0).size().reindex(pairs.index, fill_value=0)
        pred = w.groupby(level=0).agg("_".join).reindex(pairs.index)

        pairs = pairs.assign(n_conn=n_conn, pred=pred).merge(
            s[["sid", "row", "offset"]], on="sid"
        )
        out = pairs[(pairs["n_conn"] >= 1) & (pairs["n_conn"] <= 3)]
        return pd.DataFrame(
            {
                "row": out["row"].to_numpy(),
                "pos": (out["offset"] + out["pstart"]).to_numpy(),
                "subj": out["cleaned"].to_numpy(),
                "pred": out["pred"].to_numpy(),
                "obj": out["obj"].to_numpy(),
            }
        )

    @staticmethod
    def category(label: str) -> str:
        if label.isupper():
            return "acronym"
        if label.split(" ")[-1] in _ORG_SUFFIXES:
            return "organization"
        return "entity"


MODELS = {"vocab": VocabModel, "prose": ProseModel}


def get_model(name: str):
    return MODELS[name]()
