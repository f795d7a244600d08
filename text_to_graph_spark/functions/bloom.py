"""Blocked Bloom filter for big⋈big join pruning — pure built-ins.

Spark's own runtime bloom (``bloom_filter_agg``) is not SQL-registered in
this build, so the engine carries its own: the filter is a table of
``n_buckets`` longs built with one tiny ``bit_or`` aggregation over the key
side, broadcast to the probe side, and checked with a bitwise AND ahead of
the exact shuffle join.

Why this matters at 100 TB: a fact⋈keys equi-join shuffles the *entire*
fact table even when only a few percent of rows survive the join. Probing a
broadcast Bloom first drops non-matching rows before the exchange, shrinking
shuffle I/O by roughly the join selectivity at the cost of one broadcast of
``n_buckets * 8`` bytes (default 8 KiB). False positives only waste a little
shuffle (they are dropped by the exact join); false negatives are impossible
— correctness never depends on the filter, so the oracle for any query using
it is the plain join SQL.

Sizing: with one hash per key (k=1, a "blocked" Bloom), the false-positive
rate is ≈ n_keys / (64 * n_buckets). Default 1024 buckets = 65536 bits keeps
fp < 10% up to ~6k distinct keys; size ``n_buckets`` to the key-side
cardinality at real scale (2^20 buckets = 8 MiB broadcast covers ~6M keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_bit(key: Column, n_buckets: int) -> tuple[Column, Column]:
    h = F.xxhash64(key)
    bucket = F.pmod(h, F.lit(n_buckets)).cast("int")
    bit = F.pmod(h.bitwiseXOR(F.shiftright(h, 17)), F.lit(64)).cast("int")
    return bucket, bit


def _maybe_member() -> Column:
    """Membership test over the joined (_bit, bloom_bits) columns.

    Never null: an empty bucket (left-join miss) is a definite non-member.
    """
    return F.col("bloom_bits").isNotNull() & (
        F.col("bloom_bits").bitwiseAND(
            F.expr("shiftleft(CAST(1 AS bigint), _bit)")
        )
        != 0
    )


def build_bloom(keys: DataFrame, key_col: str, n_buckets: int = 1024) -> DataFrame:
    """Aggregate the key side into (bucket, bits) — ``n_buckets`` rows.

    One partial-agg'd exchange over the bucket id; the output is small
    enough to broadcast regardless of key-side row count.
    """
    bucket, bit = _bucket_bit(F.col(key_col), n_buckets)
    return (
        keys.select(bucket.alias("bloom_bucket"), bit.alias("bit"))
        .groupBy("bloom_bucket")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS bigint), bit)")).alias("bloom_bits"))
    )


def bloom_prune(fact: DataFrame, key_col: str, bloom: DataFrame,
                n_buckets: int = 1024) -> DataFrame:
    """Keep only fact rows whose key *may* be in the bloom.

    Broadcast hash join on the bucket id (no shuffle of the fact side),
    then a bitwise membership check. Superset semantics: every matching row
    survives; non-members survive only at the fp rate.
    """
    bucket, bit = _bucket_bit(F.col(key_col), n_buckets)
    probed = fact.withColumn("bloom_bucket", bucket).withColumn("_bit", bit)
    return (
        probed.join(F.broadcast(bloom), "bloom_bucket", "left")
        .where(_maybe_member())
        .drop("bloom_bucket", "_bit", "bloom_bits")
    )


def bloom_pruned_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact inner equi-join with Bloom pre-pruning of the fact side.

    Result is identical to ``fact.join(keys, fact.key == keys.key)`` — the
    bloom only reduces what reaches the exchange. Use when BOTH sides are too
    big to broadcast but the join is selective on the fact side.
    """
    bloom = build_bloom(keys, keys_key, n_buckets)
    pruned = bloom_prune(fact, fact_key, bloom, n_buckets)
    return pruned.join(keys, pruned[fact_key] == keys[keys_key], "inner")


def bloom_anti_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact left-anti equi-join with a Bloom fast path for non-members.

    Result is identical to ``fact.join(keys, on=key, "left_anti")``, but rows
    whose key *fails* the broadcast Bloom are definite non-members and join
    the output directly — they never reach the anti-join's exchange. Only the
    bloom-positive sliver (true members + fp-rate noise) pays the shuffle for
    the exact check. In the crawl-frontier shape (most discovered links point
    outside the crawled set) this skips the shuffle for the bulk of the fact
    table; correctness never depends on the filter.

    Cost note: the negative/positive split makes the fact side appear in two
    plan branches, i.e. two scans of the fact table. Two scans + a sliver
    shuffle beats one scan + a full shuffle whenever the join is selective
    (shuffle writes+reads+sorts cost more per byte than a columnar re-scan);
    for an already-computed fact (not a raw scan), ``localCheckpoint`` it
    first to pay the compute once.
    """
    bucket, bit = _bucket_bit(F.col(fact_key), n_buckets)
    bloom = build_bloom(keys, keys_key, n_buckets)
    probed = (
        fact.withColumn("bloom_bucket", bucket)
        .withColumn("_bit", bit)
        .join(F.broadcast(bloom), "bloom_bucket", "left")
    )
    maybe_member = _maybe_member()
    aux = ["bloom_bucket", "_bit", "bloom_bits"]
    negatives = probed.where(~maybe_member).drop(*aux)
    positives = probed.where(maybe_member).drop(*aux)
    checked = positives.join(
        keys, positives[fact_key] == keys[keys_key], "left_anti"
    )
    return negatives.unionByName(checked)
