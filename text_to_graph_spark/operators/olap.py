"""Relational OLAP queries over the warehouse tables (TPC-H-shaped).

The KG engine shares its runtime with ordinary warehouse analytics; these
three classic shapes pin the relational fundamentals the 100 TB design
depends on and serve as bench anchors for the join/agg machinery:

- ``pricing_summary`` (Q1 shape): full-scan aggregate — partial aggregation
  (map-side combine) ahead of one exchange; the date filter must reach the
  parquet scan as a pushed predicate.
- ``ship_priority`` (Q3 shape): small-dim broadcast (customer) into a
  shuffle equi-join on the fact key (orders ⋈ lineitem on l_orderkey), then
  agg + deterministic top-k (TakeOrderedAndProject — no global sort).
- ``regional_volume`` (Q5 shape): a snowflake of broadcast dims
  (region → nation → supplier) hash-probed by the fact scan; the only real
  exchanges are the orders⋈lineitem join and the final agg.

All money aggregates are per-row half-up-rounded to integer cents and
summed as bigints — double sums are shuffle-order-dependent (float addition
is non-associative) and would flap under AQE re-planning; the integer form
is bit-stable at any parallelism and engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cents(col) -> "F.Column":
    """Half-up-rounded integer cents (portable: floor(x*100+0.5))."""
    return F.floor(col * F.lit(100.0) + F.lit(0.5)).cast("bigint")


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(_cents(disc_price)).alias("sum_disc_cents"),
            F.sum(_cents(charge)).alias("sum_charge_cents"),
        )
    )


def ship_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """Top-k open orders of one market segment by outstanding revenue."""
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.where(
        F.col("o_orderdate") < F.lit(date).cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    items = lineitem.where(
        F.col("l_shipdate") > F.lit(date).cast("timestamp")
    ).select(
        "l_orderkey",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_cents"),
    )
    return (
        items.join(
            ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey),
            items.l_orderkey == ords.o_orderkey,
        )
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum("rev_cents").alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(k)
    )


def regional_volume(
    region: DataFrame,
    nation: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """Per-nation revenue for suppliers of one region (Q5 shape, without the
    customer-nation equality so every dim chain stays a broadcast probe)."""
    dims = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.where(F.col("r_name") == region_name)),
                    nation.n_regionkey == F.col("r_regionkey"),
                )
            ),
            supplier.s_nationkey == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    items = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_cents"),
    )
    return (
        items.join(F.broadcast(dims), items.l_suppkey == dims.s_suppkey)
        .join(
            orders.select("o_orderkey"),
            items.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum("rev_cents").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def returned_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` customers by revenue lost to returned items (the TPC-H
    Q10 shape): lineitem filtered to returnflag 'R' at the scan, joined up
    the orders -> customer chain, nation as a broadcast dim, revenue in
    exact half-up cents, deterministic top-k (revenue desc, custkey asc)
    via TakeOrderedAndProject — never a global sort.

    Scale shape: the fact scan carries the pushed 'R' filter; orders and
    customer join as hash joins on their keys (both fact-sized — NOT
    broadcast); nation broadcasts. One partial-agg'd rollup on custkey.
    """
    items = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_cents"
        ),
    )
    cust = customer.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    per_cust = (
        items.join(
            orders.select("o_orderkey", "o_custkey"),
            items.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.sum("rev_cents").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_returned_items"),
        )
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            _cents(F.col("c_acctbal")).alias("acctbal_cents"),
            "revenue_cents",
            "n_returned_items",
        )
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(k)
    )


def forecast_revenue(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.02,
    disc_hi: float = 0.04,
    max_qty: int = 24,
) -> DataFrame:
    """Q6 shape: the what-if discount-elimination revenue — a pure
    filter-and-aggregate whose entire predicate (date window, discount
    band, quantity cap) must reach the parquet scan as pushed filters;
    the scan reads 4 columns of 11. The single-row result comes off a
    partial-agg'd global aggregate (no groupBy shuffle at all).
    """
    f = lineitem.where(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        & (F.col("l_discount") >= disc_lo)
        & (F.col("l_discount") <= disc_hi)
        & (F.col("l_quantity") < max_qty)
    )
    return f.agg(
        F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount")))
        .alias("revenue_cents"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


def promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """Q14 shape: share of revenue from promotional parts in a date
    window. The part dim is BROADCAST (parts ≪ lineitem) into the
    filtered fact scan — one hash probe, zero fact-side shuffle; the
    promo share is a conditional sum inside the same single aggregate,
    in integer ppm (DIV) so the ratio is bit-stable.
    """
    f = lineitem.where(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    )
    dim = part.select("p_partkey", "p_type")
    disc = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    agg = (
        f.join(F.broadcast(dim), f["l_partkey"] == dim["p_partkey"])
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("promo_cents"),
            F.sum(disc).cast("bigint").alias("total_cents"),
        )
    )
    return agg.select(
        "promo_cents",
        "total_cents",
        F.when(
            F.col("total_cents") > 0,
            F.expr("(promo_cents * 1000000) DIV total_cents"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("promo_ppm"),
    )
