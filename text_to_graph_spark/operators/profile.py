"""Table profiling — the data-quality report a pipeline runs before
trusting a new corpus drop (null explosions, cardinality collapse, and
range drift are how upstream schema breaks surface at 100 TB).

``column_profile`` computes per-column stats in ONE scan: a single
aggregate row with four metrics per column (count / nulls via count
difference / exact distinct / min / max), then an in-plan explode of a
struct array pivots it to one row per column. No per-column scan, no
driver-side loop — the whole profile is one partial-agg exchange
regardless of column count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["column_profile", "constraint_audit"]


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: (col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value) — min/max rendered as strings so the profile has
    one schema for any column mix. Distinct counts are exact (the profile
    is a correctness gate, not a dashboard; swap in approx_count_distinct
    when a sketch is acceptable)."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.count_distinct(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").cast("bigint").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).cast("bigint").alias("n_nulls"),
                F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def constraint_audit(
    dfs: "dict[str, DataFrame]",
    constraints: "list[dict]",
) -> DataFrame:
    """Declarative data-quality constraint audit — the expectations gate a
    pipeline runs before promoting a corpus drop (the constraint KINDS are
    the ones every warehouse checker ships: key uniqueness, null bounds,
    value predicates, referential integrity).

    ``constraints`` is a list of dicts, each one of:

    - ``{"kind": "unique", "table": t, "col": c}`` — c has no duplicate
      non-null values; violations = extra rows beyond one per value.
    - ``{"kind": "not_null", "table": t, "col": c}`` — violations = nulls.
    - ``{"kind": "check", "table": t, "name": n, "expr": sql}`` —
      violations = rows where the SQL predicate is false or null.
    - ``{"kind": "foreign_key", "table": t, "col": c, "ref_table": r,
      "ref_col": rc}`` — violations = non-null child values with no
      parent (left_anti against the distinct parent keys, the same shape
      the cache-resume anti-join uses).

    One output row per constraint: (constraint, n_checked, n_violations,
    passed) — each constraint is its own aggregate job unioned into one
    result (constraint count is config-scale; each underlying check is a
    partial-agg'd scan or an anti-join, never a window or a sort).
    """
    results = None
    for c in constraints:
        df = dfs[c["table"]]
        if c["kind"] == "unique":
            col = c["col"]
            name = f"unique:{c['table']}.{col}"
            per = (
                df.where(F.col(col).isNotNull())
                .groupBy(col)
                .agg(F.count(F.lit(1)).alias("n"))
            )
            out = per.agg(
                F.lit(name).alias("constraint"),
                F.coalesce(F.sum("n"), F.lit(0))
                .cast("bigint")
                .alias("n_checked"),
                F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
                .cast("bigint")
                .alias("n_violations"),
            )
        elif c["kind"] == "not_null":
            col = c["col"]
            name = f"not_null:{c['table']}.{col}"
            out = df.agg(
                F.lit(name).alias("constraint"),
                F.count(F.lit(1)).cast("bigint").alias("n_checked"),
                (F.count(F.lit(1)) - F.count(col))
                .cast("bigint")
                .alias("n_violations"),
            )
        elif c["kind"] == "check":
            name = f"check:{c['table']}.{c['name']}"
            ok = F.expr(c["expr"])
            out = df.agg(
                F.lit(name).alias("constraint"),
                F.count(F.lit(1)).cast("bigint").alias("n_checked"),
                F.sum(
                    F.when(ok.isNull() | ~ok, F.lit(1)).otherwise(F.lit(0))
                )
                .cast("bigint")
                .alias("n_violations"),
            )
        elif c["kind"] == "foreign_key":
            col, ref = c["col"], dfs[c["ref_table"]]
            name = (
                f"foreign_key:{c['table']}.{col}->"
                f"{c['ref_table']}.{c['ref_col']}"
            )
            child = df.where(F.col(col).isNotNull()).select(col)
            orphans = child.join(
                ref.select(F.col(c["ref_col"]).alias(col)).distinct(),
                col,
                "left_anti",
            )
            out = child.agg(
                F.lit(name).alias("constraint"),
                F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            ).crossJoin(
                orphans.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_violations")
                )
            )  # two 1-row aggregates — the documented waterline pattern
        else:
            raise ValueError(f"unknown constraint kind: {c['kind']}")
        out = out.select(
            "constraint",
            "n_checked",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
        results = out if results is None else results.unionByName(out)
    if results is None:
        raise ValueError("constraint_audit: empty constraint list")
    return results
