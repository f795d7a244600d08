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

__all__ = ["column_profile"]


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
