"""Cross-engine-deterministic scalar helpers.

``round()`` is NOT portable across engines: Spark rounds the double's
shortest decimal representation via BigDecimal HALF_UP, DuckDB scales the
binary double — at half boundaries (systematic when inputs are themselves
decimal-quantized) they disagree. ``round_half_up`` instead computes
``floor(x * 10^d + 0.5) / 10^d``: pure double ops, so two engines that built
the same double always produce the same result.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def round_half_up(col, digits: int):
    scale = F.lit(float(10**digits))
    return F.floor(col * scale + F.lit(0.5)) / scale


def sql_round_half_up(expr: str, digits: int) -> str:
    scale = float(10**digits)
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"
