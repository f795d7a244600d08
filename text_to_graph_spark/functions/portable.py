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


# MinHash permutation family: h_i(s) = (a_i * (md5_60(s) mod p) + b_i) mod p
# over p = 2^31 - 1. One md5 per shingle (the 60-bit hex prefix, the repo's
# standard portable integer hash) feeds every permutation as int64
# multiply-add — products stay < 2^62, so both engines compute exact int64
# math and the per-band min aggregates over FIXED-WIDTH bigints (codegen'd
# HashAggregate; a min over md5 hex strings is a var-length agg buffer,
# which forces SortAggregate and re-sorts every shingle row per map task).
MINHASH_P = (1 << 31) - 1


def minhash_coeffs(n: int, p: int = MINHASH_P) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs, i in [0, n): md5-derived constants
    (no RNG), identical on every engine that bakes them in as literals."""
    import hashlib

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    return [(h60(f"a{i}") % (p - 1) + 1, h60(f"b{i}") % p) for i in range(n)]
