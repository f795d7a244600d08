"""Local replica of the driver's correctness gate.

Runs every ``queries()[name]`` on Spark and the matching ``oracle_sql()[name]``
on DuckDB over the same sf dir, then compares row count, column names, and
order-insensitive values (columns sorted by name, rows sorted, exact value
equality with numeric-width tolerance). Exit code 1 if any query mismatches.

Usage: PYTHONPATH=/root/repo python3 tools/check_correctness.py [sf_dir]
       [--replicate N] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from text_to_graph_spark.sources.pages import TABLES  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("bool")
        else:
            out[c] = s.astype("string")
    n = pd.DataFrame(out)
    return n.sort_values(by=list(n.columns), ignore_index=True)


def compare(name: str, spark_df, duck_df) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(
            f"columns: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
        )
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount: spark={len(spark_df)} duck={len(duck_df)}")
    a, b = normalize(spark_df), normalize(duck_df)
    if len(a) == len(b):
        for c in a.columns:
            if a[c].dtype != b[c].dtype:
                problems.append(f"dtype[{c}]: {a[c].dtype} vs {b[c].dtype}")
        neq = ~(
            (a.values == b.values)
            | (pd.isna(a).values & pd.isna(b).values)
        )
        if neq.any():
            i, j = np.argwhere(neq)[0]
            problems.append(
                f"value mismatch first at row {i} col {a.columns[j]}: "
                f"spark={a.iloc[i, j]!r} duck={b.iloc[i, j]!r} "
                f"({neq.sum()} cells differ)"
            )
    return problems


def schema_audit(sf_dir: str) -> int:
    """Fail on any non-scalar output column in any contract query — the
    driver's pandas canonicalizer cannot sort array/map/struct cells
    (kg_random_walks failed CORRECTNESS_r02 exactly this way)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from text_to_graph_spark.session import get_spark

    spark = get_spark(master="local[8]")
    offenders = []
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    for o in offenders:
        print(f"NON-SCALAR {o}")
    print(f"\n{len(offenders)} non-scalar output columns "
          f"across {len(entrymod.queries())} queries")
    return 1 if offenders else 0


def _tile_oracle(sql: str, replicate: int) -> str:
    """Rewrite an oracle's replicate=1 pages CTE to the deterministic
    ``replicate``-way tiling bench.py uses (copy k of doc d gets url
    suffix /k, identical html/text/warc_ts) — so the flagship family can
    be value-verified at bench-scale volume, not just timed. Oracles
    without the pages CTE are returned unchanged (their Spark twin reads
    documents directly and is equally unreplicated)."""
    from text_to_graph_spark.sources.pages import PAGES_ORACLE_CTE

    base = PAGES_ORACLE_CTE.strip()
    if base not in sql or replicate <= 1:
        return sql
    tiled = base.replace("|| '/0' AS url", "|| '/' || g.k AS url").replace(
        "FROM documents\n)",
        f"FROM documents, unnest(generate_series(0, {replicate - 1})) AS g(k)\n)",
    )
    assert tiled != base, "pages CTE shape changed; update _tile_oracle"
    return sql.replace(base, tiled)


def main() -> int:
    import os

    argv = [a for a in sys.argv[1:] if a != "--schema-audit"]
    replicate = 1
    if "--replicate" in argv:
        i = argv.index("--replicate")
        replicate = int(argv[i + 1])
        del argv[i : i + 2]
        # the Spark side tiles inside __spark_entry__._stages
        os.environ["SPARK_GRAFT_GATE_REPLICATE"] = str(replicate)
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    if "--schema-audit" in sys.argv:
        return schema_audit(sf_dir)
    only = set(argv[1:])

    from text_to_graph_spark.session import get_spark

    spark = get_spark(master="local[8]")
    con = duck_connection(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows ({time.monotonic()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(_tile_oracle(oracles[name], replicate)).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        dt = time.monotonic() - t0
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(sdf)} rows, {dt:.1f}s): " + "; ".join(problems))
        else:
            print(f"ok   {name} ({len(sdf)} rows, {dt:.1f}s)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
