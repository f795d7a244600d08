"""Driver-contract surface: entry()/queries()/oracle_sql() shape, plus a fast
DuckDB-checked sample at sf0.001 (the full 32-query gate at sf0.01 lives in
tools/check_correctness.py)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from tests.conftest import SF_SMOKE
from text_to_graph_spark.sources.pages import TABLES
from tools.check_correctness import compare


def test_queries_and_oracles_align():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert len(qs) >= 30
    # every oracle refers to an implemented query
    assert set(oracles) <= set(qs)
    # every contract query carries a DuckDB oracle (zero rows-only queries)
    assert set(qs) == set(oracles)


def test_entry_returns_rows_with_stable_schema(spark):
    df = entry.entry(spark)
    schema1 = [f.name for f in df.schema.fields]
    assert df.count() >= 0
    df2 = entry.entry(spark)
    assert [f.name for f in df2.schema.fields] == schema1


def test_no_complex_types_in_any_contract_output(spark):
    """Driver-gate canonicalizer compatibility: every queries() output
    column must be scalar (the driver's pandas sort_values cannot order
    array/map/struct cells — kg_random_walks failed CORRECTNESS_r02 this
    way). Arrays stay in the operator API; contract boundaries render
    them joined strings (reference export convention, graph_utils.py:68).
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, fn in entry.queries().items():
        df = fn(spark, SF_SMOKE)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, offenders


@pytest.mark.parametrize(
    "name",
    ["kg_extract_text", "kg_triples", "kg_edges", "kg_top_predicates",
     "dedup_exact", "text_tokens"],
)
def test_sample_queries_match_duckdb_at_smoke_sf(spark, name):
    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    sdf = qs[name](spark, SF_SMOKE).toPandas()
    ddf = con.execute(oracles[name]).df()
    problems = compare(name, sdf, ddf)
    assert not problems, problems
