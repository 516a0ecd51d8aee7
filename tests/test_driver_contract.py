"""Replicates the driver's correctness gate locally: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare
row-count + sorted-column value sets."""

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from xqspark.pipeline import build_session

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def spark():
    s = build_session(cpus=4, app="xq-contract")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, int):
        return int(v)
    return str(v)


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(_norm(row[i]) for i in order))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_vs_oracle(spark, ddb, name):
    qdf = entrymod.queries()[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in qdf.columns]
    spark_rows = [tuple(r) for r in qdf.collect()]

    rel = ddb.sql(entrymod.oracle_sql()[name])
    ddb_cols = [c.lower() for c in rel.columns]
    ddb_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(ddb_rows), f"{name}: row count"
    assert _rows_to_set(spark_cols, spark_rows) == _rows_to_set(ddb_cols, ddb_rows), name


def test_rows_only_queries(spark):
    for name in set(entrymod.queries()) - set(entrymod.oracle_sql()):
        df = entrymod.queries()[name](spark, SF_DIR)
        assert df.count() > 0, name


def test_queries_and_oracles_key_order_identical():
    """The driver-row rotation slices the first 50 entries of BOTH
    dicts; divergent key order would pair a query window with a
    different oracle window (code-review r5 find)."""
    import __spark_entry__ as e
    from xqspark.queries import ORACLES, QUERIES

    assert list(QUERIES) == list(ORACLES)
    assert list(e.queries()) == list(e.oracle_sql())
