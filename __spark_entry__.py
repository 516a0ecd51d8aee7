"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship extraction on /root/testdata/sf0.001 —
  constructed XML pages -> XPath //title via a vectorized pandas UDF.
- ``queries()`` / ``oracle_sql()``: one entry per operator (see
  xqspark/queries.py); DuckDB oracles share identical semantics and
  column names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from xqspark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: XPath title extraction over sf0.001 documents."""
    return QUERIES["xpath_title"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
