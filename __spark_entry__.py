"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship extraction on /root/testdata/sf0.001 —
  constructed XML pages -> XPath //title via a vectorized pandas UDF.
- ``queries()`` / ``oracle_sql()``: one entry per operator (see
  xqspark/queries.py); DuckDB oracles share identical semantics and
  column names.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from xqspark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: XPath title extraction over sf0.001 documents."""
    return QUERIES["xpath_title"](spark, "/root/testdata/sf0.001")


# The driver's correctness harness caps at 50 rows while the catalog has
# grown past it, so dict ORDER decides which ops get a driver row each
# round. Deterministic round-robin: rotate the catalog left by 5 per
# completed round (counted from committed CORRECTNESS_r*.json files).
# The (len-50)-wide dropped window shifts by 5 each round, so every op
# is driver-checked in most rounds and never skipped more than
# ceil((len-50)/5) rounds in a row (VERDICT r4 #1 — before this, the
# last entries past the cap were simply never checked). All ops remain
# DuckDB-oracle-checked in pytest every round regardless
# (test_driver_contract parametrizes the full catalog).
_ROUNDS_DONE = len(
    glob.glob(os.path.join(os.path.dirname(__file__), "CORRECTNESS_r*.json"))
)


def _rotated(d: dict) -> dict:
    keys = list(d)
    k = (_ROUNDS_DONE * 5) % len(keys)
    return {name: d[name] for name in keys[k:] + keys[:k]}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _rotated(ORACLES)
