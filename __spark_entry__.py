"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: the full extraction DAG over a deterministic
               interleaved text+media corpus synthesized from sf0.001.
queries()    — one entry per implemented operator (SURVEY.md §2 plus the
               training-data pipeline operators); implementations live in
               cies_ocr_java_spark/plans/queries.py.
oracle_sql() — the matching DuckDB SQL for every query (all queries are
               fully oracle-checked; none fall back to rows-only).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cies_ocr_java_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["pipeline_end_to_end"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
