"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (t-digest quantiles of text length per
lang) at sf0.001.  ``queries()``/``oracle_sql()`` — the correctness-gated
catalog from ``sketchlib.spark.queries`` (each Spark plan vs its DuckDB
oracle at sf0.01).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sketchlib.spark.queries import q_td_quantiles_by_lang

    return q_td_quantiles_by_lang(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sketchlib.spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sketchlib.spark.queries import ORACLES

    return dict(ORACLES)
