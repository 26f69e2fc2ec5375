"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query on /root/testdata/sf0.001.
``queries()`` / ``oracle_sql()`` — operator registry + DuckDB oracles;
implementations live in ``entity_knowledge_in_bert_spark.plans.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from entity_knowledge_in_bert_spark.plans import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: mention detection + entity counts over the sf0.001
    documents table (scan -> filter -> explode -> broadcast join -> agg)."""
    return _q.flagship_mention_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
