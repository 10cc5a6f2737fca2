"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship classification pipeline at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB oracle SQL where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _registry():
    from swat_mapreduce_spark.queries import load_all

    return load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from swat_mapreduce_spark.operators.classify import classify_pipeline
    from swat_mapreduce_spark.session import ensure_engine_conf

    ensure_engine_conf(spark)
    return classify_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from swat_mapreduce_spark.session import ensure_engine_conf

    out = {}
    for name, q in _registry().items():
        def run(spark, sf_dir, _fn=q.spark_fn):
            ensure_engine_conf(spark)
            return _fn(spark, sf_dir)

        out[name] = run
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB SQL equivalents (pre-registered views: region nation
    customer supplier part orders lineitem events documents
    embeddings). Queries without an entry get a rows-only check."""
    return {
        name: q.oracle
        for name, q in _registry().items()
        if q.oracle is not None
    }
