"""swat_mapreduce_spark — a PySpark-native analytics engine.

A ground-up Spark reimplementation of the query and data-processing
capabilities of the reference repo ``thanhbinh2701/SWAT_mapreduce`` (a
Hadoop MapReduce batch-inference pipeline, see SURVEY.md), extended with
the general relational layer and LLM-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis) that a 100 TB
training-data pipeline needs.

Design principles (SURVEY.md §7):
  * DataFrame/SQL first — declare logical plans, let Catalyst/Tungsten
    pick physical strategy (predicate pushdown, column pruning,
    broadcast, AQE).
  * UDFs only where built-ins can't express the semantics, and then
    Arrow-batched (``mapInPandas`` / ``pandas_udf``), never row-at-a-time.
  * Every operator is deterministic and (where SQL-expressible)
    oracle-checked against DuckDB on the same parquet inputs.
"""

__version__ = "0.1.0"

from swat_mapreduce_spark.session import get_spark  # noqa: F401
