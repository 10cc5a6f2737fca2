"""Lakehouse-shaped operations: custom Python data source scan and
CDC MERGE/upsert semantics.

Spark has no built-in MERGE INTO without a table format (Delta/
Iceberg, not present in this container), but the merge SEMANTICS are a
full-outer join + coalesce — expressed here declaratively so the same
plan runs against any sink. The Python data source query exercises the
Spark 4 ``pyspark.sql.datasource`` API as a first-class, partitioned,
schema-declared table (sources/manifest_source.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

# --- custom Python data source scan ---------------------------------------
# Rows are deterministic md5 functions of the index, so DuckDB can
# regenerate the source's exact content — the scan itself (partition
# planning, per-partition generation, schema) is what's under test.
_DATASOURCE_ROWS = 500
_PYSOURCE_ORACLE = f"""
WITH g AS (SELECT unnest(generate_series(0, {_DATASOURCE_ROWS - 1})) AS i),
p AS (
    SELECT i,
           'src' || (('0x' || substr(md5('manifest:' || i), 1, 2))::INT % 20)
               AS src
    FROM g
)
SELECT src, count(*) AS n, min(i) AS min_idx
FROM p GROUP BY src
"""


@register("python_datasource_scan", oracle=_PYSOURCE_ORACLE)
def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.sources.manifest_source import (
        ManifestDataSource,
    )

    try:
        spark.dataSource.register(ManifestDataSource)
    except Exception:  # noqa: BLE001 - already registered in this session
        pass
    df = (
        spark.read.format("swat_manifest")
        .option("rows", _DATASOURCE_ROWS)
        .option("partitions", 8)
        .load()
    )
    src = F.regexp_extract("image_path", r"/img/(src\d+)/", 1)
    return df.groupBy(src.alias("src")).agg(
        F.count(F.lit(1)).alias("n"), F.min("idx").alias("min_idx")
    )


# --- CDC MERGE / upsert ----------------------------------------------------
# target = current snapshot; source = a change batch carrying updates
# for existing keys (event_id % 3 = 0, value doubled) and inserts of
# new keys (event_id % 7 = 0, shifted key space). MERGE semantics as a
# full-outer join on the key + coalesce precedence (source wins) + a
# per-row action tag — the exact dataflow Delta/Iceberg MERGE INTO
# compiles to, minus the transactional commit. One shuffle on the
# merge key; both sides hash-partition, AQE handles skew.
_UPSERT_ORACLE = """
WITH target AS (
    SELECT event_id, user_id, value FROM events
),
source AS (
    SELECT event_id, user_id, value * 2 AS value
    FROM events WHERE event_id % 3 = 0
    UNION ALL
    SELECT event_id + 10000000, user_id, value
    FROM events WHERE event_id % 7 = 0
)
SELECT coalesce(s.event_id, t.event_id) AS event_id,
       coalesce(s.user_id, t.user_id) AS user_id,
       round(coalesce(s.value, t.value), 4) AS value,
       CASE WHEN s.event_id IS NOT NULL AND t.event_id IS NOT NULL
            THEN 'update'
            WHEN s.event_id IS NOT NULL THEN 'insert'
            ELSE 'keep' END AS action
FROM target t FULL OUTER JOIN source s ON t.event_id = s.event_id
"""


@register("upsert_events_cdc", oracle=_UPSERT_ORACLE)
def upsert_events_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    target = events.select("event_id", "user_id", "value")
    updates = (
        events.filter(F.col("event_id") % 3 == 0)
        .select("event_id", "user_id", (F.col("value") * 2).alias("value"))
    )
    inserts = events.filter(F.col("event_id") % 7 == 0).select(
        (F.col("event_id") + 10_000_000).alias("event_id"),
        "user_id",
        "value",
    )
    source = updates.unionAll(inserts)
    t, s = target.alias("t"), source.alias("s")
    action = (
        F.when(
            F.col("s.event_id").isNotNull()
            & F.col("t.event_id").isNotNull(),
            "update",
        )
        .when(F.col("s.event_id").isNotNull(), "insert")
        .otherwise("keep")
    )
    return t.join(s, F.col("t.event_id") == F.col("s.event_id"), "full_outer").select(
        F.coalesce("s.event_id", "t.event_id").alias("event_id"),
        F.coalesce("s.user_id", "t.user_id").alias("user_id"),
        R.r(F.coalesce("s.value", "t.value"), 4).alias("value"),
        action.alias("action"),
    )
