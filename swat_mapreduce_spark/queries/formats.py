"""File-format coverage (SURVEY.md §2B row 1): the engine reads and
writes CSV, JSON-lines, ORC and parquet. Each round-trip query writes
the ``documents`` projection through the format and aggregates the
re-read data — the DuckDB oracle aggregates the original parquet
directly, so any loss/corruption in the format path breaks the match.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

_AGG_ORACLE = """
SELECT lang, source, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM documents
GROUP BY lang, source
"""


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str, **opts) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    path = os.path.join(
        tempfile.gettempdir(), f"swat_fmt_{fmt}_{uuid.uuid4().hex[:8]}"
    )
    docs.write.mode("overwrite").format(fmt).options(**opts).save(path)
    back = spark.read.format(fmt).options(**opts)
    if fmt in ("csv", "json"):
        # csv: untyped without it; json: schema inference FAILS on an
        # empty dataset (a 0-row corpus must round-trip, not crash)
        back = back.schema("doc_id long, lang string, source string, n_chars long")
    re_read = back.load(path)
    return re_read.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register("csv_roundtrip_agg", oracle=_AGG_ORACLE)
def csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "csv", header="true")


@register("json_roundtrip_agg", oracle=_AGG_ORACLE)
def json_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "json")


@register("orc_roundtrip_agg", oracle=_AGG_ORACLE)
def orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "orc")


@register("xml_roundtrip_agg", oracle=_AGG_ORACLE)
def xml_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 built-in XML source (the donated spark-xml): write the
    documents projection as ``<row>`` elements, re-read with an explicit
    schema (XML infers everything as string otherwise), and aggregate.
    The XML reader is splittable on row tags, so at 100 TB each file
    still fans out across tasks."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    path = os.path.join(
        tempfile.gettempdir(), f"swat_fmt_xml_{uuid.uuid4().hex[:8]}"
    )
    docs.write.mode("overwrite").format("xml").option("rowTag", "row").save(
        path
    )
    re_read = (
        spark.read.format("xml")
        .option("rowTag", "row")
        .schema("doc_id long, lang string, source string, n_chars long")
        .load(path)
    )
    return re_read.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register("parquet_partitioned_roundtrip", oracle=_AGG_ORACLE)
def parquet_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet write + re-read: partition column (lang)
    round-trips through directory layout; re-read scans prune by
    partition at scale."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    path = os.path.join(
        tempfile.gettempdir(), f"swat_fmt_part_{uuid.uuid4().hex[:8]}"
    )
    docs.write.mode("overwrite").partitionBy("lang").parquet(path)
    return (
        # explicit schema: inference fails when the write was 0-row
        # (no data files, no partition dirs to discover)
        spark.read.schema(
            "doc_id long, source string, n_chars long, lang string"
        ).parquet(path)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
