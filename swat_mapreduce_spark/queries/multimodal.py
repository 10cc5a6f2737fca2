"""Multimodal-column queries. Metadata extraction has a DuckDB oracle
(digests over the same bytes); the mapInPandas decode stage is
rows-only (non-SQL-expressible) but deterministic — pytest asserts its
values independently."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from swat_mapreduce_spark.operators import multimodal as M
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

# DuckDB's sha256/md5 over VARCHAR hash the UTF-8 bytes — identical to
# Spark hashing the encoded binary payload.
_META_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha256,
       md5(text) AS payload_md5
FROM documents
"""


@register("multimodal_meta", oracle=_META_ORACLE)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return M.with_binary_payload(docs).drop("payload")


@register("multimodal_decode_features", oracle=None)  # mapInPandas: rows-only
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return M.fake_decode_features(M.with_binary_payload(docs))
