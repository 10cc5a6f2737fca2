"""Python-UDF surface coverage beyond the inference path
(SURVEY.md §2B "UDF/UDAF/UDTF surface"):

* grouped-map ``applyInPandas`` — per-group pandas transform (the
  reference's closest analog is the per-batch subprocess, SURVEY §2A
  #8; here the group is a first-class key, state is per-group).
* Python UDTF (``@udtf``, Spark 3.5+) — 1→N row expansion with
  schema-declared output.

Both are Arrow-batched; both carry full DuckDB value oracles because
the transforms are deterministic math, not model calls.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table


def _round4(x: float) -> float:
    """Half-away-from-zero 4dp rounding, the cross-engine formula
    shared with functions/rounding.py."""
    if x != x or math.isinf(x):  # NaN/inf pass through
        return x
    return math.copysign(math.floor(abs(x) * 1e4 + 0.5) / 1e4, x)


# --- grouped-map applyInPandas: per-user z-score of event values ---------
_ZSCORE_ORACLE = """
SELECT event_id, user_id,
       round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 4)
           AS zscore
FROM events
WINDOW w AS (PARTITION BY user_id)
QUALIFY count(*) OVER w > 1
"""


@register("applyinpandas_zscore", oracle=_ZSCORE_ORACLE)
def applyinpandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy(user_id).applyInPandas: whole-group pandas function
    computing each event's z-score against its user's own
    distribution. Shuffles once on the group key; each group is a
    single pandas DataFrame in one Python worker — the grouped-map
    contract (groups must fit in worker memory, so the key must be
    finer than any mega-group at 100 TB)."""
    import pandas as pd

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n <= 1:
            return pd.DataFrame(
                columns=["event_id", "user_id", "zscore"]
            ).astype({"event_id": "int64", "user_id": "int64", "zscore": "float64"})
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)  # sample stddev == stddev_samp
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "zscore": ((pdf["value"] - mu) / sd).map(_round4),
            }
        )

    events = read_table(spark, sf_dir, "events")
    return (
        events.select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(zscore, schema="event_id long, user_id long, zscore double")
    )


# --- Python UDTF: 1→N typed row expansion --------------------------------
_UDTF_ORACLE = """
SELECT doc_id, w.tok AS token, length(w.tok) AS tok_len
FROM (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
    FROM documents WHERE doc_id % 29 = 0
) w(doc_id, tok)
WHERE length(w.tok) > 0
"""


@register("udtf_tokenize", oracle=_UDTF_ORACLE)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 3.5+ ``@udtf``): tokenizes each document and
    emits one typed row per token — the declared-schema 1→N surface.
    (For pure whitespace tokenization the JVM ``explode(split())`` is
    the production path — functions/text.py — but the UDTF contract is
    part of the engine's API surface and this pins its semantics.)"""
    import re as _re

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, token string, tok_len int")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for tok in _re.split(r"\s+", text.strip()):
                if tok:
                    yield doc_id, tok, len(tok)

    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 29 == 0
    )
    spark.udtf.register("swat_tokenize", Tokenize)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT t.* FROM _udtf_docs d, "
        "LATERAL swat_tokenize(d.doc_id, d.text) t"
    )


# --- grouped-agg pandas UDF (UDAF surface) --------------------------------
# Weighted mean as a PandasUDFType.GROUPED_AGG aggregate: the Arrow
# UDAF path (whole group's columns arrive as pandas Series, return one
# scalar). Weight = (event_id % 10) + 1 keeps everything deterministic
# integers. At scale a grouped-agg UDF has NO partial aggregation —
# the whole group ships to one worker — so the JVM expression form
# (sum(v*w)/sum(w), which DOES combine map-side) is the production
# default; this pins the UDAF contract itself.
_UDAF_ORACLE = """
SELECT event_type,
       round(sum(value * ((event_id % 10) + 1))
             / sum((event_id % 10) + 1), 4) AS wmean
FROM events
GROUP BY event_type
"""


@register("pandas_udaf_weighted_mean", oracle=_UDAF_ORACLE)
def pandas_udaf_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit GROUPED_AGG functionType: this module uses postponed
    # annotations (PEP 563), which turns type hints into strings that
    # pandas_udf's signature inference cannot resolve
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def wmean(v, w):
        return _round4(float((v * w).sum() / w.sum()))

    events = read_table(spark, sf_dir, "events")
    weight = (F.col("event_id") % 10 + 1).cast("double")
    return events.groupBy("event_type").agg(
        wmean(F.col("value"), weight).alias("wmean")
    )


# --- cogrouped applyInPandas: per-user click/purchase alignment ----------
# groupBy(k).cogroup(other.groupBy(k)).applyInPandas — the two-sided
# grouped-map surface: both sides shuffle once on the key and arrive
# as separate pandas frames per key. Here: per-user click/purchase
# counts and the gap between their mean values — a pandas-side
# full-outer "compare two event streams" that SQL expresses as a
# FULL JOIN of two aggregates.

# means are computed from exact integer cents (values carry 2dp):
# a float mean's accumulation order differs between pandas and the
# oracle and flips 4dp roundings (CLAUDE.md gotcha 2/3)
_COGROUP_ORACLE = """
WITH c AS (
    SELECT user_id, count(*) AS n_clicks,
           sum(round(value * 100)::BIGINT) AS cents_click
    FROM events WHERE event_type = 'click' GROUP BY user_id
),
p AS (
    SELECT user_id, count(*) AS n_purchases,
           sum(round(value * 100)::BIGINT) AS cents_purchase
    FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT coalesce(c.user_id, p.user_id) AS user_id,
       coalesce(c.n_clicks, 0) AS n_clicks,
       coalesce(p.n_purchases, 0) AS n_purchases,
       round(coalesce(p.cents_purchase / (100.0 * p.n_purchases), 0.0)
             - coalesce(c.cents_click / (100.0 * c.n_clicks), 0.0), 4)
           AS value_gap
FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
"""


@register("cogroup_click_purchase", oracle=_COGROUP_ORACLE)
def cogroup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "value"
    )

    def align(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        (user_id,) = key
        # exact integer cents → order-independent means (see oracle)
        cents_c = int((left["value"] * 100).round().astype("int64").sum())
        cents_p = int((right["value"] * 100).round().astype("int64").sum())
        avg_c = cents_c / (100.0 * len(left)) if len(left) else 0.0
        avg_p = cents_p / (100.0 * len(right)) if len(right) else 0.0
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "n_clicks": [len(left)],
                "n_purchases": [len(right)],
                "value_gap": [_round4(avg_p - avg_c)],
            }
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            align,
            "user_id long, n_clicks long, n_purchases long, value_gap double",
        )
    )


# --- grouped applyInArrow: pandas-free per-group aggregation -------------
# groupBy(k).applyInArrow — the zero-pandas grouped-map path: each
# group arrives as a pyarrow.Table and returns one. No pandas object
# materialization, no index bookkeeping; for numeric crunching the
# Arrow compute kernels are the vectorized hot path.

_ARROW_GROUP_ORACLE = """
SELECT source, count(*) AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY source
"""


@register("applyinarrow_source_stats", oracle=_ARROW_GROUP_ORACLE)
def applyinarrow_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = read_table(spark, sf_dir, "documents").select("source", "n_chars")

    def stats(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        total = pc.sum(tbl.column("n_chars")).as_py() or 0
        return pa.table(
            {
                "source": [tbl.column("source")[0].as_py()],
                "n_docs": pa.array([n], pa.int64()),
                "total_chars": pa.array([total], pa.int64()),
                "avg_chars": pa.array(
                    [_round4(total / n)], pa.float64()
                ),
            }
        )

    return docs.groupBy("source").applyInArrow(
        stats,
        "source string, n_docs long, total_chars long, avg_chars double",
    )


# --- SQL-registered UDFs: row UDF + scalar pandas UDF ----------------------
# The two remaining UDF shapes: a plain Python row UDF registered into
# the SQL namespace (spark.udf.register → callable from SQL text), and
# a vectorized scalar pandas_udf (Series → Series, Arrow-batched).
# Both are applied to the 500-row documents table — these shapes are
# for EDGES of a pipeline, not 100 TB hot paths (SCALING.md principle
# 5: hot-path expressions stay JVM-side; the engine's hot Python
# surfaces are the iterator/grouped forms above).

_UDF_REG_ORACLE = """
SELECT doc_id,
       upper(substr(lang, 1, 1)) || substr(lang, 2) AS lang_title,
       round(n_chars / 100.0, 4) AS hecto_chars
FROM documents
"""


@register("sql_registered_udfs", oracle=_UDF_REG_ORACLE)
def sql_registered_udfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf, udf

    @udf("string")
    def title_case(s: str) -> str:
        return s[:1].upper() + s[1:] if s else s

    # no type hints: postponed annotations (PEP 563) stringify them
    # and pandas_udf's signature inference then rejects the function —
    # same as the GROUPED_AGG note above. SCALAR is the default type.
    @pandas_udf("double")
    def hecto(v):
        return (v / 100.0).map(_round4)

    spark.udf.register("swat_title_case", title_case)
    spark.udf.register("swat_hecto", hecto)
    read_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_udf_v"
    )
    return spark.sql(
        """
        SELECT doc_id,
               swat_title_case(lang) AS lang_title,
               swat_hecto(CAST(n_chars AS DOUBLE)) AS hecto_chars
        FROM documents_udf_v
        """
    )


# --- Spark 4.1 scalar Arrow UDF (pandas-free vectorized Python) ------------
# @arrow_udf hands the worker pyarrow.Array batches directly — no
# pandas materialization at all (vs pandas_udf's Arrow→pandas→Arrow
# round trip). pyarrow.compute kernels are C++ vectorized, so the
# Python layer only dispatches. The UDF normalizes document text the
# way a C4-style cleaner would (lowercase + collapse whitespace) and
# measures the result; the oracle reproduces both in SQL.
_ARROW_UDF_ORACLE = """
SELECT doc_id,
       length(regexp_replace(lower(text), '\\s+', ' ', 'g'))
           AS norm_len,
       length(text) - length(replace(text, ' ', '')) + 1 AS n_words
FROM documents
"""


@register("arrow_scalar_udf", oracle=_ARROW_UDF_ORACLE)
def arrow_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    from pyspark.sql.functions import ArrowUDFType, arrow_udf

    # functionType passed explicitly: this module uses
    # `from __future__ import annotations`, which stringifies the
    # pa.Array type hints arrow_udf would otherwise introspect.
    @arrow_udf("long", ArrowUDFType.SCALAR)
    def norm_len(text):
        lowered = pc.utf8_lower(text)
        collapsed = pc.replace_substring_regex(lowered, r"\s+", " ")
        return pc.cast(pc.utf8_length(collapsed), pa.int64())

    @arrow_udf("long", ArrowUDFType.SCALAR)
    def word_count(text):
        return pc.cast(
            pc.add(pc.count_substring(text, " "), 1), pa.int64()
        )

    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        norm_len(F.col("text")).alias("norm_len"),
        word_count(F.col("text")).alias("n_words"),
    )


# --- UDTF with a TABLE argument (PARTITION BY / ORDER BY) ------------------
# The polymorphic-table-function calling convention (SQL:2016 PTF):
# the UDTF receives WHOLE PARTITIONS of a table argument — Spark
# shuffles on the PARTITION BY key, streams each partition's rows
# (ORDER BY ts) through eval(), and terminate() emits the per-
# partition summary. Distinct from LATERAL row-UDTFs (one call per
# row) and from applyInPandas (no pandas here — plain Row streaming).
_UDTF_TABLE_ARG_ORACLE = """
SELECT user_id,
       count(*) AS n_events,
       datediff('microsecond', min(ts), max(ts)) AS span_us,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases
FROM events
GROUP BY user_id
"""


@register("udtf_table_argument", oracle=_UDTF_TABLE_ARG_ORACLE)
def udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "user_id bigint, n_events bigint, span_us bigint, "
            "n_purchases bigint"
        )
    )
    class UserSummary:
        def __init__(self):
            self.user = None
            self.n = 0
            self.first_ts = None
            self.last_ts = None
            self.purchases = 0

        def eval(self, row):
            self.user = row["user_id"]
            self.n += 1
            # rows arrive in ORDER BY ts within the partition
            if self.first_ts is None:
                self.first_ts = row["ts"]
            self.last_ts = row["ts"]
            if row["event_type"] == "purchase":
                self.purchases += 1

        def terminate(self):
            if self.user is not None:
                d = self.last_ts - self.first_ts
                # exact integer micros (total_seconds() is float and
                # can drop a microsecond at month-long spans)
                span = (
                    d.days * 86_400_000_000
                    + d.seconds * 1_000_000
                    + d.microseconds
                )
                yield (self.user, self.n, span, self.purchases)

    spark.udtf.register("swat_user_summary", UserSummary)
    read_table(spark, sf_dir, "events").createOrReplaceTempView(
        "_udtf_tbl_events"
    )
    return spark.sql(
        "SELECT s.* FROM swat_user_summary("
        "TABLE(SELECT user_id, ts, event_type FROM _udtf_tbl_events) "
        "PARTITION BY user_id ORDER BY ts) s"
    )


# --- Spark 4.1 Arrow-native UDTF (vectorized table function) ---------------
# @arrow_udtf's eval receives whole pyarrow RecordBatches of the table
# argument and yields pyarrow Tables — a table-in/table-out function
# with zero per-row Python and zero pandas. Here: a vectorized
# quality gate (length filter computed with pyarrow.compute) — the
# batch-level form of a corpus filter stage.
_ARROW_UDTF_ORACLE = """
SELECT doc_id, length(text) AS text_len
FROM documents
WHERE length(text) >= 500
"""


@register("arrow_udtf_batch_filter", oracle=_ARROW_UDTF_ORACLE)
def arrow_udtf_batch_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    from pyspark.sql.functions import arrow_udtf

    @arrow_udtf(returnType="doc_id bigint, text_len int")
    class LengthGate:
        def eval(self, batch: "pa.RecordBatch"):
            lens = pc.cast(
                pc.utf8_length(batch.column("text")), pa.int32()
            )
            keep = pc.greater_equal(lens, 500)
            tbl = pa.table(
                {"doc_id": batch.column("doc_id"), "text_len": lens}
            )
            yield tbl.filter(keep)

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return LengthGate(docs.asTable())


# --- Pandas API on Spark (pyspark.pandas) ----------------------------------
# The pandas-dataframe dialect compiled onto the same engine: ops
# declare Spark plans (Catalyst-optimized, distributed), not local
# pandas — the migration surface for pandas codebases. Aggregates
# chosen to be float-safe cross-engine: count/min/max are exact, and
# the mean's accumulation error (~1e-7 relative at sf0.1) sits far
# inside the 4dp pin; a raw double SUM of 1e9-magnitude money is NOT
# pinned here (CLAUDE.md gotcha 2 — that contract lives with the
# decimal money_sum queries).
_PS_ORACLE = """
SELECT o_orderstatus,
       count(*) AS n,
       round(min(o_totalprice) * 10000) / 10000 + 0.0 AS min_price,
       round(max(o_totalprice) * 10000) / 10000 + 0.0 AS max_price,
       round(avg(o_totalprice) * 10000) / 10000 + 0.0 AS avg_price
FROM orders
GROUP BY o_orderstatus
"""


@register("pandas_api_groupby", oracle=_PS_ORACLE)
def pandas_api_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import pyspark.pandas as ps

        psdf = ps.read_parquet(f"{sf_dir}/orders.parquet")
        agg = psdf.groupby("o_orderstatus").agg(
            n=("o_orderkey", "count"),
            min_price=("o_totalprice", "min"),
            max_price=("o_totalprice", "max"),
            avg_price=("o_totalprice", "mean"),
        )
        sdf = agg.reset_index().to_spark()
    from swat_mapreduce_spark.functions import rounding as R

    return sdf.select(
        "o_orderstatus",
        F.col("n").cast("long").alias("n"),
        R.r("min_price", 4).alias("min_price"),
        R.r("max_price", 4).alias("max_price"),
        R.r("avg_price", 4).alias("avg_price"),
    )
