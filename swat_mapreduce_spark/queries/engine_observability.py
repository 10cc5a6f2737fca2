"""Pipeline-observability and mergeable-sketch surfaces.

Three production patterns a 100 TB deployment leans on:

* ``DataFrame.observe`` (Spark 3.3+) — data-quality counters collected
  as accumulator metrics DURING a real job, zero extra passes. At
  100 TB a separate validation scan doubles the read; observe rides
  the existing one.
* ``hll_union_agg`` (Spark 3.5+ Datasketches) — HLL sketches are a
  commutative monoid, so per-partition (here: per-day) sketches merge
  to any coarser rollup WITHOUT rescanning raw events. This is the
  incremental-cube pattern: store k bytes per (type, day), answer
  distinct-count queries over arbitrary date ranges by union.
* Python UDTF ``analyze()`` (Spark 4) — polymorphic table function
  whose OUTPUT SCHEMA is computed at plan time from a constant
  argument; the planner sees real typed columns, so downstream
  pruning/codegen work as if the schema were declared statically.

All three carry full DuckDB value oracles (sketch estimates are pinned
via within-tolerance booleans, the pattern established in
scale_patterns.sketch_cardinality_pack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

# --- observe(): DQ metrics piggybacked on a real aggregation ---------------
# The metrics are computed by accumulators inside the SAME scan that
# feeds the per-status aggregate — .explain shows one FileScan, zero
# extra jobs. The returned row is the metrics record a pipeline would
# ship to its monitoring sink.

_OBSERVE_ORACLE = """
SELECT count(*) AS n_rows,
       count(*) FILTER (WHERE o_totalprice <= 0) AS n_bad_price,
       min(CAST(o_orderdate AS DATE)) AS min_date,
       max(CAST(o_orderdate AS DATE)) AS max_date,
       count(DISTINCT o_orderstatus) AS n_status_groups
FROM orders
"""


@register("observed_metrics_orders", oracle=_OBSERVE_ORACLE)
def observed_metrics_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation
    from pyspark.sql.types import (
        DateType,
        LongType,
        StructField,
        StructType,
    )

    orders = read_table(spark, sf_dir, "orders")
    obs = Observation("orders_dq")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("o_totalprice") <= 0, 1)), F.lit(0)
        ).alias("n_bad_price"),
        F.min(F.to_date("o_orderdate")).alias("min_date"),
        F.max(F.to_date("o_orderdate")).alias("max_date"),
    )
    # The "real" job whose scan the metrics ride on.
    n_status_groups = (
        observed.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    ).count()
    try:
        m = dict(obs.get)
    except Exception:
        # 0-row scans can elide the observe node's metrics row
        # (Py4J assertion in toPyRow); recompute the same aggregates
        # directly — one extra (empty) scan only on this path.
        m = orders.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col("o_totalprice") <= 0, 1)), F.lit(0)
            ).alias("n_bad_price"),
            F.min(F.to_date("o_orderdate")).alias("min_date"),
            F.max(F.to_date("o_orderdate")).alias("max_date"),
        ).collect()[0].asDict()
    schema = StructType(
        [
            StructField("n_rows", LongType()),
            StructField("n_bad_price", LongType()),
            StructField("min_date", DateType()),
            StructField("max_date", DateType()),
            StructField("n_status_groups", LongType()),
        ]
    )
    row = [
        (
            m.get("n_rows", 0),
            m.get("n_bad_price", 0),
            m.get("min_date"),
            m.get("max_date"),
            n_status_groups,
        )
    ]
    return spark.createDataFrame(row, schema)


# --- mergeable HLL rollup: daily sketches → per-type distincts -------------
# Estimates are pinned as within-5% booleans (default lgConfigK=12 →
# ~1.6% standard error; deterministic registers, so the boolean is
# stable). The oracle computes the exact distincts and pins TRUE.

_SKETCH_ROLLUP_ORACLE = """
SELECT event_type,
       count(DISTINCT CAST(ts AS DATE)) AS n_days,
       count(DISTINCT user_id) AS n_exact,
       TRUE AS merged_ok,
       TRUE AS direct_ok
FROM events
GROUP BY event_type
"""


@register("sketch_union_rollup", oracle=_SKETCH_ROLLUP_ORACLE)
def sketch_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    rolled = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est"),
    )
    direct = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias(
            "direct_est"
        ),
    )

    def ok(est: str):
        return (
            F.abs(F.col(est) - F.col("n_exact")) / F.col("n_exact") <= 0.05
        )

    return (
        rolled.join(direct, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_exact",
            ok("merged_est").alias("merged_ok"),
            ok("direct_est").alias("direct_ok"),
        )
    )


# --- polymorphic UDTF: schema computed by analyze() ------------------------
# The column NAMES (and arity) come from a constant argument the
# planner folds; analyze() returns the typed schema before execution.

_UDTF_DYN_ORACLE = """
SELECT doc_id,
       split_part(text, ' ', 1) AS w1,
       split_part(text, ' ', 2) AS w2,
       split_part(text, ' ', 3) AS w3
FROM documents
"""


@register("udtf_dynamic_schema", oracle=_UDTF_DYN_ORACLE)
def udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class LeadToks:
        @staticmethod
        def analyze(
            text: AnalyzeArgument, names: AnalyzeArgument
        ) -> AnalyzeResult:
            st = StructType()
            for nm in str(names.value).split(","):
                st = st.add(nm, StringType())
            return AnalyzeResult(schema=st)

        def eval(self, text: str, names: str):
            cols = names.split(",")
            toks = (text or "").split(" ")
            yield tuple(
                toks[i] if i < len(toks) else "" for i in range(len(cols))
            )

    spark.udtf.register("swat_lead_toks", udtf(LeadToks))
    read_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "_udtf_dyn_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, t.* FROM _udtf_dyn_docs d, "
        "LATERAL swat_lead_toks(d.text, 'w1,w2,w3') t"
    )


# --- state-store reader: offline audit of streaming checkpoints ------------
# Spark 4's `statestore` / `state-metadata` batch sources read a
# structured-streaming checkpoint WITHOUT the streaming query running
# — the ops story for debugging stuck stateful jobs at scale (inspect
# hot keys, count state rows per partition, verify eviction) with a
# plain batch query instead of instrumenting the live stream.

_STATESTORE_ORACLE = """
SELECT event_type, count(*) AS n_state,
       'stateStoreSave' AS operator_name,
       8 AS num_partitions
FROM events
GROUP BY event_type
"""


@register("statestore_reader_audit", oracle=_STATESTORE_ORACLE)
def statestore_reader_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    from swat_mapreduce_spark.streaming import jobs

    chk = tempfile.mkdtemp(prefix="swat_sschk_")
    qn = "ss_audit_" + uuid.uuid4().hex[:8]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        stream = jobs.events_stream(spark, sf_dir)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(qn)
            .outputMode("complete")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        meta_rows = spark.read.format("state-metadata").load(chk).collect()
        if not meta_rows:  # 0-row input: no batch ever committed state
            return spark.createDataFrame(
                [],
                "event_type string, n_state long, operator_name string, "
                "num_partitions int",
            )
        meta_row = meta_rows[0]
        state = (
            spark.read.format("statestore")
            .load(chk)
            .select(
                F.col("key.event_type").alias("event_type"),
                F.col("value.count").alias("n_state"),
            )
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(chk, ignore_errors=True)
    # Materialize before deleting the checkpoint the lazy scan reads.
    # Bounded: state rows = |event_type| groups (the agg's key), not
    # input rows; a production audit keeps the DataFrame lazy over a
    # retained checkpoint instead.
    rows = [
        (
            r.event_type,
            r.n_state,
            meta_row.operatorName,
            meta_row.numPartitions,
        )
        for r in state
    ]
    return spark.createDataFrame(
        rows,
        "event_type string, n_state long, operator_name string, "
        "num_partitions int",
    )


# --- theta-sketch set algebra: audience overlap without a join -------------
# Theta sketches (unlike HLL) support INTERSECTION and DIFFERENCE
# estimates: |users(click) ∩ users(purchase)| at 100 TB without
# shuffling user_ids into a join — two sketch aggregates and a
# driver-side combine of KB-sized summaries. Below the default 4096
# nominal entries the sketch is in exact mode, so the 5% gate is
# conservative at every test SF.

_THETA_ALGEBRA_ORACLE = """
WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
     p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT (SELECT count(*) FROM c) AS n_click,
       (SELECT count(*) FROM p) AS n_purchase,
       (SELECT count(*) FROM c WHERE user_id IN (SELECT user_id FROM p))
           AS n_both_exact,
       TRUE AS inter_ok, TRUE AS union_ok, TRUE AS diff_ok
"""


@register("theta_set_algebra_audit", oracle=_THETA_ALGEBRA_ORACLE)
def theta_set_algebra_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    csk = clicks.agg(
        F.theta_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("n_click"),
    )
    psk = purchases.agg(
        F.theta_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("n_purchase"),
    )
    both = csk.crossJoin(
        psk.select(
            F.col("sk").alias("psk"), "n_purchase"
        )  # 1×1 rows: driver-size combine
    )
    exact_both = (
        clicks.select("user_id")
        .distinct()
        .join(purchases.select("user_id").distinct(), "user_id", "left_semi")
        .count()
    )
    est = both.select(
        "n_click",
        "n_purchase",
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("sk"), F.col("psk"))
        ).alias("inter_est"),
        F.theta_sketch_estimate(
            F.theta_union(F.col("sk"), F.col("psk"))
        ).alias("union_est"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("sk"), F.col("psk"))
        ).alias("diff_est"),
    )

    def within(est_col, truth_col):
        return (
            F.abs(F.col(est_col) - truth_col)
            <= F.greatest(0.05 * truth_col, F.lit(1.0))
        )

    n_both = F.lit(exact_both).cast("double")
    return est.select(
        "n_click",
        "n_purchase",
        F.lit(exact_both).cast("long").alias("n_both_exact"),
        within("inter_est", n_both).alias("inter_ok"),
        within(
            "union_est",
            (F.col("n_click") + F.col("n_purchase") - n_both).cast("double"),
        ).alias("union_ok"),
        within("diff_est", (F.col("n_click") - n_both).cast("double")).alias(
            "diff_ok"
        ),
    )


# --- mergeable KLL quantile rollup -----------------------------------------
# Same two-level shape as sketch_union_rollup but for QUANTILES:
# per-day KLL sketches of `value` merged with kll_merge_agg_double to
# a per-type sketch. k=200 default → ±1.65% rank error at 99%
# confidence; the audit pins the merged median between the exact p40
# and p60 (rank gate ±0.10, same convention as
# scale_patterns.sketch_cardinality_pack).

_KLL_ROLLUP_ORACLE = """
SELECT event_type,
       count(DISTINCT CAST(ts AS DATE)) AS n_days,
       TRUE AS median_ok
FROM events
GROUP BY event_type
"""


@register("kll_quantile_rollup", oracle=_KLL_ROLLUP_ORACLE)
def kll_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.kll_sketch_agg_double("value").alias("sk")
    )
    rolled = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.kll_sketch_get_quantile_double(
            F.kll_merge_agg_double("sk"), F.lit(0.5)
        ).alias("merged_median"),
    )
    exact = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.40)").alias("p40"),
        F.expr("percentile(value, 0.60)").alias("p60"),
    )
    return rolled.join(exact, "event_type").select(
        "event_type",
        "n_days",
        (
            (F.col("merged_median") >= F.col("p40"))
            & (F.col("merged_median") <= F.col("p60"))
        ).alias("median_ok"),
    )
