"""SparkSession factory with scale-oriented defaults.

Replaces the reference's hand-wired Hadoop ``Job`` configuration
(``java/PredictDriverCluster.java:14-56``): one declarative session,
AQE on, Arrow enabled for the pandas-UDF inference path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned for local[$SPARK_GRAFT_CPUS] testing; on a real cluster the same
# settings hold except shuffle partitions, which should track cluster
# cores (AQE coalesces the excess at runtime anyway).
_DEFAULTS = {
    # Runtime re-planning: partition coalescing, skew-join splitting,
    # broadcast-join demotion/promotion. Essential at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for pandas UDFs (the inference path). The reference
    # micro-batches 32 images (java/PredictBatchMapperCluster.java:19);
    # we use a larger Arrow batch because our model singleton is loaded
    # once per worker, not once per batch (SURVEY.md §4 fix (a)).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # events.parquet uses TIMESTAMP(NANOS) which Spark 4 rejects by
    # default; read as long nanos and convert (sources/readers.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic timestamp semantics across Spark and the DuckDB
    # oracle: everything in UTC.
    "spark.sql.session.timeZone": "UTC",
    # Sized for local[32] test runs; AQE coalesces below this at
    # runtime, so it's also safe under an externally-created session
    # (the correctness driver's default would otherwise be 200).
    "spark.sql.shuffle.partitions": "32",
    # Keep stderr clean for harnesses that capture output tails (the
    # stage progress bar interleaves carriage returns into logs).
    "spark.ui.showConsoleProgress": "false",
    # Let custom Python data sources receive pushFilters() (Spark 4.1;
    # runtime-settable, off by default).
    "spark.sql.python.filterPushdown.enabled": "true",
    # InferFiltersFromGenerate adds size(arr)>0 above every non-outer
    # explode; predicate pushdown then re-inlines the generator's FULL
    # derivation pipeline (tokenize/shingle/distinct) into the scan,
    # where it runs serially on single-split inputs and again in the
    # post-exchange projection (gotcha 13; measured 3.69 s -> 0.81 s on
    # the shapley mask subtree, r13). Every exploded array in this
    # engine is an expensive DERIVED pipeline — never a cheap stored
    # column the rule could usefully prune — so the inferred filter is
    # a net loss engine-wide. Hot paths additionally use
    # functions/arrays.explode_nonnull, which stays safe under foreign
    # sessions where this conf is absent. Runtime-settable, so the
    # driver's vanilla session picks it up via ensure_engine_conf.
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
}


def get_spark(
    app_name: str = "swat_mapreduce_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is configured.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    if master is None and "MASTER" not in os.environ:
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return spark


def ensure_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created
    session (the correctness driver hands us its own SparkSession)."""
    for k, v in _DEFAULTS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 — non-runtime-settable conf: keep going
            pass
    return spark
