"""Tests for queries/engine_observability.py: observe() metrics,
mergeable HLL rollup, and the analyze()-schema UDTF."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_observed_metrics_single_scan(spark, sf_dir):
    from swat_mapreduce_spark.queries.engine_observability import (
        observed_metrics_orders,
    )

    row = observed_metrics_orders(spark, sf_dir).collect()[0]
    # Cross-check against a plain batch aggregate over the same table.
    from swat_mapreduce_spark.sources.readers import read_table

    orders = read_table(spark, sf_dir, "orders")
    n = orders.count()
    assert row.n_rows == n
    assert row.n_bad_price == orders.filter(F.col("o_totalprice") <= 0).count()
    assert (
        row.n_status_groups
        == orders.select("o_orderstatus").distinct().count()
    )


def test_hll_union_is_register_lossless(spark):
    """Merging per-group sketches must estimate the same cardinality
    class as sketching the whole column: plant two disjoint halves and
    check the unioned estimate is within 5% of the true 200."""
    df = spark.range(200).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v")
    )
    per_g = df.groupBy("g").agg(F.hll_sketch_agg("v").alias("sk"))
    est = per_g.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).collect()[0].e
    assert abs(est - 200) / 200 <= 0.05


def test_udtf_analyze_schema_follows_argument(spark, sf_dir):
    """The output arity/names come from the constant names argument —
    the same UDTF class yields different schemas per call site."""
    from swat_mapreduce_spark.queries.engine_observability import (
        udtf_dynamic_schema,
    )

    out = udtf_dynamic_schema(spark, sf_dir)
    assert out.columns == ["doc_id", "w1", "w2", "w3"]
    # Re-invoke the registered UDTF with a different names constant.
    two = spark.sql(
        "SELECT t.* FROM _udtf_dyn_docs d, "
        "LATERAL swat_lead_toks(d.text, 'a,b') t"
    )
    assert two.columns == ["a", "b"]
    first = out.orderBy("doc_id").first()
    assert first.w1  # non-empty leading token
