"""Physical-plan assertions: the plans we'd want at 100 TB, not just
plans that happen to work at sf0.001 (predicate pushdown, broadcast
dims, TakeOrderedAndProject top-k, whole-stage codegen)."""

from __future__ import annotations

from pyspark.sql import functions as F

from swat_mapreduce_spark.plans.explain import formatted_plan, plan_has
from swat_mapreduce_spark.sources.readers import read_table


def test_filter_pushdown_to_parquet(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    plan = formatted_plan(q)
    assert "PushedFilters" in plan
    assert "l_quantity" in plan.split("PushedFilters")[1].splitlines()[0]


def test_column_pruning(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    q = li.select("l_orderkey", "l_quantity")
    plan = formatted_plan(q)
    # ReadSchema must not include unused columns like l_comment/l_tax
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_tax" not in read_schema
    assert "l_orderkey" in read_schema


def test_small_dim_join_broadcasts(spark, sf_dir):
    from swat_mapreduce_spark.queries.relational import q5_local_supplier_volume

    plan = formatted_plan(q5_local_supplier_volume(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_topk_plans_take_ordered(spark, sf_dir):
    from swat_mapreduce_spark.queries.relational import topk_orders

    plan = formatted_plan(topk_orders(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, (
        "global top-k must not be a full sort"
    )


def test_classify_pipeline_stays_jvm_side(spark, sf_dir):
    """Scoring is pure JVM expressions: no Python eval stages anywhere,
    and the label dim joins via broadcast. (WholeStageCodegen subtrees
    aren't annotated in un-executed AQE plans, so we assert the
    JVM-only property instead.)"""
    from swat_mapreduce_spark.operators.classify import classify_pipeline

    plan = formatted_plan(classify_pipeline(spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_range_join_is_broadcast_nested_loop(spark, sf_dir):
    from swat_mapreduce_spark.queries.temporal import range_join_price_bands

    plan = formatted_plan(range_join_price_bands(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
