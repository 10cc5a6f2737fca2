"""Planted-data semantics tests for the round-3 operators: duplicated
spans, SemDeDup exemplar election, triangle counting, last-touch
attribution, and the DQ expectation suite."""

from __future__ import annotations

from swat_mapreduce_spark.queries import load_all

REG = load_all()


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/{name}.parquet")


def test_substring_spans_planted_duplicates(spark, tmp_path):
    """Two byte-identical docs share every span (flagged); a disjoint-
    vocabulary doc shares none (not flagged)."""
    dup = "alpha beta gamma delta epsilon zeta"
    uniq = "one two three four five six seven"
    rows = [
        (1, dup, "en", "s", len(dup)),
        (2, dup, "en", "s", len(dup)),
        (3, uniq, "en", "s", len(uniq)),
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        r.doc_id: r
        for r in REG["dedup_substring_spans"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert out[1].dup_frac == 1.0 and out[1].flagged
    assert out[2].dup_frac == 1.0 and out[2].flagged
    assert out[3].dup_spans == 0 and not out[3].flagged
    assert out[3].n_spans == 5  # 7 tokens -> 5 three-token spans


def test_semdedup_elects_exemplar_and_flags_near_dup(spark, tmp_path):
    """Cluster of three: two near-identical vectors and one orthogonal.
    The exemplar is closest to the centroid; its twin is flagged."""
    import math

    a = [1.0, 0.0, 0.0] + [0.0] * 61
    a2 = [0.999, 0.001, 0.0] + [0.0] * 61
    b = [0.0, 1.0, 0.0] + [0.0] * 61
    rows = [(1, a, 0), (2, a2, 0), (3, b, 0)]
    _write(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        r.vec_id: r
        for r in REG["semdedup_embeddings"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    # exemplar (one of 1/2, whichever is closer to the centroid) is
    # absent from the member rows; its twin is a semantic duplicate
    assert len(out) == 2
    twin = 2 if 1 not in out else 1
    assert out[twin].is_semdup
    assert not out[3].is_semdup
    assert math.isclose(out[twin].cos_to_rep, 1.0, abs_tol=1e-3)


def test_triangle_count_planted_graph(spark, tmp_path):
    """Order 1 holds PROMO parts {1,2,3} -> exactly one triangle;
    order 2 adds edge (1,4) -> no new triangle; non-PROMO part 9 in
    order 1 contributes nothing."""
    li = [
        (1, 1), (1, 2), (1, 3), (1, 9),
        (2, 1), (2, 4),
    ]
    _write(
        spark, tmp_path, "lineitem",
        [(o, p) for o, p in li], "l_orderkey long, l_partkey long",
    )
    _write(
        spark, tmp_path, "part",
        [(1, "PROMO"), (2, "PROMO"), (3, "PROMO"), (4, "PROMO"),
         (9, "LARGE")],
        "p_partkey long, p_type string",
    )
    row = (
        REG["graph_triangle_count"].spark_fn(spark, str(tmp_path)).first()
    )
    assert row.n_edges == 4  # (1,2) (1,3) (2,3) (1,4)
    assert row.n_triangles == 1


def test_attribution_last_touch_planted(spark, tmp_path):
    """Purchase after a click credits the click's channel; purchase
    with no prior click is organic; a later click doesn't credit an
    earlier purchase."""
    rows = [
        (1, "2024-01-01 10:00:00", 7, "click", 0.0, '{"k": 1}'),
        (2, "2024-01-01 11:00:00", 7, "purchase", 10.0, '{"k": 99}'),
        (3, "2024-01-01 09:00:00", 8, "purchase", 5.0, '{"k": 99}'),
        (4, "2024-01-01 12:00:00", 8, "click", 0.0, '{"k": 2}'),
    ]
    _write(
        spark, tmp_path, "events",
        [(i, __import__("datetime").datetime.fromisoformat(ts), u, t, v, p)
         for i, ts, u, t, v, p in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {
        r.channel: r
        for r in REG["attribution_last_touch"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert out["ch_1"].n_purchases == 1
    assert out["ch_1"].attributed_value == 10.0
    assert out["organic"].n_purchases == 1
    assert out["organic"].attributed_value == 5.0


def test_dq_report_catches_planted_violations(spark, tmp_path, sf_dir):
    """Copy the tiny SF tables, then plant one bad lineitem row (qty
    out of range AND orphan order key) and assert exactly those two
    checks fail."""
    from swat_mapreduce_spark.sources.readers import read_table

    for t in ["orders", "customer", "events", "documents"]:
        read_table(spark, sf_dir, t).write.mode("overwrite").parquet(
            f"{tmp_path}/{t}.parquet"
        )
    li = read_table(spark, sf_dir, "lineitem")
    bad = spark.createDataFrame(
        [(10**12, 99.0, 1.0)],
        "l_orderkey long, l_quantity double, l_extendedprice double",
    )
    cols = li.columns
    li.unionByName(bad, allowMissingColumns=True).select(cols).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/lineitem.parquet")
    out = {
        r.check_name: r
        for r in REG["dq_expectations_report"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert out["lineitem_qty_range"].violations == 1
    assert not out["lineitem_qty_range"]["pass"]
    assert out["lineitem_fk_order"].violations == 1
    assert out["customer_key_unique"]["pass"]
    assert out["events_value_non_negative"]["pass"]


def test_queries_survive_empty_tables(spark, tmp_path):
    """A regenerated-testdata hazard (ADVICE r2): empty tables must
    yield empty (or aggregate-shaped) results, never crash. Runs the
    driver-facing entry points that do driver-side .first()/.collect()
    priming — the paths a 0-row input can break."""
    from swat_mapreduce_spark.queries import load_all
    from swat_mapreduce_spark.sources.readers import TABLES

    for t in TABLES:
        spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").limit(
            0
        ).coalesce(1).write.parquet(f"{tmp_path}/{t}.parquet")
    reg = load_all()
    for name in [
        "ann_topk_bruteforce",
        "ann_ivf_topk",
        "crossmodal_retrieval_eval",
        "watermark_late_audit",
        "dedup_substring_spans",
        "semdedup_embeddings",
        "graph_triangle_count",
        "linreg_normal_equations",
        # the six the full-registry empty sweep caught (schema
        # inference on 0-row round trips; None prefix offsets;
        # empty k-means init)
        "json_roundtrip_agg",
        "parquet_partitioned_roundtrip",
        "python_datasource_write",
        "stable_row_ids",
        "pack_sequences_fixed",
        "kmeans_lloyd_2iter",
        # r3 additions with driver-side collect/metrics paths
        "observed_metrics_orders",
        "statestore_reader_audit",
        "theta_set_algebra_audit",
        "stream_left_outer_join",
    ]:
        n = reg[name].spark_fn(spark, str(tmp_path)).count()
        assert n >= 0, name


def test_pipeline_runner_resolves_declaration_order(spark, sf_dir):
    """Gold is declared before its upstream; the fixed-point runner
    must still materialize bronze→silver→gold."""
    from swat_mapreduce_spark.queries.lakehouse import (
        declarative_pipeline_mv,
    )

    out = declarative_pipeline_mv(spark, sf_dir)
    assert out.count() == 5
    assert set(out.columns) == {"o_orderpriority", "n_items", "gross"}


def test_pipeline_runner_reports_stuck_flows(spark):
    import pytest as _pytest

    import pyspark.pipelines as dp

    from swat_mapreduce_spark.plans.pipeline_runner import run_pipeline

    def define():
        @dp.materialized_view(name="dp_orphan")
        def orphan():
            return spark.read.table("_dp_no_such_table_anywhere")

    with _pytest.raises(RuntimeError, match="dp_orphan"):
        run_pipeline(spark, define)
