"""Invariant tests for the round-6 operators — semantic properties the
oracle hash-compare can't express (budget tightness, credit
conservation, batch-vs-stream equality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from swat_mapreduce_spark.queries import load_all


def _q(name):
    return load_all()[name]


def test_token_budget_fill_boundary_is_tight(spark, sf_dir):
    """Kept tokens never exceed the budget, and the budget is TIGHT:
    the first doc beyond the boundary would overflow it (i.e. the cut
    is maximal for the priority order, not conservative)."""
    rows = _q("token_budget_fill").spark_fn(spark, sf_dir).collect()
    budget = rows[0]["budget"]
    kept = sum(r["n_tokens_kept"] for r in rows)
    assert kept <= budget
    # reconstruct the boundary doc: first doc (priority order) past
    # the kept prefix; adding it must overflow the budget
    from swat_mapreduce_spark.functions.text import ws_tokens
    from swat_mapreduce_spark.sources.readers import read_table

    docs = (
        read_table(spark, sf_dir, "documents")
        .select(
            "source",
            "doc_id",
            F.size(ws_tokens(F.col("text"))).cast("long").alias("n"),
        )
        .orderBy("source", "doc_id")
        .collect()
    )
    cum = 0
    boundary_overflow = None
    for r in docs:
        if cum + r["n"] > budget:
            boundary_overflow = cum + r["n"]
            break
        cum += r["n"]
    assert cum == kept, "kept prefix must equal the cumulative cut"
    if boundary_overflow is not None:
        assert boundary_overflow > budget


def test_attribution_position_credits_conserve_value(spark, sf_dir):
    """Per-purchase credit fractions sum to exactly 1, so total
    attributed value across channels equals total purchase value
    (up to the per-term decimal quantization)."""
    out = _q("attribution_position_based").spark_fn(spark, sf_dir).collect()
    attributed = sum(r["attributed_value"] for r in out)
    from swat_mapreduce_spark.sources.readers import read_table

    total = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.col("value").cast("decimal(30,8)")))
        .first()[0]
    )
    assert abs(attributed - float(total)) < 0.01 * max(1, len(out)), (
        f"attributed {attributed} != purchase total {float(total)}"
    )
    # every purchase credited exactly once per touch set
    n_purchases = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    # n_purchases per channel counts distinct purchases touching that
    # channel; the organic rows are purchases with zero touches, and
    # every purchase appears in >= 1 channel
    assert sum(r["n_purchases"] for r in out) >= n_purchases


def test_stream_probe_equals_batch_probe(spark, sf_dir):
    """The foreachBatch streaming ingest probe must produce EXACTLY the
    one-shot batch probe rows — per-doc decisions are independent of
    micro-batch boundaries."""
    batch = {
        tuple(r)
        for r in _q("dedup_probe_incremental").spark_fn(spark, sf_dir).collect()
    }
    stream = {
        tuple(r)
        for r in _q("stream_probe_dedup_index").spark_fn(spark, sf_dir).collect()
    }
    assert batch == stream


def test_approx_topk_matches_exact_counts(spark, sf_dir):
    """With the vocabulary far under sketch capacity the sketch counts
    are exact — compare against a plain groupBy count."""
    from swat_mapreduce_spark.functions.text import ws_tokens
    from swat_mapreduce_spark.sources.readers import read_table

    got = {
        r["tok"]: r["cnt"]
        for r in _q("approx_topk_sketch_tokens").spark_fn(spark, sf_dir).collect()
    }
    exact = {
        r["tok"]: r["cnt"]
        for r in (
            read_table(spark, sf_dir, "documents")
            .select(F.explode(ws_tokens(F.col("text"))).alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("tok"))
            .limit(10)
            .collect()
        )
    }
    assert got == exact


def test_centroid_drift_bounds(spark, sf_dir):
    """Centroid cosine must lie in [-1, 1] and norms be positive for
    every label; drift on the synthetic clustered embeddings should be
    mild (same generator for both halves)."""
    rows = _q("embedding_centroid_drift").spark_fn(spark, sf_dir).collect()
    assert rows, "per-label drift report must be non-empty"
    for r in rows:
        assert -1.0 <= r["centroid_cosine"] <= 1.0
        assert r["norm_first"] > 0 and r["norm_second"] > 0
        assert r["centroid_l2_shift"] >= 0


def test_woe_iv_consistency(spark, sf_dir):
    """Bin counts must partition the corpus; IV equals the sum of the
    per-bin contributions recomputed from the reported counts."""
    import math

    rows = _q("woe_iv_length_feature").spark_fn(spark, sf_dir).collect()
    from swat_mapreduce_spark.sources.readers import read_table

    n_docs = read_table(spark, sf_dir, "documents").count()
    assert sum(r["n_pos"] + r["n_neg"] for r in rows) == n_docs
    tp = sum(r["n_pos"] for r in rows)
    tn = sum(r["n_neg"] for r in rows)
    iv = sum(
        ((r["n_pos"] + 0.5) / (tp + 0.5) - (r["n_neg"] + 0.5) / (tn + 0.5))
        * math.log(
            ((r["n_pos"] + 0.5) / (tp + 0.5))
            / ((r["n_neg"] + 0.5) / (tn + 0.5))
        )
        for r in rows
    )
    assert abs(iv - rows[0]["total_iv"]) < 5e-4
    for r in rows:
        assert r["total_iv"] == rows[0]["total_iv"]
