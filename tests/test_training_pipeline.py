"""Structural invariants of the training-data-prep operators — the
properties the oracles can't see (determinism across runs, geometric
coverage, permutation-ness) pinned directly."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from swat_mapreduce_spark.queries import load_all

REG = load_all()
SF = "/root/testdata/sf0.001"


def test_chunks_cover_every_token(spark):
    """Chunk geometry: starts advance by STRIDE from 1, the final
    chunk reaches the last token, and no chunk is empty."""
    from swat_mapreduce_spark.queries.training_pipeline import (
        _CHUNK,
        _STRIDE,
    )

    chunks = REG["chunk_documents_sliding"].spark_fn(spark, SF)
    from swat_mapreduce_spark.functions.text import ws_tokens
    from swat_mapreduce_spark.sources.readers import read_table

    docs = read_table(spark, SF, "documents").select(
        "doc_id", F.size(ws_tokens(F.col("text"))).alias("n_tokens")
    )
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.min("n_chunk_tokens").alias("min_ct"),
            F.max("chunk_idx").alias("max_idx"),
        )
        .join(docs, "doc_id")
        .collect()
    )
    assert per_doc
    for r in per_doc:
        expected = 1 + math.floor((r.n_tokens - 1) / _STRIDE)
        assert r.n_chunks == expected, r
        assert r.max_idx == expected - 1
        assert r.min_ct >= 1
        # last chunk touches the final token
        last_start = r.max_idx * _STRIDE + 1
        assert last_start + min(_CHUNK, r.n_tokens - last_start + 1) - 1 == (
            r.n_tokens
        )


def test_pack_sequences_is_exact_prefix_sum(spark):
    """tok_offset must equal the running token total in doc_id order —
    i.e. the distributed bucket-offset cumsum agrees with a driver-side
    sequential scan."""
    rows = (
        REG["pack_sequences_fixed"]
        .spark_fn(spark, SF)
        .orderBy("doc_id")
        .collect()
    )
    acc = 0
    for r in rows:
        assert r.tok_offset == acc, (r.doc_id, r.tok_offset, acc)
        assert r.first_seq <= r.last_seq
        acc += r.n_tokens


def test_epoch_shuffle_is_permutation(spark):
    """Every doc appears exactly once; (shard, pos) is dense per
    shard; a second run is byte-identical (no RNG anywhere)."""
    df = REG["epoch_shuffle_shards"].spark_fn(spark, SF)
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in df.collect())
    assert a == b
    n_docs = len({r[0] for r in a})
    assert len(a) == n_docs
    by_shard: dict[int, list[int]] = {}
    for _, shard, pos in a:
        by_shard.setdefault(shard, []).append(pos)
    for shard, poss in by_shard.items():
        assert 0 <= shard < 16
        assert sorted(poss) == list(range(len(poss)))


def test_source_cap_binds_and_is_deterministic(spark):
    from swat_mapreduce_spark.queries.training_pipeline import _CAP

    df = REG["source_domain_cap"].spark_fn(spark, SF)
    per_src = df.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()
    assert per_src
    assert all(r.c <= _CAP for r in per_src)
    # the cap actually filters something at this SF (vacuity guard)
    from swat_mapreduce_spark.sources.readers import read_table

    total = read_table(spark, SF, "documents").count()
    assert df.count() < total


def test_temperature_mix_flattens_toward_uniform(spark):
    """alpha<1 keeps a LARGER fraction of smaller sources: keep-rate
    ordering must anti-correlate with source size, and the gate must
    be deterministic."""
    df = REG["temperature_mix_sources"].spark_fn(spark, SF)
    rows = {r.source: (r.n_total, r.n_kept) for r in df.collect()}
    again = {r.source: (r.n_total, r.n_kept) for r in
             REG["temperature_mix_sources"].spark_fn(spark, SF).collect()}
    assert rows == again
    assert all(0 <= k <= t for t, k in rows.values())
    # smallest source keeps rate 1.0 by construction
    smallest = min(rows, key=lambda s: rows[s][0])
    assert rows[smallest][1] == rows[smallest][0]


def test_source_cap_scaled_equals_single_window(spark):
    """The two-level (bucketed, offset-merged, pruned) rank must pick
    exactly the same rows with exactly the same ranks as the
    single-window form — it is the same deterministic hash order,
    just computed without a whole-source window partition."""
    base = {
        (r.doc_id, r.source, r.rank_in_source)
        for r in REG["source_domain_cap"].spark_fn(spark, SF).collect()
    }
    scaled = {
        (r.doc_id, r.source, r.rank_in_source)
        for r in REG["source_domain_cap_scaled"].spark_fn(spark, SF).collect()
    }
    assert base == scaled and base


def test_source_cap_scaled_prunes_before_window(spark):
    """The bucket-offset prune must appear BELOW the rank window in
    the plan: a filter on `off` feeds the window, so a mega-source's
    tail buckets never reach it."""
    from swat_mapreduce_spark.plans.explain import formatted_plan

    plan = formatted_plan(
        REG["source_domain_cap_scaled"].spark_fn(spark, SF)
    )
    # window partitions on (source, bkt), never bare source
    assert "windowspecdefinition(source" not in plan.replace(
        "source#", "source_"
    ) or "bkt" in plan
    assert "BroadcastHashJoin" in plan  # bounded offset table broadcast
