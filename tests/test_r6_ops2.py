"""Invariant tests for the round-6 data-selection and quality-audit
packs — semantic properties the oracle hash-compare can't express
(chunking partitions the text, shares sum to one, silhouette bounds,
skew-audit self-consistency)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from swat_mapreduce_spark.queries import load_all


def _q(name):
    return load_all()[name]


def test_dsir_selected_iff_positive_and_target_scores_higher(spark, sf_dir):
    rows = _q("dsir_importance_weights").spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["selected"] == (r["weight"] > 0) or r["weight"] == 0.0
        assert r["n_toks"] > 0
    en = [r["weight_per_1k"] for r in rows if r["lang"] == "en"]
    other = [r["weight_per_1k"] for r in rows if r["lang"] != "en"]
    assert en and other
    # the model is TRAINED to separate en from the raw mix — its mean
    # per-1k-token weight must rank en above the non-target languages
    assert sum(en) / len(en) > sum(other) / len(other)


def test_cdc_chunks_partition_the_text(spark, sf_dir):
    """Concatenating a document's chunks in order must reproduce the
    document exactly — the boundary rule segments, never drops."""
    from swat_mapreduce_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents").limit(8)
    d = docs.select("doc_id", F.col("text").alias("t"))
    s = d.select(
        "doc_id",
        "t",
        F.concat(
            F.array(F.lit(1)),
            F.when(
                F.length("t") >= 9,
                F.expr(
                    "filter(sequence(2, length(t) - 7),"
                    " i -> substr(md5(substr(t, i, 8)), 1, 1) = '0')"
                ),
            ).otherwise(F.expr("array()").cast("array<int>")),
        ).alias("starts"),
    )
    rows = s.select(
        "doc_id",
        "t",
        F.expr(
            "transform(starts, (st, j) -> substr(t, st,"
            " coalesce(try_element_at(starts, j + 2), length(t) + 1)"
            " - st))"
        ).alias("cks"),
    ).collect()
    assert rows
    for r in rows:
        assert "".join(r["cks"]) == r["t"]
        assert all(len(c) >= 1 for c in r["cks"])


def test_skew_audit_self_consistency(spark, sf_dir):
    rows = _q("shuffle_key_skew_audit").spark_fn(spark, sf_dir).collect()
    assert rows
    total_keys = rows[0]["total_keys"]
    total_rows = rows[0]["total_rows"]
    assert sum(r["n_keys"] for r in rows) == total_keys
    assert sum(r["bucket_rows"] for r in rows) == total_rows
    max_cnt = rows[0]["max_cnt"]
    top_bucket = max(r["log2_bucket"] for r in rows)
    assert 2**top_bucket <= max_cnt < 2 ** (top_bucket + 1)
    assert abs(rows[0]["max_key_share"] - max_cnt / total_rows) < 1e-6
    assert (
        abs(
            rows[0]["skew_factor"]
            - max_cnt * total_keys / total_rows
        )
        < 5e-4
    )


def test_knn_agreement_bounds(spark, sf_dir):
    rows = _q("knn_label_agreement").spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["avg_agreement"] <= 1.0
        assert r["n_neighbors"] <= r["n_anchors"] * 10
        assert r["n_same"] <= r["n_neighbors"]


def test_silhouette_matches_numpy_ground_truth(spark, sf_dir):
    """Cross-check the distributed centroid-silhouette against a dense
    numpy computation of the same definition. (The synthetic clusters
    are WEAK — 96-dim noise dominates — so per-vector nearest-other
    distance sits slightly BELOW own-centroid distance; a naive
    'clusters must be cohesive' assertion is wrong for this data. An
    exact value check is the stronger invariant regardless.)"""
    import numpy as np

    rows = _q("embedding_silhouette_audit").spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["avg_silhouette"] <= 1.0
        assert r["avg_dist_own"] >= 0
        assert r["avg_dist_other"] >= 0

    import duckdb

    df = duckdb.connect().execute(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    ).df()
    X = np.vstack(df.embedding.values).astype(np.float64)
    lab = df.label.values
    labs = np.unique(lab)
    C = np.vstack([X[lab == l].mean(axis=0) for l in labs])
    D = np.linalg.norm(X[:, None, :] - C[None, :, :], axis=2)
    own_idx = np.searchsorted(labs, lab)
    a = D[np.arange(len(X)), own_idx]
    Dm = D.copy()
    Dm[np.arange(len(X)), own_idx] = np.inf
    b = Dm.min(axis=1)
    s = (b - a) / np.maximum(a, b)
    got = {r["label"]: r for r in rows}
    for l in labs:
        m = lab == l
        r = got[int(l)]
        assert r["n_vectors"] == int(m.sum())
        # query rounds to 4dp after decimal-exact sums; numpy sums in
        # double with different order — allow a 2e-4 band
        assert abs(r["avg_dist_own"] - a[m].mean()) < 2e-4
        assert abs(r["avg_dist_other"] - b[m].mean()) < 2e-4
        assert abs(r["avg_silhouette"] - s[m].mean()) < 2e-4


def test_benford_audit_shares_and_chi2(spark, sf_dir):
    from swat_mapreduce_spark.sources.readers import read_table

    rows = _q("benford_digit_audit").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 9
    n_orders = read_table(spark, sf_dir, "orders").count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r["chi2"] == rows[0]["chi2"] >= 0
        expected = math.log10(1 + 1 / r["digit"])
        assert abs(r["benford_share"] - expected) < 1e-6
