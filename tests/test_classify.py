"""Wart-for-wart semantics of the reference pipeline (SURVEY.md §5
item 3, FIXTURES.md §B): blank/comment skip, BOM preservation,
duplicate passthrough, error fallback, %.4f, key-sort."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from swat_mapreduce_spark.labels import CLASS_NAMES
from swat_mapreduce_spark.operators import classify


def test_clean_manifest_warts(spark, sf_dir):
    manifest = classify.synth_manifest(spark, sf_dir)
    cleaned = classify.clean_manifest(manifest).collect()
    paths = [r.image_path for r in cleaned]
    # blank / whitespace-only / comment lines are gone
    assert "" not in paths
    assert not any(p.startswith("#") for p in paths)
    # BOM is NOT stripped (reference wart: imagelist1.txt ships one)
    assert any(p.startswith("﻿") for p in paths)
    # whitespace-padded line was trimmed
    assert "/data/img/pad/es_1.jpg" in paths


def test_duplicates_preserved(spark, sf_dir):
    """Identity reduce (java/PredictReducerCSV.java:9-11): duplicate
    manifest lines → duplicate output rows."""
    out = classify.classify_pipeline(spark, sf_dir).collect()
    by_path: dict[str, int] = {}
    for r in out:
        by_path[r.image_path] = by_path.get(r.image_path, 0) + 1
    dup_counts = {p: c for p, c in by_path.items() if c > 1}
    assert dup_counts, "expected duplicated manifest paths in output"
    # duplicated rows must be identical (same class/prob)
    seen = {}
    for r in out:
        key = (r.image_path, r["class"], r.prob)
        seen.setdefault(r.image_path, set()).add(key)
    for p in dup_counts:
        assert len(seen[p]) == 1


def test_error_fallback_rows(spark, sf_dir):
    """decode failure → (path, class_names[0], 0.0), emitted not
    dropped (python/predict_batch_threaded_local.py:100-108)."""
    out = classify.classify_pipeline(spark, sf_dir).collect()
    fallback = [r for r in out if r.prob == 0.0]
    assert fallback, "~5% of paths should take the decode-failure path"
    assert all(r["class"] == CLASS_NAMES[0] for r in fallback)
    assert all(r.prob_str == "0.0000" for r in fallback)
    # and the failing paths are exactly the hash-designated ones
    for r in fallback[:5]:
        h = hashlib.md5(f"{r.image_path}:decode".encode()).hexdigest()[:2]
        assert int(h, 16) < 13


def test_output_sorted_and_formatted(spark, sf_dir):
    out = classify.classify_pipeline(spark, sf_dir).collect()
    paths = [r.image_path for r in out]
    assert paths == sorted(paths), "MR key-sort order (SURVEY §2A #18)"
    for r in out[:20]:
        assert r.prob_str == f"{r.prob:.4f}" or abs(float(r.prob_str) - r.prob) < 1e-9
        assert r["class"] in CLASS_NAMES


def test_argmax_first_index_tiebreak(spark):
    """torch.max returns the FIRST maximal index; array_position does
    the same — pin it with a constructed tie."""
    from swat_mapreduce_spark.functions import arrays as A

    df = spark.createDataFrame([([1.0, 3.0, 3.0, 0.0],)], "arr array<double>")
    row = df.select(A.argmax(F.col("arr")).alias("i")).first()
    assert row.i == 1


def test_tsv_sink_reference_format(spark, sf_dir, tmp_path):
    """TextOutputFormat parity: ``path\\tclass,prob`` lines
    (java/PredictDriverCluster.java:39,43)."""
    from swat_mapreduce_spark.sources.sinks import write_predictions_tsv

    preds = classify.classify_pipeline(spark, sf_dir).limit(50)
    out_dir = str(tmp_path / "tsv_out")
    write_predictions_tsv(preds, out_dir)
    lines = spark.read.text(out_dir).collect()
    assert lines
    for r in lines:
        path_part, kv = r.value.split("\t")
        cls, prob = kv.rsplit(",", 1)
        assert cls in CLASS_NAMES
        float(prob)  # %.4f parses
        assert len(prob.split(".")[1]) == 4
