"""Remaining SURVEY §2A parity pieces: label-dict derivation rules
(#22), artifact distribution via SparkFiles (#21), MR-style
repartition+sortWithinPartitions (#18)."""

from __future__ import annotations

import os

from pyspark import SparkFiles
from pyspark.sql import functions as F

from swat_mapreduce_spark.labels import derive_class_names


def test_derive_labels_from_file(tmp_path):
    p = tmp_path / "labels.txt"
    p.write_text("zeta\n\n  alpha  \nmid\n")
    # file rule: stripped non-empty lines, ORDER PRESERVED (not sorted)
    assert derive_class_names(str(p)) == ["zeta", "alpha", "mid"]


def test_derive_labels_from_dir(tmp_path):
    for d in ["shoes", "clothing", "eggshells"]:
        (tmp_path / d).mkdir()
    (tmp_path / ".DS_Store").write_text("")  # junk file, ignored (dirs win)
    assert derive_class_names(str(tmp_path)) == [
        "clothing",
        "eggshells",
        "shoes",
    ]


def test_derive_labels_from_file_stems(tmp_path):
    for f in ["b_class.json", "a_class.json"]:
        (tmp_path / f).write_text("{}")
    assert derive_class_names(str(tmp_path)) == ["a_class", "b_class"]


def test_artifact_distribution_sparkfiles(spark, tmp_path):
    """Distributed-cache parity (java/PredictDriverCluster.java:45-51):
    sc.addFile ships an artifact; executors resolve it via SparkFiles."""
    art = tmp_path / "checkpoint_meta.txt"
    art.write_text("model_cfg=vitb32_openclip_laion400m")
    spark.sparkContext.addFile(str(art))

    def read_artifact(_):
        p = SparkFiles.get("checkpoint_meta.txt")
        with open(p) as f:
            return [f.read()]

    out = spark.sparkContext.parallelize([1, 2], 2).flatMap(read_artifact).collect()
    assert out == ["model_cfg=vitb32_openclip_laion400m"] * 2


def test_repartition_sort_within_partitions(spark, sf_dir):
    """The MR shuffle contract (SURVEY §2A #18): hash-partition by key,
    key-sorted within each partition — without a global sort."""
    from swat_mapreduce_spark.operators.classify import (
        classify_pipeline,
    )

    preds = (
        classify_pipeline(spark, sf_dir)
        .repartition(4, "image_path")
        .sortWithinPartitions("image_path")
    )

    def check_sorted(it):
        keys = [r.image_path for r in it]
        yield keys == sorted(keys)

    assert all(preds.rdd.mapPartitions(check_sorted).collect())
