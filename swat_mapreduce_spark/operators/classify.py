"""The reference pipeline, Spark-first: manifest → clean → score →
softmax/top-1 → label join → error fallback → formatted, key-sorted
predictions.

Reproduces the end-to-end dataflow of ``thanhbinh2701/SWAT_mapreduce``
(SURVEY.md §3) with its exact semantic warts (SURVEY.md §5 item 3):

* blank/whitespace-only manifest lines skipped after trim
  (java/PredictBatchMapperCluster.java:48-49)
* ``#``-comment lines skipped (java/PredictBatchMapperCluster.java:114)
* UTF-8 BOM NOT stripped (imagelist1.txt ships one; the mapper only
  trims whitespace)
* unreadable image → ``(path, class_names[0], 0.0)`` — emitted, not
  dropped, not null (python/predict_batch_threaded_local.py:100-108)
* out-of-range class index → class_names[0]
  (python/predict_batch_threaded_local.py:159)
* duplicate manifest lines → duplicate output rows (identity reduce,
  java/PredictReducerCSV.java:9-11 — no dedup)
* probability rendered ``%.4f`` (python/predict_batch_threaded_local.py:160)
* output key-sorted by image_path (MR shuffle sort, SURVEY.md §2A #18)

The model itself is replaced by the deterministic md5-logit stand-in
(functions/hashing.py, FIXTURES.md §B3) so every stage is
oracle-checkable in DuckDB; the real Arrow-batched inference surface
(pluggable scorer, torch-gated) lives in operators/inference.py.

Scale notes: scoring is per-row JVM expression work (no shuffle, no
Python); the label join broadcasts a 30-row dim; the only shuffle in
the whole plan is the final global sort, which the reference also pays
(its MR key-sort) — and which a 100 TB run would replace with
``sortWithinPartitions`` unless a totally-ordered output is demanded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R

from swat_mapreduce_spark.functions import arrays as A
from swat_mapreduce_spark.functions import hashing as H
from swat_mapreduce_spark.functions.text import format_prob
from swat_mapreduce_spark.labels import CLASS_NAMES, NUM_CLASSES, labels_df

# Wart lines injected into the synthetic manifest (FIXTURES.md §B1).
# Shared constant between the Spark builder and the DuckDB oracle.
WART_LINES: list[str] = [
    "",  # blank → skipped
    "   ",  # whitespace-only → skipped
    "# commented.jpg",  # comment → skipped
    "﻿/data/img/src0/en_0.jpg",  # BOM kept (reference wart)
    "  /data/img/pad/es_1.jpg  ",  # whitespace-trimmed
]
DUP_MOD = 7  # doc_id % 7 == 0 rows appear twice (identity-reduce wart)


def synth_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic manifest (FIXTURES.md §B1) derived from the
    ``documents`` table: one image path per document, ~1/7 duplicated,
    plus the wart lines. Column: ``line string``."""
    from swat_mapreduce_spark.sources.readers import fan_out, read_table

    # fanned out so the downstream 30-logit md5 scoring (score()) is
    # not serialized by the testdata's single-row-group scan
    docs = fan_out(read_table(spark, sf_dir, "documents"))
    path = F.concat(
        F.lit("/data/img/"),
        F.col("source"),
        F.lit("/"),
        F.col("lang"),
        F.lit("_"),
        F.col("doc_id").cast("string"),
        F.lit(".jpg"),
    ).alias("line")
    # single scan: rows with doc_id % DUP_MOD == 0 are exploded twice
    # (same multiset as the oracle's self-UNION, half the parquet reads)
    base = docs.select(
        F.explode(
            F.when(
                F.col("doc_id") % DUP_MOD == 0, F.array(path, path)
            ).otherwise(F.array(path))
        ).alias("line")
    )
    warts = spark.createDataFrame([(w,) for w in WART_LINES], "line string")
    return base.unionAll(warts)


def manifest_sql_duck(sf_dir: str) -> str:
    """DuckDB CTE body producing the identical manifest (oracle side).
    DuckDB views for the tables are pre-registered by the driver."""
    path = "'/data/img/' || source || '/' || lang || '_' || doc_id::VARCHAR || '.jpg'"
    warts = []
    for w in WART_LINES:
        if "﻿" in w:
            warts.append(
                "SELECT chr(65279) || '" + w.replace("﻿", "") + "' AS line"
            )
        else:
            warts.append(f"SELECT '{w}' AS line")
    wart_sql = " UNION ALL ".join(warts)
    return f"""
        SELECT {path} AS line FROM documents
        UNION ALL
        SELECT {path} AS line FROM documents WHERE doc_id % {DUP_MOD} = 0
        UNION ALL {wart_sql}
    """


def clean_manifest(manifest: DataFrame) -> DataFrame:
    """Trim + drop blank + drop ``#``-comment lines → ``image_path``.

    SURVEY.md §2A #2,#3. BOM survives (it is not whitespace and the
    reference never strips it)."""
    return (
        manifest.select(F.trim("line").alias("image_path"))
        .filter(F.length("image_path") > 0)
        .filter(~F.col("image_path").startswith("#"))
    )


CLEAN_SQL_DUCK = """
    SELECT trim(line) AS image_path FROM manifest
    WHERE length(trim(line)) > 0 AND substr(trim(line), 1, 1) <> '#'
"""


def score(paths: DataFrame, path_col: str = "image_path") -> DataFrame:
    """Attach deterministic logits + decode flag (FIXTURES.md §B3).

    Pure JVM expressions — whole-stage codegen, zero shuffle. The real
    model path swaps this stage for operators/inference.py."""
    c = F.col(path_col)
    return paths.withColumn(
        "logits", H.logits_array(c, NUM_CLASSES)
    ).withColumn("decode_ok", H.decode_ok(c))


def predict_top1(scored: DataFrame) -> DataFrame:
    """softmax → argmax → error fallback (SURVEY.md §2A #11-13).

    decode failure → (class index 0, prob 0.0), matching
    python/predict_batch_threaded_local.py:100-108."""
    return scored.select(
        "image_path",
        F.when(F.col("decode_ok"), A.argmax(F.col("logits")))
        .otherwise(F.lit(0))
        .alias("pred_idx"),
        F.when(F.col("decode_ok"), A.top1_prob(F.col("logits")))
        .otherwise(F.lit(0.0))
        .alias("prob"),
    )


def attach_labels(
    preds: DataFrame, spark: SparkSession, labels_path: str | None = None
) -> DataFrame:
    """Broadcast-join the label dict; out-of-range index →
    class_names[0] (python/predict_batch_threaded_local.py:159).

    ``labels_path`` loads a custom vocabulary with the reference's
    derivation rules (file lines / sorted dir names / sorted stems,
    labels.derive_class_names); default is the built-in 30-class set.
    """
    if labels_path is None:
        names = CLASS_NAMES
        labels = labels_df(spark)
    else:
        from swat_mapreduce_spark.labels import derive_class_names

        names = derive_class_names(labels_path)
        labels = spark.createDataFrame(
            list(enumerate(names)), "label_idx int, class_name string"
        )
    return (
        preds.join(F.broadcast(labels), preds.pred_idx == labels.label_idx, "left")
        .withColumn("class", F.coalesce("class_name", F.lit(names[0])))
        .drop("label_idx", "class_name")
    )


def classify_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship end-to-end query (entry() / bench headline).

    Output: ``(image_path, class, prob double(4dp), prob_str '%.4f')``
    sorted by image_path, duplicates preserved."""
    manifest = synth_manifest(spark, sf_dir)
    preds = predict_top1(score(clean_manifest(manifest)))
    labeled = attach_labels(preds, spark)
    return labeled.select(
        "image_path",
        "class",
        R.r("prob", 4).alias("prob"),
        format_prob("prob").alias("prob_str"),
    ).orderBy("image_path")


# ---------------------------------------------------------------------------
# DuckDB oracle for the full pipeline. Structure: score DISTINCT paths
# (the math is deterministic per path), then join back to the cleaned
# manifest so duplicate lines yield duplicate rows.
# ---------------------------------------------------------------------------

def classify_oracle_sql(sf_dir: str) -> str:
    from swat_mapreduce_spark.labels import labels_values_sql

    logit = H.duck_logit("p.image_path", "g.i")
    ok = H.duck_decode_ok("c.image_path")
    return f"""
WITH manifest(line) AS ({manifest_sql_duck(sf_dir)}),
cleaned AS ({CLEAN_SQL_DUCK}),
paths AS (SELECT DISTINCT image_path FROM cleaned),
li AS (
    SELECT p.image_path, g.i, {logit} AS logit
    FROM paths p, generate_series(0, {NUM_CLASSES - 1}) AS g(i)
),
sc AS (
    SELECT image_path, max(logit) AS mx, sum(exp(logit)) AS denom
    FROM li GROUP BY image_path
),
am AS (
    SELECT li.image_path, min(li.i) AS pred_raw,
           any_value(sc.mx) AS mx, any_value(sc.denom) AS denom
    FROM li JOIN sc ON li.image_path = sc.image_path AND li.logit = sc.mx
    GROUP BY li.image_path
),
pred AS (
    SELECT c.image_path,
           CASE WHEN {ok} THEN am.pred_raw ELSE 0 END AS pred_idx,
           CASE WHEN {ok} THEN exp(am.mx) / am.denom ELSE 0.0 END AS prob
    FROM cleaned c JOIN am ON c.image_path = am.image_path
)
SELECT pred.image_path,
       coalesce(labels.class_name, '{CLASS_NAMES[0]}') AS class,
       round(prob, 4) AS prob,
       printf('%.4f', prob) AS prob_str
FROM pred LEFT JOIN {labels_values_sql()} ON pred.pred_idx = labels.label_idx
ORDER BY pred.image_path
"""
