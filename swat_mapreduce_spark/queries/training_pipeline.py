"""Training-data-preparation operators: document chunking, sequence
packing, epoch sharding, per-source caps, vocabulary OOV analysis.

These are the pipeline stages between "cleaned corpus" (llm_text.py /
dedup.py) and "tokens on a trainer": every one is a standard step in
assembling a 100 TB pretraining mix, expressed as JVM-side DataFrame
ops with DuckDB oracles. No Python UDFs anywhere — chunk geometry,
hashes and ranks are all codegen'd expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import hashing as H
from swat_mapreduce_spark.functions.text import ws_tokens
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

# --- sliding-window document chunking --------------------------------------
# Context-window chunking with overlap (RAG / long-doc pretraining):
# token windows of CHUNK starting every STRIDE tokens. 1→N row
# expansion is a narrow map (sequence + posexplode) — no shuffle at
# all; at 100 TB the output is written straight back out partitioned
# by source. Chunk text is materialized via slice+join so the oracle
# pins content, not just geometry.

_CHUNK, _STRIDE = 64, 48

# Zero-token docs are filtered identically on both engines (Spark's
# ws_tokens('') is [] so sequence(1,0,..) would throw; DuckDB's
# string_split_regex('') is [''] and would emit a phantom chunk —
# length(trim(text)) > 0 is exactly "has at least one token" on both).
_CHUNK_ORACLE = rf"""
WITH t AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
    FROM documents WHERE length(trim(text)) > 0
),
starts AS (
    SELECT doc_id, toks, unnest(generate_series(1, len(toks), {_STRIDE})) AS s
    FROM t
)
SELECT doc_id,
       ((s - 1) / {_STRIDE})::BIGINT AS chunk_idx,
       least({_CHUNK}, len(toks) - s + 1)::BIGINT AS n_chunk_tokens,
       array_to_string(toks[s : s + {_CHUNK} - 1], ' ') AS chunk_text
FROM starts
"""


@register("chunk_documents_sliding", oracle=_CHUNK_ORACLE)
def chunk_documents_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = ws_tokens(F.col("text"))
    with_toks = docs.select("doc_id", toks.alias("toks"))
    starts = with_toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(1), F.size("toks"), F.lit(_STRIDE))
        ).alias("s"),
    )
    return starts.select(
        "doc_id",
        ((F.col("s") - 1) / _STRIDE).cast("long").alias("chunk_idx"),
        F.least(
            F.lit(_CHUNK), F.size("toks") - F.col("s") + 1
        ).cast("long").alias("n_chunk_tokens"),
        F.array_join(F.slice("toks", F.col("s"), _CHUNK), " ").alias(
            "chunk_text"
        ),
    )


# --- fixed-budget sequence packing -----------------------------------------
# GPT-style concat-then-chunk packing: documents in doc_id order are
# conceptually concatenated and cut into training sequences of SEQ
# tokens; each doc reports the sequence range it lands in. The global
# prefix sum does NOT use a single-partition window: the key space is
# range-bucketed, per-bucket token totals (a tiny aggregate) are
# turned into broadcast offsets, and the window runs per bucket —
# the same distributed-cumsum shape as stable_row_ids
# (relational5.py), parallelism = bucket count.

_SEQ = 256

# Same zero-token filter as chunking: DuckDB would count an empty doc
# as 1 token (split('') = ['']), Spark as 0 — excluded on both sides.
_PACK_ORACLE = rf"""
WITH t AS (
    SELECT doc_id,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens
    FROM documents WHERE length(trim(text)) > 0
),
c AS (
    SELECT doc_id, n_tokens,
           sum(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING
           ) AS cum_before
    FROM t
)
SELECT doc_id, n_tokens,
       coalesce(cum_before, 0)::BIGINT AS tok_offset,
       (coalesce(cum_before, 0) // {_SEQ})::BIGINT AS first_seq,
       ((coalesce(cum_before, 0) + n_tokens - 1) // {_SEQ})::BIGINT AS last_seq
FROM c
"""


@register("pack_sequences_fixed", oracle=_PACK_ORACLE)
def pack_sequences_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    parts = 8
    with_n = docs.select(
        "doc_id", F.size(ws_tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    mn, mx = with_n.agg(F.min("doc_id"), F.max("doc_id")).first()
    if mn is None:  # empty corpus: any constant binning works
        mn, mx = 0, 0
    span = mx - mn + 1
    bucket = F.floor(((F.col("doc_id") - mn) * parts) / span).cast("int")
    bucketed = with_n.withColumn("_b", bucket)
    # tiny job: one row per bucket → broadcast cumulative token offsets
    totals = {
        r["_b"]: r["t"]
        for r in bucketed.groupBy("_b")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    offsets, acc = [], 0
    for b in range(parts):
        offsets.append(acc)
        acc += totals.get(b, 0)
    offset_map = F.create_map(
        *[F.lit(x) for b in range(parts) for x in (b, offsets[b])]
    )
    w = (
        Window.partitionBy("_b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    tok_offset = (F.element_at(offset_map, F.col("_b")) + local_before).cast(
        "long"
    )
    return bucketed.select(
        "doc_id",
        "n_tokens",
        tok_offset.alias("tok_offset"),
        F.floor(tok_offset / _SEQ).cast("long").alias("first_seq"),
        F.floor((tok_offset + F.col("n_tokens") - 1) / _SEQ)
        .cast("long")
        .alias("last_seq"),
    )


# --- deterministic epoch shuffle into shards -------------------------------
# Training-order shuffling without a global sort: md5(doc_id:epoch)
# assigns each doc a pseudorandom key; the first nibble buckets it
# into 16 shards and the order WITHIN a shard is the key order. A
# trainer streams shards in index order → a full deterministic
# permutation of the corpus, reproducible across engines and epochs,
# with per-shard windows as the only shuffle (no single-task global
# orderBy — the classic epoch-shuffle scale trap).

_EPOCH_SALT = "'epoch1'"
_ES_KEY_DUCK = f"md5(doc_id || ':' || {_EPOCH_SALT})"

_EPOCH_ORACLE = f"""
WITH k AS (
    SELECT doc_id, {_ES_KEY_DUCK} AS key,
           ('0x' || substr({_ES_KEY_DUCK}, 1, 1))::BIGINT AS shard
    FROM documents
)
SELECT doc_id, shard,
       (row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) - 1)::BIGINT
           AS pos_in_shard
FROM k
"""


@register("epoch_shuffle_shards", oracle=_EPOCH_ORACLE)
def epoch_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    key = F.md5(H.salted(F.col("doc_id"), "epoch1"))
    keyed = docs.select(
        "doc_id",
        key.alias("key"),
        F.conv(F.substring(key, 1, 1), 16, 10).cast("long").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("key", "doc_id")
    return keyed.select(
        "doc_id",
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("pos_in_shard"),
    )


# --- per-source document caps ----------------------------------------------
# Corpus-mix governance: no source may contribute more than CAP docs,
# chosen deterministically by hash order (not "first N by doc_id",
# which would bias toward old crawls). One shuffle on source; at
# 100 TB a skewed mega-source is the hot key — the window is a
# rank-truncation, so AQE skew handling or pre-salting with a
# two-level rank both apply; the cap itself keeps downstream bounded.

# 15 binds at every testdata scale (sources hold ≤25 docs at each sf —
# a cap above that would filter nothing and make the oracle vacuous)
_CAP = 15
_CAP_KEY_DUCK = "md5(doc_id || ':' || 'cap')"

_CAP_ORACLE = f"""
WITH r AS (
    SELECT doc_id, source,
           row_number() OVER (
               PARTITION BY source ORDER BY {_CAP_KEY_DUCK}, doc_id
           ) AS rn
    FROM documents
)
SELECT doc_id, source, rn::BIGINT AS rank_in_source
FROM r WHERE rn <= {_CAP}
"""


@register("source_domain_cap", oracle=_CAP_ORACLE)
def source_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    key = F.md5(H.salted(F.col("doc_id"), "cap"))
    w = Window.partitionBy("source").orderBy(key, F.col("doc_id"))
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _CAP)
        .select(
            "doc_id", "source", F.col("rn").cast("long").alias("rank_in_source")
        )
    )


# --- per-source document caps, two-level rank (the mega-source form) -------
# Same semantics and SAME ORACLE as source_domain_cap — but the rank
# is computed without ever putting a whole source in one window
# partition, which is exactly the shape a 100 TB mega-source breaks
# (SCALING.md previously documented this as the family's known
# weakness; this operator is the fix, pinned equal to the
# single-window form by tests/test_training_prep.py).
#
# Trick: range-bucket each row by the FIRST HEX NIBBLE of its cap key
# (buckets are ordered by key prefix, so in-bucket rank + count of
# lower buckets == the single-window rank in identical order), then:
#   1. one tiny aggregate → |sources| × 16 bucket counts,
#   2. prefix-sum offsets over that bounded table (broadcast back),
#   3. PRUNE buckets whose offset already exceeds the cap — a
#      mega-source's millions of rows die before any window runs,
#   4. row_number within (source, bucket) — partitions are 1/16th of
#      a source at worst (use 2+ nibbles = 256+ buckets at real
#      scale; 16 keeps the test-scale oracle exercise non-vacuous).

_CAP_BUCKET_NIBBLES = 1


@register("source_domain_cap_scaled", oracle=_CAP_ORACLE)
def source_domain_cap_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    key = F.md5(H.salted(F.col("doc_id"), "cap"))
    keyed = docs.select(
        "doc_id",
        "source",
        key.alias("key"),
        F.conv(F.substring(key, 1, _CAP_BUCKET_NIBBLES), 16, 10)
        .cast("int")
        .alias("bkt"),
    )
    counts = keyed.groupBy("source", "bkt").agg(
        F.count(F.lit(1)).alias("c")
    )
    woff = Window.partitionBy("source").orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "source",
        "bkt",
        F.coalesce(F.sum("c").over(woff), F.lit(0)).alias("off"),
    )
    pruned = keyed.join(F.broadcast(offsets), ["source", "bkt"]).filter(
        F.col("off") < _CAP
    )
    w = Window.partitionBy("source", "bkt").orderBy("key", "doc_id")
    return (
        pruned.withColumn("rn", F.col("off") + F.row_number().over(w))
        .filter(F.col("rn") <= _CAP)
        .select(
            "doc_id",
            "source",
            F.col("rn").cast("long").alias("rank_in_source"),
        )
    )


# --- OOV rate vs a top-K vocabulary ----------------------------------------
# Tokenizer-design staple: build the top-K vocab by corpus frequency
# (ties → lexicographic), then measure per-language OOV token rate
# against it. Two aggregation shuffles (token counts, per-lang stats)
# plus one BROADCAST join — the vocab is K rows by construction, so
# the membership probe never shuffles the token stream.

_VOCAB_K = 64

_OOV_ORACLE = rf"""
WITH tok AS (
    SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS token
    FROM documents
),
vocab AS (
    SELECT token FROM (
        SELECT token, count(*) AS c,
               row_number() OVER (ORDER BY count(*) DESC, token) AS rn
        FROM tok GROUP BY token
    ) WHERE rn <= {_VOCAB_K}
)
SELECT lang,
       count(*) AS n_tokens,
       count(*) FILTER (WHERE token NOT IN (SELECT token FROM vocab))
           AS n_oov,
       round(count(*) FILTER (
           WHERE token NOT IN (SELECT token FROM vocab)
       )::DOUBLE / count(*), 4) AS oov_rate
FROM tok
GROUP BY lang
"""


@register("oov_rate_topk_vocab", oracle=_OOV_ORACLE)
def oov_rate_topk_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions import rounding as R

    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(ws_tokens(F.col("text"))).alias("token")
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "token")
        .limit(_VOCAB_K)
        .select("token")
    )
    flagged = tok.join(
        F.broadcast(vocab.withColumn("_in_vocab", F.lit(1))),
        "token",
        "left",
    )
    n_oov = F.sum(
        F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
    ).cast("long")
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        n_oov.alias("n_oov"),
        R.r(
            n_oov.cast("double") / F.count(F.lit(1)), 4
        ).alias("oov_rate"),
    )


# --- temperature-weighted source mixing ------------------------------------
# Corpus-mix resampling with temperature alpha: source s is kept at
# rate proportional to count(s)^(alpha-1) (alpha<1 flattens the mix
# toward uniform — the multilingual-sampling trick). Rates are
# derived FROM the data in a tiny per-source aggregate, normalized so
# the smallest source's rate is 1.0 (pow(n, alpha-1) with alpha<1 is
# decreasing in n, so small sources keep everything), applied as a
# broadcast-
# joined deterministic hash gate — two scans + one broadcast, no
# shuffle of the corpus itself, fully reproducible (no RNG).

_MIX_ALPHA = 0.5

_MIX_ORACLE = f"""
WITH stats AS (
    SELECT source, count(*) AS n FROM documents GROUP BY source
),
rates AS (
    SELECT source,
           pow(n, {_MIX_ALPHA} - 1.0)
               / max(pow(n, {_MIX_ALPHA} - 1.0)) OVER () AS keep_rate
    FROM stats
),
gated AS (
    SELECT d.doc_id, d.source,
           {{H}} < r.keep_rate AS kept
    FROM documents d JOIN rates r ON d.source = r.source
)
SELECT source, count(*) AS n_total,
       count(*) FILTER (WHERE kept) AS n_kept
FROM gated GROUP BY source
""".replace(
    "{H}",
    f"({H.duck_hash_uint(H.sql_salted('d.doc_id', chr(39) + 'mix' + chr(39)), 8)}"
    f" / {float(16 ** 8)})",
)


@register("temperature_mix_sources", oracle=_MIX_ORACLE)
def temperature_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    w_all = Window.partitionBy()
    rates = stats.select(
        "source",
        (
            F.pow("n", F.lit(_MIX_ALPHA - 1.0))
            / F.max(F.pow("n", F.lit(_MIX_ALPHA - 1.0))).over(w_all)
        ).alias("keep_rate"),
    )
    gated = docs.join(F.broadcast(rates), "source").withColumn(
        "kept", H.hash_unit(F.col("doc_id"), "mix", 8) < F.col("keep_rate")
    )
    return gated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
    )


# --- weighted sampling without replacement (A-Res) -------------------------
# Efraimidis–Spirakis reservoir sampling as a dataflow: each doc draws
# a deterministic md5-uniform u ∈ (0,1) and competes on
# key = ln(u)/w (the monotone form of u^(1/w)); the global top-m by
# key IS an exact weighted sample without replacement. This is how a
# training pipeline takes an importance-weighted corpus subsample in
# ONE pass: narrow key math + TakeOrderedAndProject (per-partition
# heaps, no global sort). Weights here are n_chars (longer docs more
# likely kept).
_ARES_M = 50

_ARES_ORACLE = f"""
WITH keyed AS (
    SELECT doc_id, source, n_chars,
           ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 1)
              / 4294967297.0) / n_chars AS k
    FROM documents
)
SELECT doc_id, source, n_chars,
       round(k * 1000000) / 1000000 + 0.0 AS sample_key
FROM keyed
ORDER BY k DESC, doc_id
LIMIT {_ARES_M}
"""


@register("weighted_sample_ares", oracle=_ARES_ORACLE)
def weighted_sample_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / 4294967297.0
    k = F.log(u) / F.col("n_chars")
    return (
        docs.select("doc_id", "source", "n_chars", k.alias("k"))
        .orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(_ARES_M)
        .select(
            "doc_id",
            "source",
            "n_chars",
            (F.round(F.col("k") * 1000000.0) / 1000000.0 + 0.0).alias(
                "sample_key"
            ),
        )
    )


# --- span-corruption prep (UL2/T5-style denoising objectives) --------------
# Deterministic span masking for denoiser training data: tokens are
# grouped into 3-token blocks and a block is masked iff its md5 draw
# (keyed on doc_id|block — reproducible across runs AND engines) hits
# the 1-in-5 rate. The query emits the per-doc corruption accounting
# a data pipeline validates before writing input/target pairs:
# masked-token count, span count, realized corruption rate. Entirely
# narrow — the mask decision is per-block arithmetic in the scan
# stage; no shuffle until the (bounded) output.
_SPANCORR_BLOCK = 3
_SPANCORR_RATE = 5  # 1-in-5 blocks masked

_SPANCORR_ORACLE = rf"""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\s+'),
                       x -> len(x) > 0) AS toks
    FROM documents
),
tok AS (
    SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
    FROM t
),
flags AS (
    SELECT doc_id, i, (i - 1) // {_SPANCORR_BLOCK} AS blk,
           (('0x' || substr(md5(doc_id || '|' ||
               ((i - 1) // {_SPANCORR_BLOCK})), 1, 8))::BIGINT
               % {_SPANCORR_RATE} = 0) AS masked
    FROM tok
)
SELECT doc_id,
       count(*)::BIGINT AS n_tokens,
       sum(CASE WHEN masked THEN 1 ELSE 0 END)::BIGINT AS n_masked,
       count(DISTINCT CASE WHEN masked THEN blk END)::BIGINT AS n_spans,
       round(sum(CASE WHEN masked THEN 1 ELSE 0 END) * 10000.0
             / count(*)) / 10000 + 0.0 AS corruption_rate
FROM flags
GROUP BY doc_id
"""


@register("span_corruption_prep", oracle=_SPANCORR_ORACLE)
def span_corruption_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", ws_tokens(F.col("text")).alias("toks")
    )
    idx = F.sequence(F.lit(1), F.size("toks"))
    tok = docs.select(
        "doc_id", F.explode(idx).alias("i")
    )
    blk = ((F.col("i") - 1) / _SPANCORR_BLOCK).cast("long")
    masked = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("|"),
                        blk.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % _SPANCORR_RATE
        == 0
    )
    flags = tok.select(
        "doc_id", blk.alias("blk"), masked.alias("masked")
    )
    n_masked = F.sum(F.when(F.col("masked"), 1).otherwise(0))
    return flags.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        n_masked.cast("long").alias("n_masked"),
        F.countDistinct(
            F.when(F.col("masked"), F.col("blk"))
        ).alias("n_spans"),
        (
            F.round(n_masked * 10000.0 / F.count(F.lit(1))) / 10000.0
            + 0.0
        ).alias("corruption_rate"),
    )


# --- curriculum ordering ---------------------------------------------------
# Curriculum-learning data prep: order the corpus easy→hard by a
# quality score and cut it into equal curriculum phases. The global
# order comes from operators/ranking.distributed_global_rank (range
# buckets + broadcast offsets — no single-partition window), making
# this the second production caller of that operator; the phase is
# derived from the rank with the exact ntile sizing formula. Scores
# are rounded to 4dp BEFORE ranking so the rank ties (and therefore
# the phases) are decided on values both engines agree on bit-exactly.
_CURRICULUM_PHASES = 4

_CURRICULUM_ORACLE = r"""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\s+'),
                       x -> len(x) > 0) AS toks
    FROM documents
),
f AS (
    SELECT doc_id,
           round((least(1.0, len(toks) / 80.0)
                  + len(list_distinct(toks))::DOUBLE / len(toks))
                 * 10000) / 10000 + 0.0 AS score
    FROM t
),
r AS (
    SELECT doc_id, score,
           row_number() OVER (ORDER BY score DESC, doc_id) AS rnk,
           count(*) OVER () AS n
    FROM f
)
SELECT doc_id, score, rnk::BIGINT AS rnk,
       (((rnk - 1) * 4) // n + 1)::BIGINT AS phase
FROM r
"""


@register("curriculum_order_phases", oracle=_CURRICULUM_ORACLE)
def curriculum_order_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.operators.ranking import (
        distributed_global_rank,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", ws_tokens(F.col("text")).alias("toks")
    )
    n = F.size("toks").cast("double")
    score = (
        F.round(
            (
                F.least(F.lit(1.0), n / 80.0)
                + F.size(F.array_distinct("toks")).cast("double") / n
            )
            * 10000.0
        )
        / 10000.0
        + 0.0
    )
    scored = docs.select("doc_id", score.alias("score"))
    total = scored.count()  # one count job; O(1) driver state
    ranked = distributed_global_rank(
        scored,
        value=-F.col("score"),  # DESC order: rank ascending on -score
        tiebreak=F.col("doc_id"),
        out="rnk",
    )
    phase = ((F.col("rnk") - 1) * _CURRICULUM_PHASES / total).cast(
        "long"
    ) + 1
    return ranked.select(
        "doc_id", "score", F.col("rnk").cast("long").alias("rnk"),
        phase.alias("phase"),
    )


# --- leakage-safe grouped train/test split ---------------------------------
# Near-duplicate documents cluster within a source, so a ROW-level
# split leaks train content into eval. The grouped split assigns every
# doc of a source to the same side via the shared md5-unit hash OF THE
# SOURCE (not the doc) — deterministic, rerun-stable, and
# leakage-safe by construction. ~75/25 by source count; the report
# also proves no source straddles (n_sides per source == 1 — the
# invariant a reviewer checks).
_GSPLIT_RATE = 0.75
_GSPLIT_H = H.duck_hash_uint(H.sql_salted("source", "'split'"), 8)

_GSPLIT_ORACLE = f"""
WITH tagged AS (
    SELECT doc_id, source,
           CASE WHEN {_GSPLIT_H} / {float(16 ** 8)} < {_GSPLIT_RATE}
                THEN 'train' ELSE 'test' END AS split
    FROM documents
),
per_src AS (
    SELECT source, split, count(*) AS n,
           count(DISTINCT split) OVER (PARTITION BY source) AS n_sides
    FROM tagged GROUP BY source, split
)
SELECT source, split, n::BIGINT AS n_docs, n_sides::BIGINT AS n_sides
FROM per_src
"""


@register("grouped_train_test_split", oracle=_GSPLIT_ORACLE)
def grouped_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    gate = H.hash_unit(F.col("source"), "split", 8)
    tagged = docs.select(
        "doc_id",
        "source",
        F.when(gate < _GSPLIT_RATE, "train").otherwise("test").alias("split"),
    )
    per = tagged.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("source")
    return per.select(
        "source",
        "split",
        "n_docs",
        F.size(F.collect_set("split").over(w)).cast("long").alias("n_sides"),
    )


# --- token-budget corpus fill ---------------------------------------------
# "Fill a B-token training budget in priority order" — the op that
# turns a curated corpus into an actual training mix: docs are taken
# in (source ASC, doc_id ASC) priority order until the cumulative
# token count exceeds the budget; everything after the boundary is
# deferred. Budget = floor(0.6 × total corpus tokens) — RELATIVE to
# the corpus so the boundary lands mid-corpus at every scale factor
# (an absolute budget would keep everything at sf0.001 and the keep
# filter would be vacuous — CLAUDE.md gotcha 5); the 6·total//10 form
# is pure integer math, identical on both engines.
#
# Scale shape: NO global window. Cumulative tokens in priority order
# decompose as offset(source) + within-source running sum — the
# within-source window partitions by source (distributed), and the
# offsets are a |sources|-row driver fold (same bounded-collect
# pattern as pack_sequences_fixed's bucket offsets). Output is one
# row per source.
_BUDGET_ORACLE = r"""
WITH n AS (
    SELECT source, doc_id,
           len(list_filter(string_split_regex(trim(text), '\s+'),
                           x -> len(x) > 0))::BIGINT AS n_tokens
    FROM documents
),
b AS (SELECT (sum(n_tokens) * 6) // 10 AS budget FROM n),
c AS (
    SELECT source, doc_id, n_tokens,
           sum(n_tokens) OVER (ORDER BY source, doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum
    FROM n
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS n_tokens,
       count(*) FILTER (WHERE cum <= budget)::BIGINT AS n_docs_kept,
       coalesce(sum(n_tokens) FILTER (WHERE cum <= budget), 0)::BIGINT
           AS n_tokens_kept,
       (count(*) FILTER (WHERE cum <= budget) = count(*)) AS fully_kept,
       any_value(budget)::BIGINT AS budget
FROM c CROSS JOIN b
GROUP BY source
"""


@register("token_budget_fill", oracle=_BUDGET_ORACLE)
def token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    with_n = docs.select(
        "source",
        "doc_id",
        F.size(ws_tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    # bounded driver fold: one row per source -> priority-order offsets
    # + the relative budget, no global window anywhere
    totals = sorted(
        (r["source"], r["t"])
        for r in with_n.groupBy("source")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    )
    grand = sum(t for _, t in totals)
    budget = (grand * 6) // 10
    offsets, acc = {}, 0
    for src, t in totals:
        offsets[src] = acc
        acc += t
    if not offsets:  # empty corpus: schema-correct empty result
        return spark.sql(
            "SELECT CAST(NULL AS STRING) AS source,"
            " CAST(NULL AS BIGINT) AS n_docs,"
            " CAST(NULL AS BIGINT) AS n_tokens,"
            " CAST(NULL AS BIGINT) AS n_docs_kept,"
            " CAST(NULL AS BIGINT) AS n_tokens_kept,"
            " CAST(NULL AS BOOLEAN) AS fully_kept,"
            " CAST(NULL AS BIGINT) AS budget"
        ).limit(0)
    offset_map = F.create_map(
        *[F.lit(x) for src, _ in totals for x in (src, offsets[src])]
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        F.element_at(offset_map, F.col("source"))
        + F.sum("n_tokens").over(w)
    ).cast("long")
    kept = cum <= F.lit(budget)
    return (
        with_n.select("source", "n_tokens", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.count(F.when(F.col("kept"), 1)).alias("n_docs_kept"),
            F.coalesce(
                F.sum(F.when(F.col("kept"), F.col("n_tokens"))), F.lit(0)
            ).alias("n_tokens_kept"),
            (
                F.count(F.when(F.col("kept"), 1)) == F.count(F.lit(1))
            ).alias("fully_kept"),
            F.lit(budget).cast("long").alias("budget"),
        )
    )


# --- stratified sampling: exact Neyman allocation -------------------------------
# Survey-sampling's optimal budget split (Neyman 1934): allocate a
# fixed sample budget across strata proportional to N_h * S_h (stratum
# size x stratum std-dev) — the variance-minimizing design a curation
# pipeline uses to sample a validation slice from skewed sources.
# Everything is EXACT: per-stratum sums of cents and squared cents go
# through DECIMAL(38,0)/HUGEINT (squared cents overflow int64 at sf1 —
# CLAUDE.md gotcha re permutation test), S_h is one sqrt on
# exact-integer-derived doubles, weights are integer 1e-3 units, the
# base allocation is integer largest-remainder arithmetic in
# DECIMAL(38,0), and the +1 seats go to the largest remainders with a
# stratum-key tie-break via a bounded |strata|² self-join (no window,
# no global sort). Output allocations sum to the budget by
# construction on both engines.
_NEYMAN_BUDGET = 1000

_NEYMAN_ORACLE = f"""
WITH cents_t AS (
    SELECT o_orderpriority AS priority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS v
    FROM orders
),
s AS (
    SELECT priority, count(*)::BIGINT AS n,
           sum(v::HUGEINT) AS sx,
           sum((v * v)::HUGEINT) AS sxx
    FROM cents_t GROUP BY 1
),
w AS (
    SELECT priority, n,
           sqrt((n * sxx - sx * sx)::DOUBLE / (n::DOUBLE * (n - 1)))
               AS s_h
    FROM s
),
wu AS (
    SELECT priority, n, s_h,
           CAST(round(n * s_h * 1000) AS HUGEINT) AS w_u
    FROM w
),
tot AS (SELECT sum(w_u) AS w_tot, count(*)::BIGINT AS n_strata FROM wu),
base AS (
    SELECT wu.priority, wu.n, wu.s_h, wu.w_u, tot.w_tot,
           ({_NEYMAN_BUDGET}::HUGEINT * wu.w_u) // tot.w_tot AS b,
           {_NEYMAN_BUDGET}::HUGEINT * wu.w_u
               - (({_NEYMAN_BUDGET}::HUGEINT * wu.w_u) // tot.w_tot)
                 * tot.w_tot AS rem
    FROM wu, tot
),
leftover AS (
    SELECT ({_NEYMAN_BUDGET} - sum(b))::BIGINT AS l FROM base
),
ranked AS (
    SELECT a.priority, a.n, a.s_h, a.w_u, a.w_tot, a.b,
           count(*) FILTER (
               WHERE x.rem > a.rem
                  OR (x.rem = a.rem AND x.priority < a.priority)
           )::BIGINT AS r
    FROM base a LEFT JOIN base x ON x.priority <> a.priority
    GROUP BY a.priority, a.n, a.s_h, a.w_u, a.w_tot, a.b, a.rem
)
SELECT r.priority, r.n AS n_rows,
       round(r.s_h / 100 * 10000) / 10000 + 0.0 AS stddev,
       round(r.w_u::DOUBLE / r.w_tot::DOUBLE * 10000) / 10000 + 0.0
           AS weight_share,
       r.b::BIGINT AS base_alloc,
       (r.b + CASE WHEN r.r < lo.l THEN 1 ELSE 0 END)::BIGINT
           AS final_alloc
FROM ranked r, leftover lo
"""


@register("stratified_neyman_allocation", oracle=_NEYMAN_ORACLE)
def stratified_neyman_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from swat_mapreduce_spark.functions import rounding as R

    cents = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    s = cents.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(20,0)")).alias("sx"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(26,0)")).alias("sxx"),
    )
    num = (
        F.col("n").cast("decimal(12,0)") * F.col("sxx")
        - F.col("sx") * F.col("sx")
    ).cast("double")
    s_h = F.sqrt(num / (F.col("n").cast("double") * (F.col("n") - 1)))
    wu = s.select(
        "priority",
        "n",
        s_h.alias("s_h"),
        F.round(F.col("n") * s_h * F.lit(1000))
        .cast("decimal(38,0)")
        .alias("w_u"),
    )
    tot = wu.agg(F.sum("w_u").alias("w_tot"))
    budget = F.lit(_NEYMAN_BUDGET).cast("decimal(38,0)")
    base = wu.crossJoin(F.broadcast(tot)).select(
        "priority",
        "n",
        "s_h",
        "w_u",
        "w_tot",
        F.expr(
            f"CAST((CAST({_NEYMAN_BUDGET} AS DECIMAL(38,0)) * w_u)"
            " div w_tot AS DECIMAL(38,0))"
        ).alias("b"),
        (
            budget * F.col("w_u")
            - F.expr(
                f"CAST((CAST({_NEYMAN_BUDGET} AS DECIMAL(38,0)) * w_u)"
                " div w_tot AS DECIMAL(38,0))"
            )
            * F.col("w_tot")
        ).alias("rem"),
    )
    leftover = base.agg(
        (F.lit(_NEYMAN_BUDGET) - F.sum("b")).cast("long").alias("l")
    )
    x = base.select(
        F.col("priority").alias("xp"), F.col("rem").alias("xrem")
    )
    ranked = (
        base.join(x, F.col("xp") != F.col("priority"), "left")
        .groupBy("priority", "n", "s_h", "w_u", "w_tot", "b", "rem")
        .agg(
            F.sum(
                F.when(
                    (F.col("xrem") > F.col("rem"))
                    | (
                        (F.col("xrem") == F.col("rem"))
                        & (F.col("xp") < F.col("priority"))
                    ),
                    1,
                ).otherwise(0)
            ).alias("r")
        )
    )
    return ranked.crossJoin(F.broadcast(leftover)).select(
        "priority",
        F.col("n").cast("long").alias("n_rows"),
        R.r(F.col("s_h") / 100, 4).alias("stddev"),
        R.r(
            F.col("w_u").cast("double") / F.col("w_tot").cast("double"), 4
        ).alias("weight_share"),
        F.col("b").cast("long").alias("base_alloc"),
        (
            F.col("b").cast("long")
            + F.when(F.col("r") < F.col("l"), 1).otherwise(0)
        )
        .cast("long")
        .alias("final_alloc"),
    )


# --- UniMax language-budget allocation -------------------------------------------
# UniMax (Chung et al. 2023) — the PaLM-2-era alternative to
# temperature sampling (temperature_mix_sources): allocate a total
# training budget across languages by WATERFILLING with a per-language
# epoch cap, instead of a power-law rate. Languages are processed in
# ascending cap order; at each step the language takes
# min(cap, b_rem div k_rem) docs (integer fair share of what remains),
# so low-resource languages cap out at max_epochs=1 pass and the
# surplus flows to higher-resource ones — no language is oversampled
# past its cap and none is starved. EXACT integer arithmetic end to
# end (budget = total*8 div 10, integer div shares), so both engines
# walk the identical allocation sequence: the oracle unrolls the walk
# as a recursive CTE over the cap-ordered language list; the Spark
# side folds the same list driver-side (|langs|-bounded metadata,
# the kmeans-pattern driver state). Scale: ONE map-side-combined
# groupBy to |langs| rows; everything after is metadata.
_UNIMAX_EPOCHS = 1  # cap = n_docs * 1 (one full pass max)

_UNIMAX_ORACLE = """
WITH RECURSIVE l AS (
    SELECT lang, count(*)::BIGINT AS n,
           row_number() OVER (ORDER BY count(*), lang) AS i
    FROM documents GROUP BY lang
),
tot AS (SELECT sum(n)::BIGINT AS t, count(*)::BIGINT AS k FROM l),
rec AS (
    SELECT 0::BIGINT AS i, (t * 8) // 10 AS b_rem, k AS k_rem,
           CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS BIGINT) AS n,
           CAST(NULL AS BIGINT) AS alloc
    FROM tot
    UNION ALL
    SELECT l.i,
           r.b_rem - least(l.n, r.b_rem // r.k_rem),
           r.k_rem - 1,
           l.lang, l.n,
           least(l.n, r.b_rem // r.k_rem)
    FROM rec r JOIN l ON l.i = r.i + 1
)
SELECT lang, n AS n_docs, alloc AS alloc_docs,
       (alloc = n) AS capped,
       round(alloc * 1.0 / n * 10000) / 10000 + 0.0 AS epochs
FROM rec WHERE i >= 1
"""


@register("unimax_budget_allocation", oracle=_UNIMAX_ORACLE)
def unimax_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.queries.curation import _rp

    counts = (
        read_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )  # bounded driver state: |langs| rows
    langs = sorted((int(r["n"]), r["lang"]) for r in counts)
    total = sum(n for n, _ in langs)
    b_rem = (total * 8) // 10
    k_rem = len(langs)
    rows = []
    for n, lang in langs:
        cap = n * _UNIMAX_EPOCHS
        alloc = min(cap, b_rem // k_rem)
        b_rem -= alloc
        k_rem -= 1
        rows.append(
            (lang, n, alloc, alloc == n, _rp(alloc / n, 4) + 0.0)
        )
    return spark.createDataFrame(
        rows,
        "lang string, n_docs long, alloc_docs long, capped boolean,"
        " epochs double",
    )


# --- PPS systematic sampling + Hansen-Hurwitz audit ------------------------------
# Probability-proportional-to-size SYSTEMATIC sampling (Madow 1949) —
# the deterministic PPS design a pipeline uses to draw an audit
# sample weighted by document size: K=50 centered sampling points
# t_k = (2k+1)·W/2K over the doc_id-ordered cumulative n_chars axis;
# doc i is hit once per point inside [cum_i, cum_i + w_i). EXACT
# integer hit counting: hits_i = g(2K·cum_end) − g(2K·cum_start)
# with g(X) = ((X−1) div W + 1) div 2 — no floats anywhere in
# selection, and Σ hits = K exactly (every point lands in exactly one
# interval — pinned in tests). The audit estimates total corpus
# TOKENS via Hansen-Hurwitz Σ hits·y_i·W/(K·w_i), each per-doc term
# snapped to an integer 1e-4 unit before the order-free sum. Scale:
# the cumulative axis uses the bucketed distributed prefix sum (the
# pack_sequences pattern) — no global window; everything else is one
# corpus scan + a bounded rollup.
_PPS_K = 50

_PPS_ORACLE = f"""
WITH d AS (
    SELECT doc_id, n_chars AS w,
           len(list_filter(string_split_regex(trim(text), '\\s+'),
                           x -> len(x) > 0))::BIGINT AS y,
           coalesce(sum(n_chars) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               ::BIGINT AS cum
    FROM documents
),
t AS (SELECT sum(w)::BIGINT AS big_w, sum(y)::BIGINT AS toks FROM d),
h AS (
    SELECT d.doc_id, d.w, d.y,
           (((2 * {_PPS_K} * (d.cum + d.w)) - 1) // t.big_w + 1) // 2
           - (((2 * {_PPS_K} * d.cum) - 1) // t.big_w + 1) // 2 AS hits,
           t.big_w, t.toks
    FROM d, t
),
s AS (
    SELECT count(*)::BIGINT AS n_docs,
           sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END)::BIGINT AS n_selected,
           sum(hits)::BIGINT AS n_hits_total,
           any_value(toks)::BIGINT AS total_tokens,
           sum(CAST(round(hits * ((y * big_w)::DOUBLE
               / ({_PPS_K} * w)) * 10000) AS BIGINT))::BIGINT AS est_u
    FROM h
)
SELECT n_docs, {_PPS_K}::BIGINT AS k_points, n_selected, n_hits_total,
       total_tokens,
       round(est_u / 10000.0 * 100) / 100 + 0.0 AS hh_estimate_tokens,
       round(abs(est_u / 10000.0 - total_tokens) / total_tokens * 10000)
           / 10000 + 0.0 AS rel_error
FROM s
"""


@register("pps_systematic_sample", oracle=_PPS_ORACLE)
def pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("w"),
        F.size(ws_tokens(F.col("text"))).cast("long").alias("y"),
    )
    parts = 8
    mn, mx = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    if mn is None:
        mn, mx = 0, 0
    span = mx - mn + 1
    bucket = F.floor(((F.col("doc_id") - mn) * parts) / span).cast("int")
    bucketed = docs.withColumn("_b", bucket)
    totals = {
        r["_b"]: r["t"]
        for r in bucketed.groupBy("_b").agg(F.sum("w").alias("t")).collect()
    }
    offsets, acc = [], 0
    for b in range(parts):
        offsets.append(acc)
        acc += totals.get(b, 0)
    big_w = acc
    offset_map = F.create_map(
        *[F.lit(x) for b in range(parts) for x in (b, offsets[b])]
    )
    wnd = (
        Window.partitionBy("_b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        F.element_at(offset_map, F.col("_b"))
        + F.coalesce(F.sum("w").over(wnd), F.lit(0))
    ).cast("long")

    def g(x):
        return ((x - 1) / F.lit(big_w)).cast("long") + 1

    lo = F.lit(2 * _PPS_K) * cum
    hi = F.lit(2 * _PPS_K) * (cum + F.col("w"))
    # integer floor division via double-div + cast: every operand is
    # a nonnegative exact int < 2^53, so truncation == floor exactly
    h = bucketed.select(
        "doc_id",
        "w",
        "y",
        (
            (((hi - 1) / F.lit(big_w)).cast("long") + 1) / F.lit(2)
        ).cast("long").alias("_gh"),
        (
            (((lo - 1) / F.lit(big_w)).cast("long") + 1) / F.lit(2)
        ).cast("long").alias("_gl"),
    ).select(
        "doc_id",
        "w",
        "y",
        (F.col("_gh") - F.col("_gl")).alias("hits"),
    )
    toks = docs.agg(F.sum("y").alias("toks")).first()["toks"]
    s = h.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("hits") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_selected"),
        F.sum("hits").cast("long").alias("n_hits_total"),
        F.sum(
            F.round(
                F.col("hits")
                * (
                    (F.col("y") * F.lit(big_w)).cast("double")
                    / (F.lit(_PPS_K) * F.col("w"))
                )
                * F.lit(10000)
            ).cast("long")
        ).alias("est_u"),
    )
    return s.select(
        "n_docs",
        F.lit(_PPS_K).cast("long").alias("k_points"),
        "n_selected",
        "n_hits_total",
        F.lit(int(toks)).cast("long").alias("total_tokens"),
        (
            F.round(F.col("est_u") / F.lit(10000.0) * 100) / 100
            + F.lit(0.0)
        ).alias("hh_estimate_tokens"),
        (
            F.round(
                F.abs(F.col("est_u") / F.lit(10000.0) - F.lit(int(toks)))
                / F.lit(int(toks))
                * 10000
            )
            / 10000
            + F.lit(0.0)
        ).alias("rel_error"),
    )
