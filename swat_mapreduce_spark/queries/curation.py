"""Corpus-curation and scale-pattern queries: salted two-phase
aggregation (hot-key safety), PII redaction, paragraph-level dedup,
and an iterative Lloyd's k-means over the embedding table.

These extend the LLM-training-pipeline surface (SURVEY.md §2B): the
reference pipeline stops at classification, but a production corpus
pipeline needs redaction, sub-document dedup, and clustering for
data-mixture control. Everything here is JVM-expression-only (no
Python UDFs) and every query carries a full DuckDB value oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.functions.text import ws_tokens
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

# --- salted two-phase aggregation ------------------------------------------
# events has a handful of event_type values owning ~all rows — the
# canonical skewed-groupBy shape. A direct groupBy(event_type) puts each
# hot key on ONE reducer; salting first aggregates (key, salt) — 16-way
# parallel per key, with map-side partial aggregation — then merges the
# 16 partials per key in a second (tiny) shuffle. Same result set as the
# plain groupBy, which is exactly what the oracle checks.

_SALTED_ORACLE = """
SELECT event_type, count(*) AS n,
       round(sum(CAST(value AS DECIMAL(30,8))), 2)::DOUBLE AS sum_value,
       round(min(value), 4) AS min_value,
       round(max(value), 4) AS max_value
FROM events
GROUP BY event_type
"""


@register("salted_agg_twophase", oracle=_SALTED_ORACLE)
def salted_agg_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a skewed key.

    Phase 1 groups by (event_type, salt16) — decimal partial sums keep
    the merge exact and order-independent. Phase 2 merges the ≤16
    partials per key. At 100 TB the phase-2 shuffle is |keys|×16 rows
    regardless of input size.
    """
    ev = read_table(spark, sf_dir, "events")
    salt = F.pmod(F.xxhash64("event_id"), F.lit(16)).cast("int")
    partial = (
        ev.withColumn("_salt", salt)
        .groupBy("event_type", "_salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast("decimal(30,8)")).alias("psum"),
            F.min("value").alias("pmin"),
            F.max("value").alias("pmax"),
        )
    )
    p4 = F.lit(10000.0)
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("psum"), 2).cast("double").alias("sum_value"),
        (F.round(F.min("pmin") * p4) / p4 + 0.0).alias("min_value"),
        (F.round(F.max("pmax") * p4) / p4 + 0.0).alias("max_value"),
    )


# --- PII redaction ---------------------------------------------------------
# The synthetic corpus carries no real PII, so the query first plants
# deterministic PII derived from doc_id (an email, a phone, an IPv4) —
# making the redaction non-vacuous at every scale factor (CLAUDE.md
# gotcha 5) — then strips it with the production regexes. Patterns are
# kept to the regex subset Java and RE2 agree on.

_PII_ORACLE = r"""
WITH dirty AS (
    SELECT doc_id,
           text || ' contact user' || doc_id || '@example.com or +1-555-'
                || lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' from 10.'
                || (doc_id % 256) || '.0.1' AS t
    FROM documents
),
red AS (
    SELECT doc_id,
           len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(t, '\+1-[0-9]{3}-[0-9]{4}')) AS n_phones,
           len(regexp_extract_all(t, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS n_ips,
           regexp_replace(
             regexp_replace(
               regexp_replace(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
             '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS clean
    FROM dirty
)
SELECT doc_id, n_emails, n_phones, n_ips, md5(clean) AS clean_fp,
       contains(clean, '<EMAIL>') AND contains(clean, '<PHONE>')
           AND contains(clean, '<IP>') AS fully_tagged
FROM red
"""

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-[0-9]{3}-[0-9]{4}"
_IP_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


@register("pii_redaction", oracle=_PII_ORACLE)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrub (emails → phones → IPs, in that order so the
    phone pattern's digits aren't half-eaten by the IP pass). Pure
    narrow map — codegen'd JVM regex, no shuffle, scales linearly."""
    docs = read_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
        F.lit(" from 10."),
        F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
        F.lit(".0.1"),
    )
    t = docs.select("doc_id", dirty.alias("t"))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IP_RE,
        "<IP>",
    )
    return t.select(
        "doc_id",
        F.regexp_count("t", F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count("t", F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count("t", F.lit(_IP_RE)).cast("long").alias("n_ips"),
        F.md5(clean).alias("clean_fp"),
        (
            clean.contains("<EMAIL>")
            & clean.contains("<PHONE>")
            & clean.contains("<IP>")
        ).alias("fully_tagged"),
    )


# --- paragraph-level dedup -------------------------------------------------
# Sub-document dedup: split every document into fixed 8-token chunks
# ("paragraphs" for this single-line synthetic corpus), keep only the
# globally-first occurrence of each chunk (order: doc_id, chunk index),
# and report per-document survival counts. The shuffle key is md5(chunk)
# — 32 bytes regardless of chunk size — never the chunk text itself.

_PARA_ORACLE = r"""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\s+'),
                       x -> length(x) > 0) AS toks
    FROM documents
),
c AS (
    SELECT doc_id, j,
           md5(array_to_string(toks[(j*8+1):(j*8+8)], ' ')) AS h
    FROM t, unnest(range(0, cast(ceil(len(toks) / 8.0) AS BIGINT))) AS u(j)
    WHERE len(toks) > 0
),
r AS (
    SELECT doc_id, j, h,
           row_number() OVER (PARTITION BY h ORDER BY doc_id, j) AS rn
    FROM c
)
SELECT doc_id, count(*) AS n_chunks,
       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dropped
FROM r
GROUP BY doc_id
"""


@register("paragraph_dedup", oracle=_PARA_ORACLE)
def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    t = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") > 0)
    n_chunks = F.ceil(F.size("toks") / 8.0).cast("long")
    c = t.select(
        "doc_id",
        "toks",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("_p", "j"),
    ).select(
        "doc_id",
        "j",
        F.md5(
            F.array_join(
                F.slice(F.col("toks"), F.col("j") * 8 + 1, F.lit(8)), " "
            )
        ).alias("h"),
    )
    w = Window.partitionBy("h").orderBy("doc_id", "j")
    r = c.withColumn("rn", F.row_number().over(w))
    return r.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_dropped"),
    )


# --- Lloyd's k-means (2 iterations, k=8) -----------------------------------
# The iterative-ML workload shape: per-iteration the model state (8×64
# centroids) is collected to the driver and re-broadcast as literals —
# the same coordination pattern Spark MLlib's KMeans uses. All
# floating-point steps are engine-portable by construction:
#   * distances: left-fold sum of (x−c)² in DOUBLE — identical operation
#     order in Spark's aggregate() and DuckDB's list_sum, so bit-equal;
#   * centroid updates: per-dimension DECIMAL(38,10) sums (exact,
#     order-independent) cast to DOUBLE, divided by the member count —
#     no accumulation-order dependence anywhere.
# Ties in the argmin break to the lowest centroid id in both engines.

_KMEANS_DIM = 64
_KMEANS_K = 8


def _dist_sq(emb: Column, cvec: list[float]) -> Column:
    arr = F.array(*[F.lit(float(v)) for v in cvec])
    diffs = F.zip_with(emb, arr, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d)


def _assign(emb_df: DataFrame, cents: list[list[float]]) -> DataFrame:
    """Nearest-centroid id (first minimum wins) for each vector."""
    dists = F.array(*[_dist_sq(F.col("embedding"), c) for c in cents])
    cid = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return emb_df.select("vec_id", "embedding", cid.alias("cid"))


def _update(assigned: DataFrame) -> list[list[float]]:
    """Exact per-dimension means; returns k×dim Python floats."""
    sums = [
        F.sum(F.col("embedding")[i].cast("decimal(38,10)"))
        .cast("double")
        .alias(f"s{i}")
        for i in range(_KMEANS_DIM)
    ]
    rows = (
        assigned.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"), *sums)
        .collect()
    )
    by_cid = {r["cid"]: r for r in rows}
    out = []
    for k in range(_KMEANS_K):
        r = by_cid[k]
        out.append([r[f"s{i}"] / r["n"] for i in range(_KMEANS_DIM)])
    return out


_KMEANS_ORACLE = """
WITH c0 AS (
    SELECT vec_id AS cid, embedding AS cvec FROM embeddings
    WHERE vec_id < 8
),
a1 AS (
    SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_sum(list_transform(range(1, 65),
                       j -> (e.embedding[j]::DOUBLE - c.cvec[j])
                          * (e.embedding[j]::DOUBLE - c.cvec[j]))),
                       c.cid) AS rn
        FROM embeddings e, c0 c)
    WHERE rn = 1
),
m1 AS (
    SELECT cid, j,
           (sum(e.embedding[j]::DECIMAL(38,10))::DOUBLE) / count(*) AS m
    FROM a1 JOIN embeddings e USING (vec_id),
         unnest(range(1, 65)) AS u(j)
    GROUP BY cid, j
),
c1 AS (SELECT cid, list(m ORDER BY j) AS cvec FROM m1 GROUP BY cid),
a2 AS (
    SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_sum(list_transform(range(1, 65),
                       j -> (e.embedding[j]::DOUBLE - c.cvec[j])
                          * (e.embedding[j]::DOUBLE - c.cvec[j]))),
                       c.cid) AS rn
        FROM embeddings e, c1 c)
    WHERE rn = 1
)
SELECT a2.cid, count(*) AS n_members,
       min(vec_id) AS min_vec, max(vec_id) AS max_vec,
       round(any_value(c1.cvec[1]) * 1000000) / 1000000 + 0.0 AS c_dim0
FROM a2 JOIN c1 ON a2.cid = c1.cid
GROUP BY a2.cid
"""


@register("kmeans_lloyd_2iter", oracle=_KMEANS_ORACLE)
def kmeans_lloyd_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations, k=8, deterministic init (vec_id < 8).

    Per iteration: one narrow assignment pass (centroids are literals —
    effectively a broadcast of the model) + one shuffle for the k×dim
    decimal sums. The driver-side state is 8×64 doubles per iteration —
    constant in the input size, so the loop works unchanged at 100 TB.
    """
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    init_rows = (
        emb.filter(F.col("vec_id") < _KMEANS_K)
        .orderBy("vec_id")
        .collect()
    )
    cents = [[float(v) for v in r["embedding"]] for r in init_rows]
    if not cents:  # empty table: no centroids, schema-correct 0 rows
        return spark.sql(
            "SELECT CAST(NULL AS INT) AS cid,"
            " CAST(NULL AS BIGINT) AS n_members,"
            " CAST(NULL AS BIGINT) AS min_vec,"
            " CAST(NULL AS BIGINT) AS max_vec,"
            " CAST(NULL AS DOUBLE) AS c0"
        ).limit(0)
    assigned = _assign(emb, cents)
    cents = _update(assigned)
    assigned = _assign(emb, cents)
    cent_df = spark.createDataFrame(
        [(k, cents[k][0]) for k in range(_KMEANS_K)], "cid int, c0 double"
    )
    p6 = F.lit(1000000.0)
    return (
        assigned.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("vec_id").alias("min_vec"),
            F.max("vec_id").alias("max_vec"),
        )
        # LEFT join (r13): semantically identical (assigned cid is
        # always one of cent_df's 0..k-1 rows), but an INNER join made
        # the optimizer infer isnotnull(cid) and push it into the scan
        # with the whole 8-centroid x 64-dim assignment expression
        # substituted — doubling the dominant codegen/compile cost of
        # this giant literal expression tree
        .join(F.broadcast(cent_df), "cid", "left")
        .select(
            "cid",
            "n_members",
            "min_vec",
            "max_vec",
            (F.round(F.col("c0") * p6) / p6 + 0.0).alias("c_dim0"),
        )
    )


# --- deterministic column pseudonymization ---------------------------------
# Governance twin of pii_redaction: REVERSIBLE-BY-LOOKUP masking is a
# non-goal; what a training/analytics export needs is DETERMINISTIC
# pseudonyms — the same input maps to the same token everywhere, so
# joins and group-bys still work on the masked export. Tokens are
# sha2-derived with a fixed salt; numeric quasi-identifiers are
# GENERALIZED (k-anonymity-style 1000-unit account-balance bands)
# rather than hashed, keeping them aggregable. Entirely narrow
# (zero shuffles before the verification aggregate).
_PSEUDO_ORACLE = """
WITH masked AS (
    SELECT c_name, c_mktsegment,
           'cust_' || substr(sha256('swat-v1|' || c_name), 1, 16)
               AS name_token,
           floor(c_acctbal / 1000) * 1000 AS acct_band
    FROM customer
)
SELECT c_mktsegment,
       count(*)::BIGINT AS n_rows,
       count(DISTINCT name_token)::BIGINT AS n_distinct_tokens,
       (count(DISTINCT name_token) = count(DISTINCT c_name))
           AS tokens_consistent,
       count(DISTINCT acct_band)::BIGINT AS n_acct_bands
FROM masked
GROUP BY c_mktsegment
"""


@register("mask_pseudonymize", oracle=_PSEUDO_ORACLE)
def mask_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    name_token = F.concat(
        F.lit("cust_"),
        F.substring(
            F.sha2(F.concat(F.lit("swat-v1|"), F.col("c_name")), 256),
            1,
            16,
        ),
    )
    acct_band = F.floor(F.col("c_acctbal") / 1000) * 1000
    masked = cust.select(
        "c_name",
        "c_mktsegment",
        name_token.alias("name_token"),
        acct_band.alias("acct_band"),
    )
    return masked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("name_token").alias("n_distinct_tokens"),
        # determinism + injectivity on this corpus: one token per name
        (
            F.countDistinct("name_token") == F.countDistinct("c_name")
        ).alias("tokens_consistent"),
        F.countDistinct("acct_band").alias("n_acct_bands"),
    )


# --- WOE / IV feature audit ------------------------------------------------
# Quality-classifier feature engineering: bin a candidate feature
# (document length deciles) against the binary keep label the Gopher
# repetition rule produces, and report per-bin Weight of Evidence
# plus the feature's total Information Value — the standard screen
# for "is this feature worth giving the classifier?" (IV < 0.02 =
# useless, > 0.3 = strong). Laplace-smoothed (+0.5/cell) so empty
# cells stay finite. Plan: one doc-keyed token aggregate for the
# label, one ntile decile window over... NO — deciles come from
# row-local integer arithmetic against broadcast corpus min/max
# (ntile would be a global window; the arithmetic decile matches the
# oracle exactly and shuffles nothing). Output: 10 bins + the total
# IV repeated per row (bounded report).
#
# WOE_b = ln( (pos_b / pos_tot) / (neg_b / neg_tot) ) with +0.5
# smoothing; IV = Σ_b (pos_share - neg_share) * WOE_b. Every
# division/log runs on doubles derived from identical exact integer
# counts, so both engines compute bit-identical doubles.
_WOE_ORACLE = r"""
WITH tok AS (
    SELECT doc_id, n_chars,
           string_split_regex(trim(text), '\s+') AS t
    FROM documents
),
tc AS (
    SELECT doc_id, n_chars, unnest(t) AS tokn FROM tok
),
lab AS (
    SELECT doc_id, any_value(n_chars) AS n_chars,
           (max(cnt)::DOUBLE / sum(cnt) <= 0.12
            AND sum(cnt * length(tokn))::DOUBLE / sum(cnt)
                BETWEEN 4.0 AND 5.0) AS keep
    FROM (SELECT doc_id, n_chars, tokn, count(*) AS cnt
          FROM tc GROUP BY doc_id, n_chars, tokn)
    GROUP BY doc_id
),
mm AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM lab),
binned AS (
    SELECT least(((n_chars - mn) * 10) // (mx - mn + 1), 9)::INT AS bin,
           keep
    FROM lab CROSS JOIN mm
),
cells AS (
    SELECT bin,
           count(*) FILTER (WHERE keep)::BIGINT AS n_pos,
           count(*) FILTER (WHERE NOT keep)::BIGINT AS n_neg
    FROM binned GROUP BY bin
),
tot AS (SELECT sum(n_pos) AS tp, sum(n_neg) AS tn FROM cells),
woe AS (
    SELECT bin, n_pos, n_neg,
           ((n_pos + 0.5) / (tp + 0.5)) AS ps,
           ((n_neg + 0.5) / (tn + 0.5)) AS ns
    FROM cells CROSS JOIN tot
)
SELECT bin, n_pos, n_neg,
       round(ln(ps / ns), 4) AS woe,
       round((SELECT sum(CAST((ps - ns) * ln(ps / ns)
                               AS DECIMAL(30,12)))::DOUBLE
              FROM woe), 4) AS total_iv
FROM woe
"""


@register("woe_iv_length_feature", oracle=_WOE_ORACLE)
def woe_iv_length_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.functions.text import ws_tokens

    docs = read_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", "n_chars", ws_tokens(F.col("text")).alias("toks")
    )
    tc = toked.select(
        "doc_id", "n_chars", F.explode("toks").alias("tokn")
    ).groupBy("doc_id", "n_chars", "tokn").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    from pyspark import StorageLevel

    # lab feeds mm + binned, cells feeds tot + woe (and woe feeds the
    # iv agg + the final projection) — persist both shared subtrees so
    # the tokenize+label pipeline runs ONCE (16 shuffles / 8 scans in
    # the unpersisted census)
    lab = tc.groupBy("doc_id").agg(
        F.any_value("n_chars").alias("n_chars"),
        (
            (F.max("cnt").cast("double") / F.sum("cnt") <= 0.12)
            & (
                F.sum(F.col("cnt") * F.length("tokn")).cast("double")
                / F.sum("cnt")
            ).between(4.0, 5.0)
        ).alias("keep"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    mm = lab.agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
    binned = lab.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.floor(
                ((F.col("n_chars") - F.col("mn")) * 10)
                / (F.col("mx") - F.col("mn") + 1)
            ),
            F.lit(9),
        )
        .cast("int")
        .alias("bin"),
        "keep",
    )
    cells = binned.groupBy("bin").agg(
        F.count(F.when(F.col("keep"), 1)).alias("n_pos"),
        F.count(F.when(~F.col("keep"), 1)).alias("n_neg"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    tot = cells.agg(
        F.sum("n_pos").alias("tp"), F.sum("n_neg").alias("tn")
    )
    woe = cells.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_pos",
        "n_neg",
        ((F.col("n_pos") + 0.5) / (F.col("tp") + 0.5)).alias("ps"),
        ((F.col("n_neg") + 0.5) / (F.col("tn") + 0.5)).alias("ns"),
    )
    # per-term DECIMAL(30,12) quantization before the sum: a 10-term
    # double sum is accumulation-order-dependent across engines
    # (gotcha 2 class); identical double terms -> identical decimals
    # -> order-independent exact sum on both sides
    iv = woe.agg(
        F.sum(
            (
                (F.col("ps") - F.col("ns"))
                * F.log(F.col("ps") / F.col("ns"))
            ).cast("decimal(30,12)")
        )
        .cast("double")
        .alias("iv")
    )
    return woe.crossJoin(F.broadcast(iv)).select(
        "bin",
        "n_pos",
        "n_neg",
        R.r(F.log(F.col("ps") / F.col("ns")), 4).alias("woe"),
        R.r("iv", 4).alias("total_iv"),
    )


# --- PCA top component via power iteration -----------------------------------
# The missing linear-algebra primitive next to kmeans: the corpus's
# top principal direction by 2 power-iteration steps on the centered
# Gram operator, v ← normalize(X̃ᵀ(X̃v)), from the deterministic
# all-0.125 start (exactly 1/8 in binary — no seed luck). Per
# iteration: one (vector · v) aggregate and one per-dim aggregate —
# driver state is the 64-double v (the kmeans/BPE bounded-iteration
# pattern).
#
# Cross-engine determinism (r6 driver red → r7 redesign): the r6
# version quantized via double→DECIMAL casts in-engine and Python
# round()/Decimal(repr()) driver-side — three different tie
# procedures whose agreement is DuckDB-version-dependent (gotcha 3's
# class; the driver's DuckDB diverged where local 1.0.0 agreed). Now
# EVERY quantization on every engine is the one procedure all three
# implement identically on the exact binary double: multiply by 10^k,
# round-to-integer half-away-from-zero (Spark F.round(d) = BigDecimal
# exact + HALF_UP; DuckDB round(d) = std::round; Python
# Decimal(float).to_integral_value(ROUND_HALF_UP) — all tie-identical
# on the same bits), divide back. Quantized terms are summed as
# DECIMAL(38,0) integers (exact, order-free, no int64 overflow at
# 100 TB row counts), and all remaining ops (−, ×, ÷, sqrt) are
# correctly-rounded IEEE ops on bit-identical inputs. The oracle
# replays BOTH iterations in SQL with the same scheme.
_PCA_DIM = 64

_PCA_ORACLE = f"""
WITH dims AS (
    SELECT vec_id, g.i, embedding[g.i]::DOUBLE AS x
    FROM embeddings, generate_series(1, {_PCA_DIM}) AS g(i)
),
mu AS (
    SELECT i,
           (sum(CAST(round(x * 10000000000) AS DECIMAL(38,0)))::DOUBLE
            / 10000000000) / count(*) AS m
    FROM dims GROUP BY i
),
s1 AS (
    SELECT d.vec_id,
           sum(CAST(round(((d.x - mu.m) * 0.125) * 100000000)
                    AS DECIMAL(38,0)))::DOUBLE / 100000000 AS s
    FROM dims d JOIN mu USING (i) GROUP BY d.vec_id
),
y1 AS (
    SELECT d.i,
           sum(CAST(round((s1.s * (d.x - mu.m)) * 100000000)
                    AS DECIMAL(38,0)))::DOUBLE / 100000000 AS y
    FROM dims d JOIN mu USING (i) JOIN s1 USING (vec_id)
    GROUP BY d.i
),
n1 AS (
    SELECT sqrt(sum(CAST(round((y * y) * 100000000)
                         AS DECIMAL(38,0)))::DOUBLE / 100000000) AS nrm
    FROM y1
),
v1 AS (
    SELECT i, round(y / n1.nrm * 10000000000) / 10000000000 AS v
    FROM y1, n1
),
s2 AS (
    SELECT d.vec_id,
           sum(CAST(round(((d.x - mu.m) * v1.v) * 100000000)
                    AS DECIMAL(38,0)))::DOUBLE / 100000000 AS s
    FROM dims d JOIN mu USING (i) JOIN v1 USING (i) GROUP BY d.vec_id
),
y2 AS (
    SELECT d.i,
           sum(CAST(round((s2.s * (d.x - mu.m)) * 100000000)
                    AS DECIMAL(38,0)))::DOUBLE / 100000000 AS y
    FROM dims d JOIN mu USING (i) JOIN s2 USING (vec_id)
    GROUP BY d.i
),
n2 AS (
    SELECT sqrt(sum(CAST(round((y * y) * 100000000)
                         AS DECIMAL(38,0)))::DOUBLE / 100000000) AS nrm
    FROM y2
),
nn AS (SELECT count(*)::BIGINT AS n FROM embeddings)
SELECT y2.i AS dim,
       round(y2.y / n2.nrm * 1000000) / 1000000 + 0.0 AS loading,
       round(n2.nrm / nn.n * 10000) / 10000 + 0.0 AS explained_var
FROM y2, n2, nn
"""


def _ri(x: float, digits: int) -> int:
    """Exact integer units of ``round(x * 10^d)``: scale in IEEE
    double, round the EXACT binary product to integer
    half-away-from-zero (``Decimal(float)`` is the exact value — NOT
    ``repr`` — so ties resolve identically to Spark's
    BigDecimal-HALF_UP and C++ ``std::round``)."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(x * float(10**digits)).to_integral_value(
        rounding=ROUND_HALF_UP
    ))


def _rp(x: float, digits: int) -> float:
    """Driver-side mirror of :func:`functions.rounding.r` / DuckDB
    ``round(x * 10^d) / 10^d`` — see :func:`_ri`. Never use Python
    ``round()`` (half-even) for oracle-facing values."""
    import math

    p = float(10**digits)
    if not math.isfinite(x * p):
        return x
    return _ri(x, digits) / p


@register("pca_power_iteration", oracle=_PCA_ORACLE)
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from swat_mapreduce_spark.functions import arrays as A

    def q8(term):
        # quantize a double term to 8dp as an exact integer unit:
        # round((term) * 1e8) — the shared cross-engine procedure
        return F.round(term * F.lit(1e8))

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", A.as_double_array(F.col("embedding")).alias("v")
    )
    emb = emb.persist()
    n_vec = emb.count()
    mu_row = emb.agg(
        *[
            (
                F.sum(
                    F.round(F.element_at("v", i + 1) * F.lit(1e10)).cast(
                        "decimal(38,0)"
                    )
                ).cast("double")
                / F.lit(1e10)
                / F.count(F.lit(1))
            ).alias(f"m{i}")
            for i in range(_PCA_DIM)
        ]
    ).collect()[0]
    mu = [mu_row[f"m{i}"] for i in range(_PCA_DIM)]
    mu_arr = F.array(*[F.lit(float(m)) for m in mu])
    centered = F.zip_with(F.col("v"), mu_arr, lambda x, m: x - m)

    v = [0.125] * _PCA_DIM
    nrm = 1.0
    y = [0.0] * _PCA_DIM
    for _ in range(2):
        v_arr = F.array(*[F.lit(float(x)) for x in v])
        # per-vector dot: 64 quantized integer units summed as long
        # (bounded by dim count — no overflow at any corpus size)
        dot_units = F.aggregate(
            F.zip_with(centered, v_arr, lambda c, w: q8(c * w).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )
        s = (dot_units.cast("double") / F.lit(1e8)).alias("s")
        sdf = emb.select(s, centered.alias("c"))
        # per-dim aggregate: quantized units summed as DECIMAL(38,0)
        # (exact, order-free, overflow-safe at 100 TB row counts)
        ys = (
            sdf.select(F.posexplode("c").alias("j", "xc"), "s")
            .groupBy("j")
            .agg(
                F.sum(
                    q8(F.col("s") * F.col("xc")).cast("decimal(38,0)")
                ).alias("yu")
            )
            .collect()
        )
        y = [0.0] * _PCA_DIM
        for r in ys:
            y[r["j"]] = int(r["yu"]) / 1e8
        nrm = math.sqrt(sum(_ri(t * t, 8) for t in y) / 1e8)
        v = [_rp(t / nrm, 10) for t in y]
    emb.unpersist()
    rows = [
        (j + 1, _rp(y[j] / nrm, 6) + 0.0, _rp(nrm / n_vec, 4) + 0.0)
        for j in range(_PCA_DIM)
    ]
    return spark.createDataFrame(
        rows, "dim long, loading double, explained_var double"
    )
