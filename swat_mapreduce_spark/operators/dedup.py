"""Deduplication operators for LLM training-data pipelines.

Four strategies over the ``documents`` table, all shuffle-conscious:

* exact        — hash-groupBy on full text (one shuffle)
* minhash LSH  — shingle → 16 md5-minhashes → 4 bands → bucket join →
                 Jaccard verify (inverted-index join, never a cross join)
* simhash      — 32-bit fingerprint from per-token md5 nibbles, pure
                 JVM higher-order functions, zero shuffle until groupBy
* n-gram Jaccard — exact pairwise Jaccard via shingle inverted index

Everything is deterministic (md5-based, no RNG) so the DuckDB oracles
in queries/dedup.py reproduce results bit-for-bit. At 100 TB the same
plans hold: candidate generation is an equi-join on (band, bucket) or
(shingle), which Spark shuffles by key — no quadratic stage anywhere;
skewed shingles (very common n-grams) ARE dropped by the MAX_DF
document-frequency cap before the exact-Jaccard self-join, and LSH
mega-buckets by candidate_pairs' max_bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R

from swat_mapreduce_spark.functions.text import shingles_from_tokens, ws_tokens

NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS

# Hot-shingle document-frequency cap for the exact-Jaccard inverted
# index (mirrors candidate_pairs' max_bucket): a shingle present in
# d documents contributes d*(d-1)/2 candidate pairs, so one stop-
# shingle in 1e5 docs would emit ~5e9 pairs from a single join key at
# 100 TB. Shingles with df > MAX_DF are non-discriminative by
# definition and are dropped from the shingle SETS themselves (sizes
# AND intersections), so the emitted value is the exact Jaccard over
# discriminative shingles — a well-defined measure both engines apply
# identically.
MAX_DF = 1000

# MinHash family: ONE md5 per shingle → 32-bit uint h, then
# sig_k = min((A[k]*h + B[k]) mod MERSENNE61). 16 cheap integer
# transforms replace 16 salted md5 passes (the md5 was ~95% of the
# signature stage's CPU). Constants are md5-derived so both engines
# can hardcode the same values; A[k] is odd (bijective mod 2^61-1
# would need gcd=1 — a prime modulus guarantees it for any A!=0).
MERSENNE61 = (1 << 61) - 1


def _mh_constants() -> tuple[list[int], list[int]]:
    import hashlib

    a = [
        int(hashlib.md5(f"a{k}".encode()).hexdigest()[:7], 16) | 1
        for k in range(NUM_HASHES)
    ]
    b = [
        int(hashlib.md5(f"b{k}".encode()).hexdigest()[:7], 16)
        for k in range(NUM_HASHES)
    ]
    return a, b


MH_A, MH_B = _mh_constants()


def doc_shingle_arrays(
    docs: DataFrame,
    n: int = 3,
    extra_cols: tuple[str, ...] = (),
    nonempty: bool = False,
) -> DataFrame:
    """(doc_id, sh_arr) — distinct word n-gram shingles per document as
    an array column. Tokens are materialized in an intermediate
    projection so shingle construction is O(tokens), not O(tokens²)
    (see functions/text.py PERF note). The input is fanned out first:
    shingling + the md5 per shingle that always follows are the CPU
    hot path of the whole dedup family, and a single-split source
    would run them in one task (sources/readers.fan_out).

    ``nonempty=True`` drops docs with no shingles via the CHEAP
    equivalent predicate ``size(toks) >= n`` on the token projection
    (shingle count = max(0, |toks| - n + 1), so >= 1 iff |toks| >= n).
    Callers previously filtered ``size(sh_arr) >= 1`` on the DERIVED
    column, which predicate pushdown re-inlines into the scan with the
    whole shingle pipeline substituted (gotcha 13)."""
    from swat_mapreduce_spark.sources.readers import fan_out

    docs = fan_out(docs)
    toked = docs.select(
        "doc_id", *extra_cols, ws_tokens(F.col("text")).alias("toks")
    )
    if nonempty:
        toked = toked.filter(F.size("toks") >= n)
    return toked.select(
        "doc_id",
        *extra_cols,
        F.array_distinct(shingles_from_tokens(F.col("toks"), n)).alias("sh_arr"),
    )


def shingle_table(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct word n-gram shingles per document.
    explode_nonnull, not explode: the inferred size(sh_arr)>0 filter
    re-inlines the shingle pipeline into the scan (gotcha 13, r13)."""
    from swat_mapreduce_spark.functions.arrays import explode_nonnull

    return explode_nonnull(
        doc_shingle_arrays(docs, n), "sh_arr", "shingle", "doc_id"
    )


def shingle_uint(col):
    """32-bit uint from the first 8 md5 nibbles of a shingle — the ONE
    hash evaluation each shingle pays; all NUM_HASHES minhash values
    derive from it arithmetically."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """16 minhash values per doc: sig_k = min((A[k]*h + B[k]) mod p)
    over h = shingle_uint(shingle). One shuffle (groupBy doc_id); all
    16 mins computed in the same pass (map-side combine keeps shuffle
    rows = one per doc); one md5 per shingle total.
    """
    h = shingle_uint(F.col("shingle"))
    aggs = [
        F.min((F.lit(MH_A[k]) * h + F.lit(MH_B[k])) % F.lit(MERSENNE61)).alias(
            f"h{k}"
        )
        for k in range(NUM_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures_from_arrays(docsh: DataFrame) -> DataFrame:
    """Same signatures as :func:`minhash_signatures`, but computed
    per-row from the shingle ARRAY with ``array_min(transform(...))`` —
    zero shuffle (the explode + groupBy round-trip disappears), stays
    inside whole-stage codegen, and scales embarrassingly parallel:
    each of the N hash functions folds over the row's own shingles.
    """
    # The md5→uint array is materialized in its own projection (it is
    # referenced 16 times, so CollapseProject keeps it — one md5 per
    # shingle); each signature is then a cheap integer fold.
    # NOTE: per-k lambdas MUST come from a factory, never a default-arg
    # capture (``lambda x, k=k: ...``): PySpark derives higher-order-
    # function arity from the Python signature, and a defaulted second
    # parameter silently switches to the (element, index) lambda form,
    # binding k to the index Column (this bug shipped once — see
    # tests/test_properties.py regression).
    def lcg(k: int):
        a, b = F.lit(MH_A[k]), F.lit(MH_B[k])
        return lambda h: (a * h + b) % F.lit(MERSENNE61)

    hashed = docsh.select(
        "doc_id",
        F.transform(F.col("sh_arr"), shingle_uint).alias("hv"),
    )
    sigs = [
        F.array_min(F.transform(F.col("hv"), lcg(k))).alias(f"h{k}")
        for k in range(NUM_HASHES)
    ]
    return hashed.select("doc_id", *sigs)


def lsh_bands(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, bucket): bucket = md5 of the band's concatenated
    signature rows. Docs sharing any (band, bucket) are candidates."""
    # bucket is only ever compared for equality — the concatenated
    # signature rows ARE the bucket key, no hashing needed
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"h{b * ROWS_PER_BAND + r}")
                        for r in range(ROWS_PER_BAND)
                    ],
                ).alias("bucket"),
            )
            for b in range(BANDS)
        ]
    )
    return sigs.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def candidate_pairs(bands: DataFrame, max_bucket: int = 1000) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing any LSH bucket.

    Shape: ONE shuffle (groupBy band+bucket), then in-bucket pair
    generation — no self-join, so the signature pipeline upstream is
    evaluated once, not once per join side. Buckets larger than
    ``max_bucket`` are dropped (standard LSH
    practice: a mega-bucket is a degenerate hash, and its quadratic
    pair list would dominate the stage at 100 TB; near-dups that big
    are caught by exact dedup first).
    """
    # lambda-free pair expansion (posexplode + slice-explode): nested
    # higher-order lambdas where the inner closes over the outer's
    # variables are a correctness hazard in PySpark — generated lambda
    # variable names are session-counter-dependent and can collide
    # after unrelated lambda expressions were built in the same
    # session (observed: this query losing pairs only when run after
    # the array-function queries). Plain generators have no variables
    # to collide.
    ids = F.array_sort(F.collect_list("doc_id"))
    return (
        bands.groupBy("band", "bucket")
        .agg(ids.alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
        .select("ids", F.posexplode("ids").alias("i", "doc_a"))
        .select(
            "doc_a",
            F.explode(
                F.slice("ids", F.col("i") + 2, F.size("ids"))
            ).alias("doc_b"),
        )
        .distinct()
    )


def jaccard_verify_arrays(
    pairs: DataFrame, docsh: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard for candidate pairs via per-doc shingle ARRAYS:
    two equi-joins that ship one array row per pair side, then
    ``array_intersect`` JVM-side — instead of re-shuffling the whole
    exploded shingle table twice. Candidate count ≪ shingle count, so
    this is the cheap side of the join at any scale."""
    a = docsh.select(
        F.col("doc_id").alias("doc_a"), F.col("sh_arr").alias("arr_a")
    )
    b = docsh.select(
        F.col("doc_id").alias("doc_b"), F.col("sh_arr").alias("arr_b")
    )
    inter = F.size(F.array_intersect("arr_a", "arr_b"))
    union = F.size("arr_a") + F.size("arr_b") - inter
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            R.r(inter.cast("double") / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline → (doc_a, doc_b, jaccard).

    Shuffle census: the ONLY shuffles are the (band, bucket) candidate
    equi-join and the two verify joins — signature computation is
    narrow (array fold per row, no explode/groupBy).

    The per-doc shingle-array table is persisted: it feeds signature
    computation plus both verify-join sides, and each consumer would
    otherwise re-run the tokenize+shingle pipeline (same
    index-once materialization as ngram_jaccard_pairs).

    Cache lifetime (deliberate): the returned DataFrame is lazy, so
    there is no in-function point to unpersist — blocks live until
    the process exits or the harness clears them. MEMORY_AND_DISK
    blocks are LRU-evictable under memory pressure; the long-lived
    multi-query harnesses (tools/selfcheck.py, bench.py) call
    ``spark.catalog.clearCache()`` after each query so spilled disk
    blocks cannot accumulate across the 281-query session."""
    from pyspark import StorageLevel

    docsh = doc_shingle_arrays(docs, 3).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pairs = candidate_pairs(lsh_bands(minhash_signatures_from_arrays(docsh)))
    return jaccard_verify_arrays(pairs, docsh, threshold)


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """32-bit SimHash per doc from per-token md5 nibbles.

    bit_j set iff sum over distinct tokens of ±1 (high bit of the j-th
    hex nibble of md5(token)) is positive. Zero-shuffle per-row compute;
    the token md5s are materialized ONCE per row in an intermediate
    projection, then the 32 bit-sums fold over that array.
    """
    hashed = docs.select(
        "doc_id",
        F.transform(
            F.array_distinct(ws_tokens(F.col("text"))), F.md5
        ).alias("hexes"),
    )

    def bit_sum(j: int):
        return F.aggregate(
            F.col("hexes"),
            F.lit(0),
            lambda acc, h: acc
            + F.when(
                F.instr(F.lit("89abcdef"), F.substring(h, j, 1)) > 0, F.lit(1)
            ).otherwise(F.lit(-1)),
        )

    value = None
    for j in range(1, bits + 1):
        term = F.when(
            bit_sum(j) > 0, F.shiftleft(F.lit(1).cast("long"), j - 1)
        ).otherwise(F.lit(0).cast("long"))
        value = term if value is None else value + term
    return hashed.select("doc_id", value.alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.3, n: int = 3,
    max_df: int = MAX_DF,
) -> DataFrame:
    """Exact n-gram Jaccard pairs within the same language partition —
    candidates come from the shingle inverted index (equi-join on
    (lang, shingle)), so work scales with shared-shingle pairs only.

    Shingles whose document frequency exceeds ``max_df`` are dropped
    BEFORE the self-join (see MAX_DF): the per-key pair blowup is
    quadratic in df, and a stop-shingle would otherwise dominate the
    stage at scale. The df filter is a window over (lang, shingle) —
    the exact partitioning the self-join shuffles on — so the cap
    costs no extra read of the shingle table.

    The capped postings table is PERSISTED (memory-and-disk): the plan
    consumes it four times (both self-join sides + both per-doc size
    joins), and without materialization Spark recomputes the
    tokenize→explode→window pipeline — the CPU hot path — per
    consumer. At production scale this materialization IS the design:
    the postings/index table is written once and every downstream pass
    reads it (same index-once economics as search_inverted_index)."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    from swat_mapreduce_spark.functions.arrays import explode_nonnull

    # explode_nonnull (gotcha 13, r13): plain explode's inferred
    # size(sh_arr)>0 filter re-inlines the shingle pipeline into the
    # single-task scan
    sh = explode_nonnull(
        doc_shingle_arrays(docs, n, extra_cols=("lang",)),
        "sh_arr",
        "shingle",
        "doc_id",
        "lang",
    )
    w = Window.partitionBy("lang", "shingle")
    sh = (
        sh.withColumn("df", F.count(F.lit(1)).over(w))
        .filter(F.col("df") <= max_df)
        .drop("df")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    na = sizes.alias("na")
    nb = sizes.alias("nb")
    return (
        inter.join(na, F.col("na.doc_id") == F.col("doc_a"))
        .join(nb, F.col("nb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            R.r(
                F.col("c") / (F.col("na.n") + F.col("nb.n") - F.col("c")), 4
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_prefix_filter_pairs(
    docs: DataFrame, threshold: float = 0.3, n: int = 3
) -> DataFrame:
    """EXACT Jaccard pair join via prefix filtering (AllPairs/PPJoin
    family, Bayardo et al.) — the scalable alternative to
    :func:`ngram_jaccard_pairs`' MAX_DF cap, with NO approximation.

    Each doc's shingles are ordered by the GLOBAL (df, shingle) key —
    rarest first — and only the first ``|s| - ceil(t·|s|) + 1`` tokens
    (the prefix) enter the candidate self-join. Correctness: for any
    pair with Jaccard ≥ t, the globally smallest shared token must lie
    inside BOTH prefixes (if it didn't for side a, every shared token
    would sit among a's last ceil(t·|a|) - 1 tokens, giving overlap
    < t·|a| ≤ t·|a∪b| — pigeonhole), so prefix⋈prefix candidates are a
    superset of true pairs and exact verification restores equality.

    Scale: hot/stop shingles sort LAST under rare-first order, so they
    never enter prefixes of non-tiny docs — the df-cap problem solves
    itself without dropping information. Shuffles: one (lang, shingle)
    df aggregate + join-back, one per-doc window, the prefix equi
    self-join, and doc-keyed verification joins — candidate volume is
    Σ_token df_prefix(token)², driven by RARE tokens only.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    # persist the per-doc shingle ARRAYS (not the exploded postings):
    # the prefix stages explode them once, and verification intersects
    # the arrays directly — same bytes cached, but candidate
    # verification joins the |docs|-row array table instead of
    # re-shuffling the corpus-sized exploded postings twice (r12,
    # guide §2.3 "shuffle keys and metadata instead of payloads")
    arrs = doc_shingle_arrays(docs, n, extra_cols=("lang",)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sh = arrs.select(
        "doc_id", "lang", F.explode("sh_arr").alias("shingle")
    )
    dfreq = sh.groupBy("lang", "shingle").agg(
        F.count(F.lit(1)).alias("df")
    )
    w_pos = Window.partitionBy("doc_id").orderBy("df", "shingle")
    w_n = Window.partitionBy("doc_id")
    ordered = (
        sh.join(dfreq, ["lang", "shingle"])
        .select(
            "doc_id",
            "lang",
            "shingle",
            F.row_number().over(w_pos).alias("pos"),
            F.count(F.lit(1)).over(w_n).alias("n"),
        )
    )
    prefix = ordered.filter(
        F.col("pos")
        <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
    ).select("doc_id", "lang", "shingle")
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # exact verification on the cached arrays: |a ∩ b| via
    # array_intersect (arrays are distinct per doc, so the size equals
    # the old exploded equi-join's per-pair match count exactly) and
    # |a| / |b| via size() — no re-shuffle of the exploded postings
    va = arrs.select(
        F.col("doc_id").alias("va_id"), F.col("sh_arr").alias("arr_a")
    )
    vb = arrs.select(
        F.col("doc_id").alias("vb_id"), F.col("sh_arr").alias("arr_b")
    )
    verified = (
        cand.join(va, F.col("va_id") == F.col("doc_a"))
        .join(vb, F.col("vb_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("arr_a", "arr_b")).alias("c"),
            F.size("arr_a").alias("n_a"),
            F.size("arr_b").alias("n_b"),
        )
    )
    return verified.select(
        "doc_a",
        "doc_b",
        R.r(
            F.col("c") / (F.col("n_a") + F.col("n_b") - F.col("c")), 4
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Benchmark decontamination: flag training documents whose n-gram
    shingles overlap a benchmark/eval set above ``threshold``.

    The standard LLM-corpus hygiene pass: shingle both sides, inner-
    join on the shingle (inverted index — the benchmark side is tiny
    relative to the corpus, so Catalyst broadcasts it), count per-doc
    distinct matching shingles, and emit contamination =
    |matching| / |doc shingles|. At 100 TB the corpus side streams
    through the broadcast join with no shuffle; only the per-doc count
    aggregates (one shuffle on doc_id).

    Returns (doc_id, n_shingles, n_matched, contamination) for docs
    with contamination >= threshold.
    """
    # join on the 32-bit shingle hash, not the string: the broadcast
    # table and the corpus-side join keys shrink to 8 bytes each (the
    # md5 is already paid once per shingle by the minhash family);
    # 32-bit collisions inflate a doc's match count only if a non-
    # matching shingle collides with a benchmark hash — odds ~|bench|
    # /2^32 per shingle, and the oracle applies the identical hashing
    # so the check stays exact.
    from swat_mapreduce_spark.functions.arrays import explode_nonnull

    # both explodes go through explode_nonnull (gotcha 13, r13): the
    # inferred size(sh_arr)>0 filters re-inlined the tokenize+shingle
    # pipeline into each side's single-task scan
    doc_sh = explode_nonnull(
        doc_shingle_arrays(docs, n),
        "sh_arr",
        "shingle",
        "doc_id",
        F.size("sh_arr").alias("n_shingles"),
    ).select(
        "doc_id", shingle_uint(F.col("shingle")).alias("sh"), "n_shingles"
    )
    bench_sh = (
        explode_nonnull(doc_shingle_arrays(benchmark, n), "sh_arr", "shingle")
        .select(shingle_uint(F.col("shingle")).alias("sh"))
        .distinct()
    )
    matched = doc_sh.join(F.broadcast(bench_sh), "sh")
    return (
        matched.groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .withColumn(
            "contamination",
            R.r(F.col("n_matched") / F.col("n_shingles"), 4),
        )
        .filter(F.col("contamination") >= threshold)
        .select("doc_id", "n_shingles", "n_matched", "contamination")
    )


def connected_components(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Distributed connected components over an undirected edge list →
    (node, component) with component = min node id reachable.

    Iterative min-label propagation (the Pregel/GraphX CC algorithm):
    each round every node takes the min of its own label and its
    neighbors' labels; converges in O(component diameter) rounds —
    near-dup clusters are short-diameter by construction, and
    ``max_iter`` bounds the degenerate case. Per round: one shuffle
    for the neighbor-min aggregate, one for the label join.
    ``localCheckpoint`` truncates the per-iteration lineage so the
    plan doesn't grow unboundedly (the standard iterative-algorithm
    pattern; at cluster scale use a checkpoint dir on shared storage).

    This is the canonical LAST step of a near-dup pipeline: pairs from
    LSH only relate docs two at a time; clustering them and keeping
    min-id per cluster is what actually dedups A~B~C chains.
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        msgs = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("lbl").alias("nbr_min"))
        )
        new_labels = (
            labels.join(msgs, labels.node == msgs.u, "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce("nbr_min", F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("lbl").alias("component"))
