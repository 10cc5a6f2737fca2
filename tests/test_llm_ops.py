"""Dedup / similarity / text-analysis operator semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from swat_mapreduce_spark.operators import dedup as D
from swat_mapreduce_spark.operators import similarity as S
from swat_mapreduce_spark.sources.readers import read_table


def test_minhash_pairs_valid(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5).collect()
    for r in pairs:
        assert r.doc_a < r.doc_b
        assert 0.5 <= r.jaccard <= 1.0


def test_minhash_finds_near_duplicates(spark, sf_dir):
    """The testdata contains near-duplicate documents (FIXTURES.md §A);
    LSH with 4x4 bands at j>=0.5 must surface some."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5).count()
    assert pairs > 0


def test_simhash_deterministic_and_close_for_neardups(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    a = {r.doc_id: r.simhash for r in D.simhash(docs).collect()}
    b = {r.doc_id: r.simhash for r in D.simhash(docs).collect()}
    assert a == b
    assert all(0 <= v < 2**32 for v in a.values())
    # near-dup pair (from minhash) should have small hamming distance
    pair = D.minhash_lsh_pairs(docs, threshold=0.6).first()
    if pair is not None:
        ham = bin(a[pair.doc_a] ^ a[pair.doc_b]).count("1")
        assert ham <= 10, f"near-dups should have close simhashes, got {ham}"


def test_exact_dedup_keeps_min_id(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    kept = docs.groupBy("text").agg(F.min("doc_id").alias("keeper_id"))
    n_docs = docs.count()
    n_kept = kept.count()
    assert n_kept <= n_docs
    # dedup is idempotent
    assert kept.select("keeper_id").distinct().count() == n_kept


def test_ann_topk_ordering(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    top = S.cosine_topk(emb, qvec, k=10, exclude_id=0).collect()
    assert len(top) == 10
    assert 0 not in [r.vec_id for r in top]
    cosines = [r.cosine for r in top]
    assert cosines == sorted(cosines, reverse=True)
    assert all(-1.0001 <= c <= 1.0001 for c in cosines)


def test_lsh_buckets_deterministic(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    b1 = {r.vec_id: r.bucket for r in S.lsh_buckets(emb).collect()}
    b2 = {r.vec_id: r.bucket for r in S.lsh_buckets(emb).collect()}
    assert b1 == b2
    assert all(0 <= v < 2**S.LSH_PLANES for v in b1.values())


def test_lsh_bucket_recall_vs_bruteforce(spark, sf_dir):
    """Sanity: vectors in the query's LSH bucket should skew similar —
    the bucketed search must at least find the query's own bucket."""
    emb = read_table(spark, sf_dir, "embeddings")
    buckets = {r.vec_id: r.bucket for r in S.lsh_buckets(emb).collect()}
    assert buckets[0] in set(buckets.values())


def test_text_quality_bounds(spark, sf_dir):
    from swat_mapreduce_spark.queries.llm_text import text_quality

    rows = text_quality(spark, sf_dir).collect()
    for r in rows:
        assert 0.0 <= r.quality <= 1.0
        assert 0.0 <= r.uniq_ratio <= 1.0
        assert r.n_tokens > 0


def test_fingerprint_shape(spark, sf_dir):
    from swat_mapreduce_spark.queries.llm_text import doc_fingerprint

    rows = doc_fingerprint(spark, sf_dir).collect()
    for r in rows[:20]:
        assert len(r.fingerprint) == 32
        int(r.fingerprint, 16)
        assert r.fp64 >= 0


def test_connected_components_shapes(spark):
    """Chain, star, and disjoint pairs must collapse to min-id
    components; CC is the near-dup clustering primitive, so its graph
    semantics get direct coverage beyond the oracle query."""
    from swat_mapreduce_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        # chain 1-2-3-4, star 10-{11,12,13}, pair 20-21
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {
        (r.node, r.component)
        for r in connected_components(edges).collect()
    }
    want = {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10), (13, 10),
        (20, 20), (21, 20),
    }
    assert got == want


def test_connected_components_long_chain_converges(spark):
    """A 12-node chain needs ~log rounds of min-label propagation;
    max_iter default must cover it and the labels must all reach the
    chain head."""
    from swat_mapreduce_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 111)], "doc_a long, doc_b long"
    )
    got = connected_components(edges).collect()
    assert all(r.component == 100 for r in got)
    assert len(got) == 12


def test_quantize_int8_zero_vector_and_clamp(spark):
    """The mx=0 branch (all-zero vector) must yield zero error and
    zero dot — not NaN from 0/0 — and extremes land exactly on ±127."""
    from pyspark.sql import functions as F

    from swat_mapreduce_spark.queries import load_all

    df = spark.createDataFrame(
        [(0, [0.0] * 64), (1, [1.0] + [-1.0] * 63)],
        "vec_id long, embedding array<float>",
    )
    import swat_mapreduce_spark.queries.similarity as S_mod

    orig = S_mod.read_table
    try:
        S_mod.read_table = lambda spark, sf_dir, name: df
        out = {
            r.vec_id: r
            for r in load_all()["embedding_quantize_int8"]
            .spark_fn(spark, "unused")
            .collect()
        }
    finally:
        S_mod.read_table = orig
    assert out[0].max_abs_err == 0.0 and out[0].q_self_dot == 0
    assert out[1].q_self_dot == 64 * 127 * 127  # every dim exactly ±127
    assert out[1].max_abs_err == 0.0


def test_lsh_planes_formula_matches_duck():
    """lsh_planes_for (Python) and duck_lsh_planes (oracle SQL) must
    agree at every corpus size — they parameterize the same bucket
    assignment on both sides of the correctness gate."""
    import duckdb

    for n in [1, 31, 32, 33, 64, 500, 2000, 2048, 10**6, 10**9, 10**12]:
        cte = S.duck_lsh_planes(tbl=f"(SELECT * FROM range({n}))")
        p = duckdb.sql(f"WITH {cte} SELECT p FROM np").fetchone()[0]
        assert p == S.lsh_planes_for(n), n


def test_lsh_cap_drops_planted_mega_bucket(spark):
    """A planted degenerate bucket (300 identical vectors) must be
    dropped by lsh_tagged_capped's max_bucket cap, bounding downstream
    pair candidates at n_buckets * cap^2 instead of |bucket|^2."""
    import random

    base = [0.5] * 64
    rnd = random.Random(7)
    rows = [(i, 0, base) for i in range(300)]
    rows += [
        (1000 + i, 1, [rnd.uniform(-1.0, 1.0) for _ in range(64)])
        for i in range(20)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    capped = S.lsh_tagged_capped(emb, planes=8, max_bucket=100)
    try:
        got = capped.collect()
    finally:
        capped.unpersist()
    ids = {r.vec_id for r in got}
    assert not any(i < 300 for i in ids), "mega bucket must be dropped"
    assert len(got) <= 20


def test_phrase_search_survives_short_docs(spark, tmp_path):
    """Docs with 0 or 1 tokens must yield zero hits, not crash:
    Spark's sequence(1, size-1) with size<2 descends through index 0
    and element_at(t, 0) throws INVALID_INDEX_OF_ZERO unless guarded
    (ADVICE r4, medium). DuckDB's generate_series(1, 0) is empty, so
    the guard also keeps the engines semantically aligned."""
    from swat_mapreduce_spark.queries.llm_text4 import phrase_search_positions

    rows = [
        (1, "word", "en", "s", 4),          # one token
        (2, "", "en", "s", 0),              # empty text
        (3, "   ", "en", "s", 3),           # whitespace only
        (4, "window join now", "en", "s", 15),  # one real hit
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(d)
    import os, glob, shutil
    f = glob.glob(os.path.join(d, "part-*.parquet"))[0]
    shutil.move(f, os.path.join(str(tmp_path), "documents.parquet"))
    got = phrase_search_positions(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0].doc_id == 4 and got[0].n_occurrences == 1 and got[0].first_pos == 1


def test_spatial_blocking_premise_holds_on_data(spark, sf_dir):
    """The spatial grid's 'blocking is EXACT' claim rests on
    |embedding[1]|·100 ≤ _LAT_EXACT_BOUND (spatial._assert_blocking_exact).
    Enforce the premise against the actual testdata rather than assume it."""
    from swat_mapreduce_spark.queries import spatial as SP
    from swat_mapreduce_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    (row,) = (
        emb.select(
            (F.abs(F.element_at("embedding", 1)) * SP._LAT_SCALE).alias("lat")
        )
        .agg(F.max("lat").alias("max_lat"))
        .collect()
    )
    assert row.max_lat <= SP._LAT_EXACT_BOUND, f"lat bound premise violated: {row.max_lat}"


def test_bpe_train_merge_invariants(spark, sf_dir):
    """Each adopted merge removes exactly one symbol per occurrence, so
    symbols_after must decrease by pair_count step over step, and merge
    counts must be non-increasing (a later merge can never beat an
    earlier one — it was available then)."""
    from swat_mapreduce_spark.queries.llm_text3 import bpe_train_kmerges

    rows = sorted(
        bpe_train_kmerges(spark, sf_dir).collect(), key=lambda r: r.merge_rank
    )
    assert [r.merge_rank for r in rows] == [1, 2, 3]
    for a, b in zip(rows, rows[1:]):
        assert b.symbols_after == a.symbols_after - b.pair_count
        assert b.pair_count <= a.pair_count
    for r in rows:
        assert r.merged == r.pair.replace(" ", "")


def test_pq_adc_recall_vs_bruteforce(spark, sf_dir):
    """PQ-ADC is approximate; the 50-wide shortlist + exact rerank
    must recover most of the true top-10, and ADC distances must be
    non-negative."""
    from swat_mapreduce_spark.queries.similarity import (
        ann_pq_adc_topk,
        ann_topk_bruteforce,
    )

    pq = ann_pq_adc_topk(spark, sf_dir).collect()
    bf = ann_topk_bruteforce(spark, sf_dir).collect()
    assert len(pq) == 10 and len(bf) == 10
    assert all(r.adc_dist >= 0 for r in pq)
    # with the 50-wide ADC shortlist + exact rerank, every true-top-10
    # member that survives the shortlist lands in the final 10; the
    # measured shortlist recall is 8/10 here (sf0.001)
    overlap = {r.vec_id for r in pq} & {r.vec_id for r in bf}
    assert len(overlap) >= 6, f"PQ shortlist recall collapsed: {sorted(overlap)}"


def test_prefix_filter_jaccard_is_exact_superset_of_capped(spark, sf_dir):
    """The prefix-filtered join is EXACT: it must equal brute-force
    ground truth, and every capped-join pair whose TRUE jaccard meets
    the exact join's threshold must appear (the capped jaccard itself
    can land on either side of the true value, so it is not the
    gate)."""
    from swat_mapreduce_spark.operators import dedup as DD
    from swat_mapreduce_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in DD.jaccard_prefix_filter_pairs(docs, threshold=0.7).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in DD.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert exact, "exact join returned no pairs — vacuous test"
    # brute-force ground truth over the (small) doc set
    sh = {
        r.doc_id: (set(r.sh_arr), r.lang)
        for r in DD.doc_shingle_arrays(docs, 3, extra_cols=("lang",)).collect()
    }
    truth = {}
    ids = sorted(sh)
    for i, da in enumerate(ids):
        sa, la = sh[da]
        if not sa:
            continue
        for db in ids[i + 1:]:
            sb, lb = sh[db]
            if la != lb or not sb:
                continue
            inter = len(sa & sb)
            if inter:
                j = inter / (len(sa) + len(sb) - inter)
                if round(j * 10000) / 10000 >= 0.7:
                    truth[(da, db)] = j
    assert set(exact) == set(truth), (
        f"exact-join pairs disagree with brute force: "
        f"missing={set(truth) - set(exact)} extra={set(exact) - set(truth)}"
    )
    for pair in capped:
        # The capped jaccard can sit ABOVE the true value (dropping a
        # hot shingle present in only one doc of the pair shrinks the
        # union but not the intersection), so gate on the TRUE jaccard,
        # not the capped one: only capped pairs whose true similarity
        # meets the exact join's 0.7 bar must appear there.
        if pair in truth:
            assert pair in exact, f"capped pair {pair} missing from exact join"


def test_bpe_train_survives_empty_corpus(spark, tmp_path):
    """An empty documents table must yield a schema-correct empty
    result, not an IndexError on the driver-side argmax collect."""
    from swat_mapreduce_spark.queries.llm_text3 import (
        bpe_encode_corpus,
        bpe_train_kmerges,
    )

    df = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(d)
    import glob, os, shutil
    f = glob.glob(os.path.join(d, "part-*.parquet"))[0]
    shutil.move(f, os.path.join(str(tmp_path), "documents.parquet"))
    out = bpe_train_kmerges(spark, str(tmp_path))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "merge_rank", "pair", "merged", "pair_count", "symbols_after",
    ]
    assert bpe_encode_corpus(spark, str(tmp_path)).count() == 0


def test_bpe_oracle_parity_under_k_adoptable_merges(spark, tmp_path):
    """A corpus with fewer than K adoptable merges: the Spark trainer
    breaks early and encodes with the partially merged vocab; the
    DuckDB oracle must carry s{k-1} through an empty merge round
    (LEFT JOIN ON TRUE identity) instead of collapsing the vocab to
    0 rows via a CROSS JOIN with an empty b{k} (ADVICE r5)."""
    import glob
    import os
    import shutil

    import duckdb

    from swat_mapreduce_spark.queries import load_all

    # "ab" alone: round 1 adopts ('a','b'); rounds 2..K find no pair.
    rows = [(i, "ab ab ab", "en", "unit", 8) for i in range(3)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "docs")
    df.repartition(1).write.parquet(d)
    f = glob.glob(os.path.join(d, "part-*.parquet"))[0]
    shutil.move(f, os.path.join(str(tmp_path), "documents.parquet"))

    sys_tools = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    )
    import sys

    sys.path.insert(0, sys_tools)
    from selfcheck import table_hash

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    reg = load_all()
    for name in ("bpe_train_kmerges", "bpe_encode_corpus"):
        q = reg[name]
        sdf = q.spark_fn(spark, str(tmp_path))
        sh, sn = table_hash(sdf.columns, [tuple(r) for r in sdf.collect()])
        res = con.sql(q.oracle)
        drows = [tuple(m[c] for c in res.columns) for m in res.arrow().to_pylist()]
        dh, dn = table_hash(list(res.columns), drows)
        assert (sn, sh) == (dn, dh), (
            f"{name}: spark({sn},{sh}) != duck({dn},{dh})"
        )
        assert sn > 0, f"{name}: vacuous 0-row parity (gotcha 5)"
