"""Invariant tests for hybrid RRF fusion, the KS drift test, and the
round-6 dedup additions (quality keeper, intra-doc chunk trimming)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from swat_mapreduce_spark.queries import load_all


def _q(name):
    return load_all()[name]


def test_rrf_fusion_scores_and_membership(spark, sf_dir):
    rows = _q("hybrid_rrf_fusion").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 10
    prev = None
    for r in rows:
        assert r["r_lex"] is not None or r["r_sem"] is not None
        want = 0.0
        for rank in (r["r_lex"], r["r_sem"]):
            if rank is not None:
                assert 1 <= rank <= 50
                want += round(1.0 / (60 + rank) * 1e8) / 1e8
        assert abs(r["rrf_score"] - round(want * 1e6) / 1e6) < 1e-9
        if prev is not None:
            assert r["rrf_score"] <= prev + 1e-12
        prev = r["rrf_score"]
    # a doc present in BOTH lists at similar ranks must beat a doc in
    # one list at the same rank — the whole point of fusion
    both = [r for r in rows if r["r_lex"] and r["r_sem"]]
    if both:
        single_best = max(
            (r["rrf_score"] for r in rows if not (r["r_lex"] and r["r_sem"])),
            default=0.0,
        )
        assert max(r["rrf_score"] for r in both) > single_best - 1e-9


def test_ks_matches_scipy_free_recompute(spark, sf_dir):
    row = _q("ks_two_sample_lengths").spark_fn(spark, sf_dir).collect()[0]
    con = duckdb.connect()
    lens = con.execute(
        f"SELECT source, n_chars FROM "
        f"read_parquet('{sf_dir}/documents.parquet') "
        f"WHERE source IN ('src0', 'src1')"
    ).fetchall()
    a = sorted(n for s, n in lens if s == "src0")
    b = sorted(n for s, n in lens if s == "src1")
    assert (row["n1"], row["n2"]) == (len(a), len(b))
    import bisect

    vals = sorted(set(a) | set(b))
    d = max(
        abs(
            bisect.bisect_right(a, v) / len(a)
            - bisect.bisect_right(b, v) / len(b)
        )
        for v in vals
    )
    assert abs(row["ks_stat"] - round(d * 1e6) / 1e6) < 1e-9
    crit = 1.358 * ((len(a) + len(b)) / (len(a) * len(b))) ** 0.5
    assert abs(row["ks_crit"] - round(crit * 1e6) / 1e6) < 1e-9
    assert row["reject"] == (row["ks_stat"] > row["ks_crit"])


def test_keeper_by_quality_elects_longest_member(spark, sf_dir):
    rows = _q("dedup_keeper_by_quality").spark_fn(spark, sf_dir).collect()
    assert rows
    from swat_mapreduce_spark.functions.text import ws_tokens
    from swat_mapreduce_spark.sources.readers import read_table

    toks = {
        r["doc_id"]: r["n"]
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(ws_tokens(F.col("text"))).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["n_members"] >= 2
        assert toks[r["keeper_doc"]] == r["keeper_toks"]
    # keeper must match the min-id keeper's CLUSTERS (same components
    # stack) but may elect a different doc: verify against the min-id
    # variant's membership counts
    base = {
        r["component"]: r["comp_size"]
        for r in _q("dedup_cluster_components")
        .spark_fn(spark, sf_dir)
        .collect()
        if r["is_keeper"]
    }
    for r in rows:
        assert base[r["component"]] == r["n_members"]


def test_selfdedup_reassembles_first_occurrences(spark, sf_dir):
    rows = (
        _q("selfdedup_repeated_chunks")
        .spark_fn(spark, sf_dir)
        .orderBy("doc_id")
        .limit(200)
        .collect()
    )
    assert rows
    import hashlib

    con = duckdb.connect()
    texts = dict(
        con.execute(
            f"SELECT doc_id, text FROM "
            f"read_parquet('{sf_dir}/documents.parquet') "
            f"ORDER BY doc_id LIMIT 200"
        ).fetchall()
    )
    any_dup = False
    for r in rows:
        toks = texts[r["doc_id"]].split()
        chunks = [
            " ".join(toks[i : i + 2]) for i in range(0, len(toks), 2)
        ]
        seen, kept = set(), []
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        assert r["n_chunks"] == len(chunks)
        assert r["n_kept"] == len(kept)
        assert r["dup_chunks"] == len(chunks) - len(kept)
        any_dup = any_dup or r["dup_chunks"] > 0
        want = hashlib.md5(" ".join(kept).encode()).hexdigest()
        assert r["clean_md5"] == want
    assert any_dup, "corpus must exercise the dup-trim path (gotcha 5)"
