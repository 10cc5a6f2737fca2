"""Planted-data semantics tests for the round-11 operators."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from swat_mapreduce_spark.queries import load_all

REG = load_all()


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/{name}.parquet")


def _docs(spark, tmp_path, texts):
    rows = [
        (i, t, "en", "s", len(t)) for i, t in enumerate(texts)
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )


def test_rouge2_identical_and_disjoint(spark, tmp_path):
    """48 planted docs pair consecutively in hash order; every doc is
    one of two disjoint-vocabulary texts, so each pair is either
    identical (F1 = 1.0) or disjoint (F1 = 0.0) — no third value can
    appear, and at least one of each must (hash order mixes them)."""
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "one two three four five six seven eight"
    _docs(spark, tmp_path, [a if i % 2 == 0 else b for i in range(48)])
    rows = REG["rouge2_pair_overlap"].spark_fn(spark, str(tmp_path)).collect()
    assert len(rows) == 24
    vals = {r["rouge2_f1"] for r in rows}
    assert vals <= {0.0, 1.0} and vals == {0.0, 1.0}, vals
    for r in rows:
        if r["rouge2_f1"] == 1.0:
            assert r["n_match"] == r["n_ref"] == r["n_cand"] == 7


def test_log_bleu2_identical_pair_is_near_zero(spark, tmp_path):
    """An identical pair's smoothed log-BLEU-2 is exactly 0 (the +1
    smoothing cancels: (m+1)/(c+1) = 1 when m = c), never positive;
    disjoint pairs are strongly negative."""
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "one two three four five six seven eight"
    _docs(spark, tmp_path, [a if i % 2 == 0 else b for i in range(48)])
    rows = (
        REG["log_bleu2_pair_overlap"].spark_fn(spark, str(tmp_path)).collect()
    )
    assert len(rows) == 24
    for r in rows:
        assert r["log_bleu2"] <= 0.0
        if r["n_match2"] == 7:  # identical pair
            assert r["log_bleu2"] == 0.0
        else:  # disjoint pair
            assert r["log_bleu2"] < -1.0


def test_chrf3_identical_pair_is_one(spark, tmp_path):
    a = "alpha beta gamma delta"
    b = "zzz yyy xxx www"
    _docs(spark, tmp_path, [a if i % 2 == 0 else b for i in range(48)])
    rows = REG["chrf3_pair_overlap"].spark_fn(spark, str(tmp_path)).collect()
    got = {r["chrf3_beta2"] for r in rows}
    assert 1.0 in got and min(got) < 0.2, got


def test_levenshtein_linkage_finds_planted_neighbor(spark, tmp_path):
    """'red widget' vs 'red gadget' (dist 3) in the same brand must
    link; a cross-brand twin must NOT (blocking), and an over-distance
    name must not."""
    rows = [
        (1, "red widget", "B1", "PROMO", 1, 1.0),
        (2, "red gadget", "B1", "PROMO", 1, 1.0),
        (3, "red widget", "B2", "PROMO", 1, 1.0),  # other block
        (4, "completely other", "B1", "PROMO", 1, 1.0),
    ]
    _write(
        spark, tmp_path, "part", rows,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    out = (
        REG["levenshtein_blocked_linkage"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    )
    pairs = {(r["probe_key"], r["match_key"]) for r in out}
    assert (1, 2) in pairs or (2, 1) in pairs
    assert all({a, b} != {1, 3} for a, b in pairs), "blocking violated"
    assert all(4 not in p for p in pairs)


def test_generalized_esd_rounds_shrink_and_unique(spark, tmp_path):
    """Each round removes the elected day: n_remaining decreases by 1
    and no day is elected twice; a planted spike is round 1's pick."""
    rows = []
    for d in range(12):
        v = 1000.0 if d == 5 else 10.0 + d * 0.5
        rows.append((datetime.datetime(2024, 1, 1 + d, 9, 0, 0), v))
    spark.createDataFrame(rows, "ts timestamp, value double").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = REG["generalized_esd_daily"].spark_fn(spark, str(tmp_path)).collect()
    assert [r["n_remaining"] for r in out] == [12, 11, 10]
    days = [r["outlier_day"] for r in out]
    assert len(set(days)) == 3
    assert days[0] == datetime.date(2024, 1, 6)


def test_ams_f2_estimate_within_sketch_error(spark, tmp_path):
    """Median-of-means over 16 sign sketches: relative error well
    under 1 on a zipf-ish planted corpus, and true_f2 is exact."""
    texts = ["aa " * (50 - i) + f"tok{i} " * (i + 1) for i in range(20)]
    _docs(spark, tmp_path, texts)
    r = REG["ams_f2_sketch_tokens"].spark_fn(spark, str(tmp_path)).first()
    assert r["rel_err"] < 1.0
    # true F2 dominated by the 'aa' token: c_aa = sum(50-i) = 790
    assert r["true_f2"] >= 790 * 790


def test_ktruss_planted_clique(spark, tmp_path):
    """K4 on parts {1,2,3,4}: every of the 6 edges has support 2 →
    survives k=3 and k=4 (needs 2), not k=5 (needs 3)."""
    li = [(1, 1), (1, 2), (1, 3), (1, 4)]
    _write(spark, tmp_path, "lineitem", li,
           "l_orderkey long, l_partkey long")
    _write(spark, tmp_path, "part",
           [(p, "PROMO") for p in (1, 2, 3, 4)],
           "p_partkey long, p_type string")
    out = {
        r["k"]: r
        for r in REG["ktruss_support_ladder"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert out[3]["n_edges"] == 6 and out[3]["max_support"] == 2
    assert out[3]["n_truss_edges"] == 6
    assert out[4]["n_truss_edges"] == 6
    assert out[5]["n_truss_edges"] == 0


def test_katz_planted_star(spark, tmp_path):
    """Star center c with 3 leaves: score(c) = 10·3 + Σ d(leaf)=3 → 33;
    each leaf: 10·1 + d(c)=3 → 13; katz_score = score/100."""
    li = [(1, 1), (1, 2), (2, 1), (2, 3), (3, 1), (3, 4)]
    _write(spark, tmp_path, "lineitem", li,
           "l_orderkey long, l_partkey long")
    _write(spark, tmp_path, "part",
           [(p, "PROMO") for p in (1, 2, 3, 4)],
           "p_partkey long, p_type string")
    out = {
        r["part"]: r
        for r in REG["katz_centrality_2hop"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert out[1]["katz_score"] == 0.33 and out[1]["walks2"] == 3
    assert out[2]["katz_score"] == 0.13 and out[2]["degree"] == 1


def test_hashed_quality_score_deterministic_and_additive(spark, tmp_path):
    """Duplicate docs double total_score; the per-token mean is
    unchanged — the scorer is a pure token-weight sum."""
    _docs(spark, tmp_path, ["alpha beta gamma"])
    r1 = (
        REG["hashed_linear_quality_score"]
        .spark_fn(spark, str(tmp_path))
        .first()
    )
    _docs(spark, tmp_path, ["alpha beta gamma"] * 2)
    r2 = (
        REG["hashed_linear_quality_score"]
        .spark_fn(spark, str(tmp_path))
        .first()
    )
    assert r2["total_score"] == 2 * r1["total_score"]
    assert r2["mean_token_weight"] == r1["mean_token_weight"]
    assert r2["n_docs"] == 2


def test_herfindahl_single_customer_is_one(spark, tmp_path):
    rows = [(1, 10, 100.0), (2, 10, 50.0)]
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey long, o_custkey long, o_totalprice double")
    r = (
        REG["herfindahl_customer_revenue"]
        .spark_fn(spark, str(tmp_path))
        .first()
    )
    assert r["n_customers"] == 1 and r["hhi"] == 1.0


def test_herfindahl_two_equal_customers(spark, tmp_path):
    rows = [(1, 10, 100.0), (2, 20, 100.0)]
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey long, o_custkey long, o_totalprice double")
    r = (
        REG["herfindahl_customer_revenue"]
        .spark_fn(spark, str(tmp_path))
        .first()
    )
    assert r["hhi"] == 0.5 and r["hhi_uniform_floor"] == 0.5


def test_cox_stuart_monotone_series(spark, tmp_path):
    """Strictly increasing 10-day series: c = 5, all 5 pairs up."""
    rows = [
        (datetime.datetime(2024, 2, 1 + d, 9, 0, 0), 10.0 + d)
        for d in range(10)
    ]
    spark.createDataFrame(rows, "ts timestamp, value double").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = REG["cox_stuart_trend_daily"].spark_fn(spark, str(tmp_path)).first()
    assert (r["n_days"], r["n_pairs"], r["n_up"], r["n_down"]) == (
        10, 5, 5, 0,
    )


def test_tv_and_bhattacharyya_identical_distributions(spark, tmp_path):
    """en and non-en docs share the exact length multiset → TV = 0,
    BC = 1, Hellinger = 0."""
    rows = []
    for i, ln in enumerate([100, 200, 200, 300]):
        rows.append((2 * i, "x " * 5, "en", "s", ln))
        rows.append((2 * i + 1, "x " * 5, "de", "s", ln))
    _write(spark, tmp_path, "documents", rows,
           "doc_id long, text string, lang string, source string,"
           " n_chars long")
    tv = (
        REG["total_variation_lang_lengths"]
        .spark_fn(spark, str(tmp_path))
        .first()
    )
    assert tv["tv_distance"] == 0.0
    bh = (
        REG["bhattacharyya_hellinger_lengths"]
        .spark_fn(spark, str(tmp_path))
        .first()
    )
    assert bh["bhattacharyya_coef"] == 1.0
    assert bh["hellinger_dist"] == 0.0


def test_mutual_information_independent_and_determined(spark, tmp_path):
    """lang == source (balanced 2x2 diagonal) → MI = H(lang) = ln 2;
    independent uniform grid → MI = 0."""
    det = []
    for i in range(8):
        lg = "en" if i % 2 == 0 else "de"
        det.append((i, "x", lg, lg, 10))
    _write(spark, tmp_path, "documents", det,
           "doc_id long, text string, lang string, source string,"
           " n_chars long")
    r = (
        REG["mutual_information_lang_source"]
        .spark_fn(spark, str(tmp_path))
        .first()
    )
    assert abs(r["mutual_info_nats"] - 0.6931) < 1e-9
    assert r["h_lang"] == r["mutual_info_nats"]
    ind = []
    k = 0
    for lg in ("en", "de"):
        for src in ("a", "b"):
            for _ in range(3):
                ind.append((k, "x", lg, src, 10))
                k += 1
    _write(spark, tmp_path, "documents", ind,
           "doc_id long, text string, lang string, source string,"
           " n_chars long")
    r2 = (
        REG["mutual_information_lang_source"]
        .spark_fn(spark, str(tmp_path))
        .first()
    )
    assert r2["mutual_info_nats"] == 0.0


def test_poisson_dispersion_uniform_counts_is_zero(spark, tmp_path):
    """Identical daily counts → chi2 = 0, dispersion 0."""
    rows = []
    for d in range(5):
        for h in range(4):
            rows.append(
                (datetime.datetime(2024, 3, 1 + d, 6 + h, 0, 0), 1.0)
            )
    spark.createDataFrame(rows, "ts timestamp, value double").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = (
        REG["poisson_dispersion_daily"].spark_fn(spark, str(tmp_path)).first()
    )
    assert r["chi2_stat"] == 0.0 and r["dispersion_index"] == 0.0


def test_gunning_fog_complex_word_heuristic(spark, tmp_path):
    """'banana' has 3 vowel groups (complex); 'tree' has 1."""
    _docs(spark, tmp_path, ["banana tree banana tree"])
    r = (
        REG["gunning_fog_readability"].spark_fn(spark, str(tmp_path)).first()
    )
    assert r["n_complex_words"] == 2
    # fog = 0.4*(4/1 + 100*2/4) = 0.4*54 = 21.6
    assert r["gunning_fog_index"] == 21.6


def test_renyi_uniform_tokens(spark, tmp_path):
    """4 distinct tokens, once each: H0 = H2 = Hmin = ln 4."""
    _docs(spark, tmp_path, ["alpha beta gamma delta"])
    r = REG["renyi_entropy_tokens"].spark_fn(spark, str(tmp_path)).first()
    import math

    ln4 = round(math.log(4) * 1e6) / 1e6
    assert r["h0_hartley"] == r["h2_collision"] == r["h_min"]
    assert abs(r["h0_hartley"] - ln4) < 1e-9


def test_theil_u_determined_is_one(spark, tmp_path):
    """lang == source → U(L|S) = U(S|L) = 1."""
    det = [(i, "x", "en" if i % 2 else "de", "en" if i % 2 else "de", 10)
           for i in range(8)]
    _write(spark, tmp_path, "documents", det,
           "doc_id long, text string, lang string, source string,"
           " n_chars long")
    r = REG["theil_u_lang_source"].spark_fn(spark, str(tmp_path)).first()
    assert r["u_lang_given_source"] == 1.0
    assert r["u_source_given_lang"] == 1.0


def test_kendall_w_perfect_concordance(spark, tmp_path):
    """Event types keep the same value order every day → W = 1."""
    rows = []
    for d in range(4):
        for j, et in enumerate(["a", "b", "c", "d", "e"]):
            rows.append(
                (datetime.datetime(2024, 4, 1 + d, 9, 0, 0),
                 et, 10.0 * (j + 1))
            )
    spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    r = REG["kendall_w_event_types"].spark_fn(spark, str(tmp_path)).first()
    assert r["n_blocks"] == 4 and r["kendall_w"] == 1.0


def test_footrule_identical_rankings(spark, tmp_path):
    """One event per day with value proportional to count rank →
    both rankings coincide, D = 0, similarity 1."""
    rows = []
    for d in range(6):
        for k in range(d + 1):  # day d has d+1 events
            rows.append(
                (datetime.datetime(2024, 5, 1 + d, 6 + k, 0, 0), 5.0)
            )
    spark.createDataFrame(rows, "ts timestamp, value double").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = REG["spearman_footrule_daily"].spark_fn(spark, str(tmp_path)).first()
    assert r["footrule_d"] == 0 and r["footrule_similarity"] == 1.0


def test_capability_cpk_centered_process(spark, tmp_path):
    """Values symmetric around 50 → Cp == Cpk."""
    rows = [
        (datetime.datetime(2024, 6, 1, 6 + i % 12, 0, 0), float(v))
        for i, v in enumerate([40, 60, 45, 55, 50, 50, 42, 58])
    ]
    spark.createDataFrame(rows, "ts timestamp, value double").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = REG["capability_cpk_values"].spark_fn(spark, str(tmp_path)).first()
    assert r["mean_value"] == 50.0
    assert r["cp"] == r["cpk"] > 0


def test_mantel_haenszel_homogeneous_strata(spark, tmp_path):
    """Two identical strata, each with 2x2 = [[2,1],[1,2]] → pooled
    OR equals the common stratum OR = 4."""
    rows = []
    k = 0
    for src in ("s1", "s2"):
        for lang, long_doc, cnt in [
            ("en", True, 2), ("en", False, 1),
            ("de", True, 1), ("de", False, 2),
        ]:
            for _ in range(cnt):
                rows.append(
                    (k, "x", lang, src, 400 if long_doc else 100)
                )
                k += 1
    _write(spark, tmp_path, "documents", rows,
           "doc_id long, text string, lang string, source string,"
           " n_chars long")
    r = (
        REG["mantel_haenszel_or_sources"].spark_fn(spark, str(tmp_path))
        .first()
    )
    assert r["n_strata"] == 2 and r["or_mantel_haenszel"] == 4.0


def test_skewness_symmetric_is_zero(spark, tmp_path):
    """Symmetric lengths → g1 = 0; two-point mass → g2 = -2."""
    rows = [(i, "x", "en", "s", ln) for i, ln in
            enumerate([100, 100, 200, 200])]
    _write(spark, tmp_path, "documents", rows,
           "doc_id long, text string, lang string, source string,"
           " n_chars long")
    r = (
        REG["skewness_kurtosis_lengths"].spark_fn(spark, str(tmp_path))
        .first()
    )
    assert r["skewness_g1"] == 0.0 and r["excess_kurtosis_g2"] == -2.0


def test_gini_mean_difference_two_values(spark, tmp_path):
    """{0, 10}: GMD = sum|xi-xj|/(n(n-1)) = 2*10/2 = 10."""
    rows = [(0, "x", "en", "s", 0), (1, "x", "en", "s", 10)]
    _write(spark, tmp_path, "documents", rows,
           "doc_id long, text string, lang string, source string,"
           " n_chars long")
    r = (
        REG["gini_mean_difference_lengths"].spark_fn(spark, str(tmp_path))
        .first()
    )
    assert r["gini_mean_difference"] == 10.0


def test_tukey_fence_planted_outlier(spark, tmp_path):
    """Tight cluster at 100 plus one 10000 doc → exactly one high
    outlier, zero low."""
    lens = [100, 101, 102, 103, 104, 105, 106, 107, 10000]
    rows = [(i, "x", "en", "s", ln) for i, ln in enumerate(lens)]
    _write(spark, tmp_path, "documents", rows,
           "doc_id long, text string, lang string, source string,"
           " n_chars long")
    r = (
        REG["tukey_fence_outliers_lengths"].spark_fn(spark, str(tmp_path))
        .first()
    )
    assert r["n_high_outliers"] == 1 and r["n_low_outliers"] == 0


def test_ruzicka_identical_and_disjoint_profiles(spark, tmp_path):
    """de mirrors en's token profile exactly → overlap 1.0; zh is
    disjoint → overlap 0.0."""
    rows = [
        (0, "aa aa bb", "en", "s", 8),
        (1, "aa aa bb", "de", "s", 8),
        (2, "cc dd ee", "zh", "s", 8),
    ]
    _write(spark, tmp_path, "documents", rows,
           "doc_id long, text string, lang string, source string,"
           " n_chars long")
    out = {
        r["lang"]: r
        for r in REG["ruzicka_token_overlap_langs"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    assert out["de"]["ruzicka_overlap"] == 1.0
    assert out["zh"]["ruzicka_overlap"] == 0.0
