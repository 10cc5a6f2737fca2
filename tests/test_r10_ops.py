"""Non-oracle invariant tests for the round-10 operators: each new
query must satisfy structural identities the oracle comparison cannot
express (bounds, conservation laws, cross-query consistency) so a
driver-green hash can never hide a semantically wrong implementation.
Runs at sf0.001 on the shared session fixture."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def reg():
    from swat_mapreduce_spark.queries import load_all

    return load_all()


def _rows(reg, spark, sf_dir, name):
    return [r.asDict() for r in reg[name].spark_fn(spark, sf_dir).collect()]


def test_friedman_rank_conservation(reg, spark, sf_dir):
    rows = _rows(reg, spark, sf_dir, "friedman_event_types")
    assert len(rows) == 5
    n = rows[0]["rank_sum"] + 0  # noqa: F841
    n_days = round(sum(r["rank_sum"] for r in rows) / (5 * 6 / 2))
    # ranks 1..5 per block sum to 15; totals conserve n_days * 15
    assert sum(r["rank_sum"] for r in rows) == n_days * 15
    assert all(r["q_stat"] >= 0 for r in rows)


def test_grubbs_positive_and_bounded(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "grubbs_outlier_daily")
    n = row["n_days"]
    assert 0 < row["g_stat"] <= (n - 1) / (n ** 0.5) + 1e-9


def test_mood_cell_conservation(reg, spark, sf_dir):
    rows = _rows(reg, spark, sf_dir, "mood_median_test_lang")
    total = sum(r["n_above"] + r["n_at_or_below"] for r in rows)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert total == docs
    assert all(r["chi2"] >= 0 for r in rows)


def test_wilcoxon_w_bounds(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "wilcoxon_signed_rank_halfday")
    n = row["n_pairs"]
    assert 0 <= row["w_plus"] <= n * (n + 1) / 2


def test_sign_test_probability_bounds(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "sign_test_halfday")
    assert 0 < row["p_two_sided"] <= 1.0
    assert row["n_positive"] + row["n_negative"] == row["n_pairs"]


def test_sign_test_exact_binomial_against_python(reg, spark, sf_dir):
    """The in-plan binomial tail must equal an independent exact
    computation with Fraction arithmetic."""
    from fractions import Fraction

    from math import comb

    (row,) = _rows(reg, spark, sf_dir, "sign_test_halfday")
    n, m = row["n_pairs"], min(row["n_positive"], row["n_negative"])
    p = min(
        Fraction(1),
        2 * sum(Fraction(comb(n, k)) for k in range(m + 1)) / Fraction(2) ** n,
    )
    assert abs(row["p_two_sided"] - float(p)) < 5e-9


def test_cronbach_alpha_upper_bound(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "cronbach_alpha_event_types")
    assert row["alpha"] <= 1.0
    assert row["k_items"] == 5


def test_jonckheere_bounds(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "jonckheere_terpstra_priority_qty")
    assert 0 <= row["jt2"] <= 4 * row["mean2"]  # JT2 max = 2*sum ninj = 4*mean


def test_hodges_lehmann_within_range(reg, spark, sf_dir):
    from swat_mapreduce_spark.queries.stats_tests import _daily_value

    (row,) = _rows(reg, spark, sf_dir, "hodges_lehmann_daily")
    daily = [float(r["x"]) for r in _daily_value(spark, sf_dir).collect()]
    assert min(daily) - 1e-6 <= row["hl_estimate"] <= max(daily) + 1e-6
    n = row["n_days"]
    assert row["n_pairs"] == n * (n + 1) // 2


def test_did_internal_consistency(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "diff_in_diff_value")
    expect = (row["m_treat_post"] - row["m_treat_pre"]) - (
        row["m_ctrl_post"] - row["m_ctrl_pre"]
    )
    assert abs(row["did"] - expect) < 2e-6


def test_iv_wald_ratio_consistency(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "iv_wald_estimator")
    assert abs(row["late_wald"] - row["itt_y"] / row["itt_x"]) < 1e-3


def test_mase_eval_window(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "mase_seasonal_naive_eval")
    assert row["n_eval"] == 23  # 30 days − 7-lag burn-in
    assert row["mase"] > 0


def test_bartlett_nonnegative(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "bartlett_variance_lang")
    assert row["t_stat"] >= 0
    assert row["k_groups"] == 5


def test_pacf_lag1_equals_acf_lag1(reg, spark, sf_dir):
    pacf = {
        r["lag"]: r["pacf"]
        for r in reg["pacf_durbin_levinson"].spark_fn(spark, sf_dir).collect()
    }
    acf = {
        r["lag"]: r["acf"]
        for r in reg["acf_daily_lags"].spark_fn(spark, sf_dir).collect()
    }
    # phi_{1,1} = r_1 by construction
    assert abs(pacf[1] - acf[1]) < 2e-6
    assert all(abs(v) <= 1.0 + 1e-9 for v in pacf.values())


def test_stupid_backoff_counts_conserve(reg, spark, sf_dir):
    import pyspark.sql.functions as F

    rows = _rows(reg, spark, sf_dir, "stupid_backoff_trigram")
    assert all(r["avg_nll"] > 0 for r in rows if r["n_scored"])
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from swat_mapreduce_spark.functions.text import ws_tokens

    tri_total = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select(ws_tokens(F.col("text")).alias("t"))
        .filter(F.size("t") >= 3)
        .agg(F.sum(F.size("t") - 2))
        .collect()[0][0]
    )
    assert sum(r["n_scored"] + r["n_oov"] for r in rows) == tri_total


def test_moore_lewis_topk_shape(reg, spark, sf_dir):
    rows = _rows(reg, spark, sf_dir, "moore_lewis_selection")
    assert len(rows) == 20
    assert all(r["h_in"] > 0 and r["h_out"] > 0 for r in rows)
    scores = [r["ml_score"] for r in rows]
    assert scores == sorted(scores)


def test_flesch_covers_all_docs(reg, spark, sf_dir):
    rows = _rows(reg, spark, sf_dir, "flesch_reading_ease")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == docs


def test_mattr_bounds(reg, spark, sf_dir):
    rows = _rows(reg, spark, sf_dir, "mattr_lexical_diversity")
    assert all(0 < r["mean_mattr"] <= 1.0 for r in rows)


def test_fleiss_kappa_distribution_conserves(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "fleiss_kappa_filters")
    assert (
        row["n_yes0"] + row["n_yes1"] + row["n_yes2"] + row["n_yes3"]
        == row["n_docs"]
    )
    assert row["fleiss_kappa"] <= 1.0


def test_pr_auc_bounds(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "pr_auc_average_precision")
    assert 0 <= row["average_precision"] <= 1.0
    assert 0 < row["prevalence"] < 1.0


def test_brier_identity_closes(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "brier_score_decomposition")
    lhs = row["brier"]
    rhs = (
        row["reliability"]
        - row["resolution"]
        + row["uncertainty"]
        + row["within_bin_variance"]
    )
    assert abs(lhs - rhs) < 5e-6
    assert 0 <= row["brier"] <= 1


def test_clustering_coefficient_bounds(reg, spark, sf_dir):
    rows = _rows(reg, spark, sf_dir, "local_clustering_coefficient")
    assert rows, "graph must be non-empty"
    assert all(0 <= r["clustering_coef"] <= 1.0 for r in rows)
    assert all(r["degree"] >= 2 for r in rows)


def test_jaccard_link_bounds(reg, spark, sf_dir):
    rows = _rows(reg, spark, sf_dir, "jaccard_link_prediction")
    assert rows
    assert all(0 < r["jaccard"] <= 1.0 for r in rows)
    assert all(r["n_common"] >= 1 for r in rows)


def test_t_closeness_bounds(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "t_closeness_audit")
    assert 0 <= row["max_t"] <= 1.0
    assert 0 <= row["share_above_t"] <= 1.0
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert row["n_rows"] == docs


def test_multimodal_dup_histogram_conserves(reg, spark, sf_dir):
    rows = _rows(reg, spark, sf_dir, "multimodal_exact_dup_binary")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == docs
    for r in rows:
        assert r["n_docs"] == r["n_copies"] * r["n_groups"]


def test_fk_audit_attests_integrity(reg, spark, sf_dir):
    rows = _rows(reg, spark, sf_dir, "fk_orphan_audit")
    assert len(rows) == 7
    assert all(r["n_orphans"] == 0 for r in rows)
    assert all(r["n_child"] > 0 for r in rows)


def test_cliff_delta_bounds_and_band(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "cliff_delta_lengths")
    d = abs(row["cliffs_delta"])
    assert d <= 1.0
    band = row["magnitude"]
    expect = (
        "negligible" if d < 0.147 else
        "small" if d < 0.330 else
        "medium" if d < 0.474 else "large"
    )
    assert band == expect


def test_smd_balanced_flag_consistent(reg, spark, sf_dir):
    rows = _rows(reg, spark, sf_dir, "covariate_balance_smd")
    assert len(rows) == 3
    for r in rows:
        assert r["balanced"] == (abs(r["smd"]) < 0.1)


def test_gini_stump_improves_purity(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "gini_stump_split")
    assert row["weighted_gini"] <= row["gini_parent"] + 1e-9
    assert row["n_left"] > 0 and row["n_right"] > 0


def test_umass_coherence_shape(reg, spark, sf_dir):
    rows = _rows(reg, spark, sf_dir, "umass_topic_coherence")
    assert len(rows) == 20  # one per source
    assert all(r["n_pairs"] == 45 for r in rows)  # C(10,2)
    # D(wi,wj) <= D(wj) so every ln((d+1)/D) <= ln((D+1)/D) ~ small;
    # coherence is a sum of mostly-negative terms
    assert all(r["umass_coherence"] < 45 for r in rows)


def test_banzhaf_dummy_axiom_direction(reg, spark, sf_dir):
    """A group with zero own coverage cannot out-value one whose
    shingles cover everything; and values are finite/ordered sanely."""
    rows = _rows(reg, spark, sf_dir, "banzhaf_coverage_attribution")
    assert len(rows) == 5
    assert all(r["own_coverage"] >= 0 for r in rows)
    assert all(r["banzhaf_value"] >= 0 for r in rows)


# --- batches E/F ------------------------------------------------------------

def test_nelson_aalen_monotone(reg, spark, sf_dir):
    rows = sorted(
        _rows(reg, spark, sf_dir, "nelson_aalen_hazard"),
        key=lambda r: r["dur_week"],
    )
    ch = [r["cum_hazard"] for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(ch, ch[1:]))
    assert all(r["hazard_inc"] > 0 for r in rows)


def test_logrank_chi2_nonnegative(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "logrank_test_survival")
    assert row["chi2"] >= 0
    assert row["observed_g1"] >= 0 and row["expected_g1"] > 0


def test_youden_dominates_extremes(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "youden_j_threshold")
    # J at the best threshold >= J at the degenerate all/none points (0)
    assert row["youden_j"] >= -1e-9
    assert abs((row["tpr"] - row["fpr"]) - row["youden_j"]) < 2e-6


def test_holm_rejects_prefix(reg, spark, sf_dir):
    rows = sorted(
        _rows(reg, spark, sf_dir, "holm_bonferroni_tests"),
        key=lambda r: r["holm_rank"],
    )
    flags = [r["rejected"] for r in rows]
    # step-down property: rejections form a prefix of the sorted list
    assert flags == sorted(flags, reverse=True)
    # Holm is never less conservative than raw alpha on the same p's
    for r in rows:
        if r["rejected"]:
            assert r["p_value"] <= 0.05 + 1e-12


def test_preferential_attachment_scores_consistent(reg, spark, sf_dir):
    rows = _rows(reg, spark, sf_dir, "preferential_attachment_links")
    assert rows
    for r in rows:
        assert r["pa_score"] == r["deg_a"] * r["deg_b"]


def test_rich_club_monotone_n(reg, spark, sf_dir):
    rows = sorted(
        _rows(reg, spark, sf_dir, "rich_club_coefficient"),
        key=lambda r: r["min_degree_excl"],
    )
    ns = [r["n_nodes"] for r in rows]
    assert all(b <= a for a, b in zip(ns, ns[1:]))  # stricter k, fewer nodes
    assert all(0 <= r["rich_club_coef"] <= 1.0 for r in rows)


def test_xi_bounds(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "xi_correlation_chatterjee")
    # xi in [-1/2 + O(1/n), 1]; for n=30 the floor is far above -1
    assert -1.0 <= row["xi"] <= 1.0


def test_gamma_bounds_and_jt_consistency(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "goodman_kruskal_gamma")
    assert -1.0 <= row["gamma"] <= 1.0
    (jt,) = _rows(reg, spark, sf_dir, "jonckheere_terpstra_priority_qty")
    # JT2 = 2C + ties; so C <= JT2/2
    assert row["concordant"] <= jt["jt2"] / 2 + 1e-9


def test_srm_counts_cover_users(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "srm_sample_ratio_mismatch")
    users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert row["n_treat"] + row["n_ctrl"] == users


def test_qq_gaps_consistent(reg, spark, sf_dir):
    rows = sorted(
        _rows(reg, spark, sf_dir, "qq_plot_deciles"),
        key=lambda r: r["percentile"],
    )
    assert [r["percentile"] for r in rows] == list(range(10, 100, 10))
    for r in rows:
        assert r["qq_gap"] == r["q_en"] - r["q_other"]
    # quantiles are monotone in the percentile
    qs = [r["q_en"] for r in rows]
    assert qs == sorted(qs)


def test_mean_excess_counts_decrease(reg, spark, sf_dir):
    rows = sorted(
        _rows(reg, spark, sf_dir, "mean_excess_pot_ladder"),
        key=lambda r: r["threshold"],
    )
    ns = [r["n_exceed"] for r in rows]
    assert all(b <= a for a, b in zip(ns, ns[1:]))
    assert all(r["mean_excess"] > 0 for r in rows)


def test_rmst_bounds(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "rmst_survival")
    assert 0 < row["rmst_weeks"] <= row["tau_weeks"]


def test_hill_alpha_positive(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "hill_tail_index_tokens")
    assert row["hill_h"] >= 0
    if row["tail_alpha"] is not None:
        assert row["tail_alpha"] > 0


def test_calinski_harabasz_positive(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "calinski_harabasz_embeddings")
    assert row["k_clusters"] == 10
    assert row["ssw"] > 0 and row["ssb"] > 0
    assert row["calinski_harabasz"] > 0


def test_davies_bouldin_shape(reg, spark, sf_dir):
    rows = _rows(reg, spark, sf_dir, "davies_bouldin_embeddings")
    assert len(rows) == 10
    db = {r["davies_bouldin"] for r in rows}
    assert len(db) == 1  # the index is global, repeated per row
    assert all(r["worst_ratio"] > 0 and r["avg_scatter"] > 0 for r in rows)
    # DB is the mean over per-label worst ratios
    mean_worst = sum(r["worst_ratio"] for r in rows) / len(rows)
    assert abs(mean_worst - rows[0]["davies_bouldin"]) < 5e-4


def test_breslow_day_expected_within_bounds(reg, spark, sf_dir):
    rows = _rows(reg, spark, sf_dir, "breslow_day_homogeneity")
    assert len(rows) == 5
    assert all(r["bd_term"] >= 0 for r in rows)
    (bd,) = {r["bd_stat"] for r in rows}
    assert abs(bd - sum(r["bd_term"] for r in rows)) < 5e-4


def test_resource_allocation_scores_positive(reg, spark, sf_dir):
    rows = _rows(reg, spark, sf_dir, "resource_allocation_links")
    assert rows
    assert all(r["ra_score"] > 0 and r["n_common"] >= 1 for r in rows)


def test_simpson_triple_consistent(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "simpson_diversity_sources")
    assert abs(row["simpson_d"] + row["simpson_diversity"] - 1.0) < 2e-6
    # the UNBIASED estimator n(n-1)/(N(N-1)) can push 1/D slightly
    # above k on an even mix (it under-counts dominance); the k bound
    # only holds for the plug-in p² form, so assert the loose bounds
    assert 1.0 < row["inverse_simpson"] <= row["n_docs"]
    assert 0 < row["simpson_d"] < 1


def test_dixon_q_bounds(reg, spark, sf_dir):
    (row,) = _rows(reg, spark, sf_dir, "dixon_q_outlier_daily")
    assert 0 <= row["q_low"] <= 1 and 0 <= row["q_high"] <= 1
    assert row["flag_extreme"] == (max(row["q_low"], row["q_high"]) > 0.29)


def test_somers_d_magnitude_le_gamma(reg, spark, sf_dir):
    (sd,) = _rows(reg, spark, sf_dir, "somers_d_priority_qty")
    (gm,) = _rows(reg, spark, sf_dir, "goodman_kruskal_gamma")
    # |D| <= |gamma|: same numerator, D's denominator adds tie mass
    assert abs(sd["somers_d"]) <= abs(gm["gamma"]) + 1e-9
    assert sd["concordant"] == gm["concordant"]


def test_gwet_ac1_vs_fleiss_panel(reg, spark, sf_dir):
    (ac1,) = _rows(reg, spark, sf_dir, "gwet_ac1_filters")
    (fk,) = _rows(reg, spark, sf_dir, "fleiss_kappa_filters")
    assert ac1["n_docs"] == fk["n_docs"]
    assert abs(ac1["p_a"] - fk["p_bar"]) < 2e-6  # same observed agreement
    assert ac1["gwet_ac1"] <= 1.0
