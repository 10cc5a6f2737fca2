"""Round-9 operators: pinned against independent invariants (not just
the DuckDB oracle hash)."""

from __future__ import annotations

import math


def _q(name):
    from swat_mapreduce_spark.queries import load_all

    return load_all()[name]


def test_welch_t_matches_closed_form(spark, sf_dir):
    (r,) = _q("welch_ttest_value_by_variant").spark_fn(
        spark, sf_dir
    ).collect()
    assert r["na"] > 1 and r["nb"] > 1
    assert r["welch_df"] > 1
    # df is bounded by min(na,nb)-1 .. na+nb-2 (Welch-Satterthwaite)
    assert min(r["na"], r["nb"]) - 1 <= r["welch_df"] <= r["na"] + r["nb"] - 2
    assert r["significant_z"] == (abs(r["t_stat"]) > 1.96) or abs(
        abs(r["t_stat"]) - 1.96
    ) < 1e-3


def test_sprt_llr_recomputes_and_decides(spark, sf_dir):
    rows = sorted(
        _q("sprt_sequential_conversion").spark_fn(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert len(rows) >= 5
    # recompute the cumulative LLR in exact integer units
    l1 = round(math.log(0.20 / 0.15) * 1e8)
    l0 = round(math.log(0.80 / 0.85) * 1e8)
    cum = 0
    for r in rows:
        cum += r["n_success"] * l1 + (r["n_trials"] - r["n_success"]) * l0
        assert abs(r["cum_llr"] - cum / 1e8) < 1e-3
    # the share of purchases is ~0.2 = H1, so H1 must be accepted
    assert any(r["state"] == "accept_h1" for r in rows)
    assert sum(1 for r in rows if r["is_decision_day"]) == 1


def test_pass_at_k_monotone_and_bounded(spark, sf_dir):
    rows = {
        r["at_k"]: r
        for r in _q("pass_at_k_estimator").spark_fn(spark, sf_dir).collect()
    }
    assert set(rows) == {1, 5, 10}
    # pass@k is nondecreasing in k and bounded by any-success rate
    assert (
        rows[1]["pass_at_k"]
        <= rows[5]["pass_at_k"]
        <= rows[10]["pass_at_k"] + 1e-9
    )
    n = rows[10]["n_docs"]
    # pass@n is EXACTLY the any-success indicator mean
    assert (
        abs(rows[10]["pass_at_k"] - rows[10]["n_docs_any_success"] / n)
        < 1e-3
    )


def test_adamic_adar_scores_positive_and_sorted(spark, sf_dir):
    rows = _q("adamic_adar_link_prediction").spark_fn(
        spark, sf_dir
    ).collect()
    assert 0 < len(rows) <= 20
    scores = [r["aa_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert r["n_common"] >= 1
        # each common neighbor contributes at most 1/ln(2) ~ 1.4427
        assert r["aa_score"] <= r["n_common"] / math.log(2) + 1e-6


def test_unimax_budget_and_caps(spark, sf_dir):
    rows = _q("unimax_budget_allocation").spark_fn(spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in rows)
    budget = (total * 8) // 10
    assert sum(r["alloc_docs"] for r in rows) <= budget
    for r in rows:
        assert 0 <= r["alloc_docs"] <= r["n_docs"]
        assert r["capped"] == (r["alloc_docs"] == r["n_docs"])
        assert r["epochs"] <= 1.0
    # the waterfill must cap at least one low-resource language and
    # truncate the largest one at this budget
    assert any(r["capped"] for r in rows)
    big = max(rows, key=lambda r: r["n_docs"])
    assert not big["capped"]


def test_infonce_bounds(spark, sf_dir):
    (r,) = _q("infonce_temperature_audit").spark_fn(
        spark, sf_dir
    ).collect()
    assert 0 < r["n_anchors"] <= 64
    # loss >= ln(1) = 0 (sum includes the positive term) and is
    # bounded by ln(63) + 10 (cos range /tau = [-5, 5])
    assert 0.0 <= r["mean_infonce"] <= math.log(63) + 10.0
    assert 0.0 <= r["top1_accuracy"] <= 1.0
    assert r["n_top1_correct"] <= r["n_anchors"]


def test_ql_dirichlet_scores_negative_sorted(spark, sf_dir):
    rows = _q("ql_dirichlet_retrieval").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 10
    scores = [r["ql_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # log-probabilities: always negative
        assert r["ql_score"] < 0
        assert r["doc_len"] > 0
    # top docs should actually contain query terms
    assert rows[0]["n_query_hits"] > 0


def test_rho_loss_top_docs(spark, sf_dir):
    rows = _q("rho_loss_selection").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 20
    rhos = [r["rho"] for r in rows]
    assert rhos == sorted(rhos, reverse=True)
    for r in rows:
        assert r["nll_train"] > 0 and r["nll_ref"] > 0
        assert abs(r["rho"] - (r["nll_train"] - r["nll_ref"])) < 2e-4


def test_phash_recall_perfect_by_pigeonhole(spark, sf_dir):
    (r,) = _q("phash_neardup_recall").spark_fn(spark, sf_dir).collect()
    assert r["n_planted"] == 64
    # 4 bands x 8 bits with <=3 bit errors: pigeonhole guarantees a
    # clean band, so banding recall on true-close pairs is exactly 1
    if r["n_true_close"] > 0:
        assert r["band_recall"] == 1.0
    assert r["n_detected"] <= r["n_true_close"] <= r["n_planted"]
    assert 0.0 <= r["mean_hamming"] <= 32.0


def test_holt_winters_seasonal_zero_sum_init(spark, sf_dir):
    rows = sorted(
        _q("holt_winters_dow_forecast").spark_fn(spark, sf_dir).collect(),
        key=lambda r: r["h"],
    )
    assert [r["h"] for r in rows] == list(range(1, 8))
    lv, tr = rows[0]["level"], rows[0]["trend"]
    for r in rows:
        assert r["level"] == lv and r["trend"] == tr
        assert abs(
            r["forecast_revenue"] - (lv + r["h"] * tr + r["seasonal"])
        ) < 0.05
    days = [r["f_day"] for r in rows]
    assert len(set(days)) == 7


def test_wasserstein_nonneg_and_bounded(spark, sf_dir):
    (r,) = _q("wasserstein1d_length_drift").spark_fn(
        spark, sf_dir
    ).collect()
    assert r["na"] > 0 and r["nb"] > 0
    assert r["n_grid"] > 10
    # W1 between distributions on [0, max_len] is within that range
    assert 0.0 <= r["w1_distance"] <= 600.0


def test_k_anonymity_consistency(spark, sf_dir):
    (r,) = _q("k_anonymity_audit").spark_fn(spark, sf_dir).collect()
    assert r["n_groups"] > 0
    assert r["n_rows_below_k"] <= r["n_rows"]
    assert r["n_groups_below_k"] <= r["n_groups"]
    assert 0.0 <= r["share_below_k"] <= 1.0
    assert 1 <= r["min_l_diversity"] <= 5
    assert r["min_group_size"] >= 1


def test_mmd_kernel_bounds(spark, sf_dir):
    (r,) = _q("mmd_embedding_drift").spark_fn(spark, sf_dir).collect()
    assert r["n_a"] == 32 and r["n_b"] == 32
    # RBF kernel values live in (0, 1]; d^2 in [0, 4] -> k >= e^-4
    for c in ("mean_k_within_a", "mean_k_within_b", "mean_k_cross"):
        assert 0.018 <= r[c] <= 1.0
    # unbiased MMD^2 can be slightly negative but is bounded
    assert -1.0 <= r["mmd2"] <= 2.0


def test_kalman_state_sane(spark, sf_dir):
    (r,) = _q("kalman_filter_daily").spark_fn(spark, sf_dir).collect()
    assert r["n_days"] >= 10
    assert r["filtered_level"] > 0
    # steady-state error variance is below the observation variance
    assert 0 < r["error_var_dollars2"] < r["obs_var_dollars2"]
    assert 0.0 < r["last_gain"] < 1.0


def test_modularity_identities(spark, sf_dir):
    rows = _q("graph_modularity_partition").spark_fn(
        spark, sf_dir
    ).collect()
    assert len(rows) >= 5
    q = rows[0]["modularity"]
    for r in rows:
        assert r["modularity"] == q
        assert -1.0 <= r["contribution"] <= 1.0
    # sum of contributions equals total modularity (within rounding)
    assert abs(sum(r["contribution"] for r in rows) - q) < 1e-3 * len(rows)
    # degree sums count each edge endpoint once: sum d_c = 2m
    total_deg = sum(r["degree_sum"] for r in rows)
    assert total_deg % 2 == 0
    assert sum(r["intra_edges"] for r in rows) <= total_deg // 2
    assert -1.0 <= q <= 1.0


def test_ucb1_forced_init_and_play_accounting(spark, sf_dir):
    rows = sorted(
        _q("ucb1_arm_allocation_replay").spark_fn(spark, sf_dir).collect(),
        key=lambda r: r["t"],
    )
    assert [r["t"] for r in rows] == list(range(1, len(rows) + 1))
    assert rows[0]["chosen_arm"] == 0 and rows[1]["chosen_arm"] == 1
    for r in rows[2:]:
        assert r["chosen_arm"] in (0, 1)
        assert r["idx_arm0"] is not None and r["idx_arm1"] is not None
        # play counts accumulate to t
        assert r["plays_arm0"] + r["plays_arm1"] == r["t"]
        # the chosen arm had the (weakly) higher snapped index
        if r["chosen_arm"] == 0:
            assert r["idx_arm0"] >= r["idx_arm1"] - 1e-4
        else:
            assert r["idx_arm1"] > r["idx_arm0"] - 1e-4


def test_pps_hits_sum_to_k(spark, sf_dir):
    (r,) = _q("pps_systematic_sample").spark_fn(spark, sf_dir).collect()
    # every sampling point lands in exactly one doc interval
    assert r["n_hits_total"] == r["k_points"] == 50
    assert 0 < r["n_selected"] <= 50
    assert r["total_tokens"] > 0
    # Hansen-Hurwitz over a size-proportional design is close when
    # tokens correlate with chars: generous 25% guard
    assert r["rel_error"] < 0.25


def test_seq_pattern_full_matrix_and_bounds(spark, sf_dir):
    rows = _q("seq_pattern_support").spark_fn(spark, sf_dir).collect()
    # at sf>=0.001 every ordered type pair has support (dense events)
    assert len(rows) == 25
    for r in rows:
        assert 0 < r["n_users_support"]
        assert 0.0 < r["support_share"] <= 1.0


def test_dbscan_partition_of_points(spark, sf_dir):
    (r,) = _q("dbscan_core_points").spark_fn(spark, sf_dir).collect()
    assert r["n_core"] + r["n_border"] + r["n_noise"] == r["n_points"]
    assert r["n_core"] >= 0 and r["n_border"] >= 0 and r["n_noise"] >= 0
    if r["n_core"] > 0:
        assert r["max_neighbors"] >= 4


def test_rake_phrases_scores(spark, sf_dir):
    rows = _q("rake_keyword_extraction").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 15
    scores = [r["rake_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    stops = {"the", "a", "of", "and", "to", "in", "is"}
    for r in rows:
        words = r["phrase"].split(" ")
        assert 1 <= len(words) <= 4
        assert len(words) == r["n_words"]
        assert not (set(words) & stops)
        # word score deg/freq is at most the max phrase length, so a
        # phrase of n words scores at most 4n
        assert 0 < r["rake_score"] <= 4.0 * r["n_words"]


def test_g2_nonneg_sorted_min_count(spark, sf_dir):
    rows = _q("dunning_g2_collocations").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 20
    g2s = [r["g2"] for r in rows]
    assert g2s == sorted(g2s, reverse=True)
    for r in rows:
        assert r["n_bigram"] >= 5
        # top-20 collocations carry real signal
        assert r["g2"] > 0


def test_markov_entropy_identities(spark, sf_dir):
    rows = _q("markov_entropy_rate").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 5
    rate = rows[0]["entropy_rate_bits"]
    pis = [r["stationary_pi"] for r in rows]
    assert abs(sum(pis) - 1.0) < 1e-2
    k = len(rows)
    for r in rows:
        assert r["entropy_rate_bits"] == rate
        # row entropy over k symbols is bounded by log2(k)
        assert 0.0 <= r["row_entropy_bits"] <= math.log2(k) + 1e-6
    # the rate is a pi-weighted mean of row entropies
    lo = min(r["row_entropy_bits"] for r in rows)
    hi = max(r["row_entropy_bits"] for r in rows)
    assert lo - 1e-3 <= rate <= hi + 1e-3


def test_fano_summary_bounds(spark, sf_dir):
    (r,) = _q("fano_burstiness_users").spark_fn(spark, sf_dir).collect()
    assert r["n_users"] > 0
    assert r["n_days"] >= 10
    assert 0 <= r["n_bursty"] <= r["n_users"]
    assert 0.0 <= r["bursty_share"] <= 1.0
    assert r["mean_fano"] > 0.0


def test_anova_f_consistent_with_eta_squared(spark, sf_dir):
    rows = _q("anova_oneway_f").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 5
    f = rows[0]["f_stat"]
    eta2 = rows[0]["eta_squared"]
    n = sum(r["n_orders"] for r in rows)
    for r in rows:
        assert r["f_stat"] == f and r["eta_squared"] == eta2
        assert r["mean_value"] > 0
    assert 0.0 <= eta2 < 1.0
    # F and eta^2 are two forms of the same ratio:
    # F = (eta2/(k-1)) / ((1-eta2)/(N-k))
    k = 5
    f_from_eta = (eta2 / (k - 1)) / ((1 - eta2) / (n - k))
    assert abs(f - f_from_eta) < max(0.01, 0.01 * abs(f))


def test_kruskal_wallis_rank_identities(spark, sf_dir):
    rows = _q("kruskal_wallis_length_by_lang").spark_fn(
        spark, sf_dir
    ).collect()
    assert len(rows) == 5
    n = sum(r["n_docs"] for r in rows)
    # weighted mean of group mean-ranks is the global mean rank (N+1)/2
    wsum = sum(r["mean_rank"] * r["n_docs"] for r in rows)
    assert abs(wsum / n - (n + 1) / 2.0) < 0.01
    h = rows[0]["h_stat"]
    assert rows[0]["h_adjusted"] >= h - 1e-9  # ties only inflate H
    assert h >= 0.0
    assert rows[0]["df"] == 4


def test_spearman_in_range_and_matches_kendall_sign(spark, sf_dir):
    (s,) = _q("spearman_corr_daily").spark_fn(spark, sf_dir).collect()
    (k,) = _q("kendall_tau_daily").spark_fn(spark, sf_dir).collect()
    assert -1.0 <= s["rho_spearman"] <= 1.0
    assert -1.0 <= k["tau_b"] <= 1.0
    assert s["n_days"] == k["n_days"] >= 10
    assert k["n_pairs"] == k["n_days"] * (k["n_days"] - 1) // 2
    assert k["concordant"] + k["discordant"] <= k["n_pairs"]
    # both measure the same monotone association; when either is
    # decisive they must agree in sign
    if abs(s["rho_spearman"]) > 0.1 and abs(k["tau_b"]) > 0.05:
        assert (s["rho_spearman"] > 0) == (k["tau_b"] > 0)


def test_brown_forsythe_median_bounds(spark, sf_dir):
    rows = _q("brown_forsythe_length_by_source").spark_fn(
        spark, sf_dir
    ).collect()
    assert len(rows) == 20
    w = rows[0]["w_stat"]
    for r in rows:
        assert r["w_stat"] == w
        assert r["n_docs"] > 0
        # mean |dev from median| is positive and below the length range
        assert 0.0 < r["mean_absdev"] < r["median_chars"] * 20
        assert 40 <= r["median_chars"] <= 600
    assert w >= 0.0


def test_yule_k_identities(spark, sf_dir):
    rows = _q("yule_k_vocab_richness").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 < r["n_types"] <= r["n_tokens"]
        assert r["yule_k"] >= 0.0
        # Simpson's D is a probability; TTR in (0, 1]
        assert 0.0 <= r["simpson_d"] <= 1.0
        assert 0.0 < r["ttr"] <= 1.0
        # K and D estimate the same repeat rate: K ~ 1e4 * D for
        # large N (exact identity is K = 1e4*(sum c^2 - N)/N^2)
        assert abs(r["yule_k"] / 10000.0 - r["simpson_d"]) < 0.01


def test_msttr_bounds(spark, sf_dir):
    rows = _q("msttr_lexical_diversity").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_segments"] > 0
        # segment TTR is (distinct of 25)/25, in [1/25, 1]
        assert 1.0 / 25 <= r["min_seg_ttr"] <= r["msttr"] <= r[
            "max_seg_ttr"
        ] <= 1.0


def test_burrows_delta_pairs(spark, sf_dir):
    rows = _q("burrows_delta_sources").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 10
    deltas = [r["delta"] for r in rows]
    assert deltas == sorted(deltas)  # closest pairs first
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert r["delta"] >= 0.0


def test_textrank_scores_form(spark, sf_dir):
    rows = _q("textrank_keywords").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 15
    scores = [r["textrank_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # damped PR scores sit above the (1-d) floor
        assert r["textrank_score"] >= 0.15 - 1e-9
        assert 1 <= r["n_neighbors"] <= r["w_degree"]


def test_assortativity_in_range(spark, sf_dir):
    (r,) = _q("graph_degree_assortativity").spark_fn(
        spark, sf_dir
    ).collect()
    assert -1.0 <= r["assortativity_r"] <= 1.0
    assert r["n_nodes"] > 0 and r["n_edges"] > 0
    # handshake lemma: mean degree = 2E/V
    assert abs(r["mean_degree"] - 2.0 * r["n_edges"] / r["n_nodes"]) < 0.01
    assert r["max_degree"] < r["n_nodes"]


def test_page_hinkley_monotone_min(spark, sf_dir):
    rows = sorted(
        _q("page_hinkley_drift_daily").spark_fn(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert len(rows) == 30
    for r in rows:
        assert r["ph_gap"] >= -1e-9  # gap = m - running min >= 0
        assert r["drift_alarm"] == (r["ph_gap"] > 2.0) or abs(
            r["ph_gap"] - 2.0
        ) < 1e-3


def test_theil_decomposition_identity(spark, sf_dir):
    rows = _q("theil_index_sources").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 20
    r0 = rows[0]
    # T = T_between + T_within holds to the snapping grid
    assert abs(
        r0["theil_total"] - (r0["theil_between"] + r0["theil_within"])
    ) < 1e-3
    assert r0["theil_total"] >= 0.0
    assert r0["theil_between"] >= -1e-9
    for r in rows:
        assert r["theil_within_s"] >= 0.0  # per-source Theil >= 0


def test_hurst_form(spark, sf_dir):
    rows = {
        r["n_window"]: r
        for r in _q("hurst_exponent_rs").spark_fn(spark, sf_dir).collect()
    }
    assert set(rows) == {5, 10, 15}
    assert rows[5]["n_blocks"] == 6
    assert rows[10]["n_blocks"] == 3
    assert rows[15]["n_blocks"] == 2
    h = rows[5]["hurst_h"]
    for r in rows.values():
        assert r["hurst_h"] == h
        assert r["mean_rs"] > 0
        # R/S grows with window size
    assert rows[5]["mean_rs"] <= rows[15]["mean_rs"] + 1e-9
    # H plausible range for a real series (0 < H < 1 with slack)
    assert -0.2 < h < 1.2


def test_simpson_slopes_exact_sign_logic(spark, sf_dir):
    rows = _q("simpson_paradox_audit").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 5
    pooled = rows[0]["pooled_slope_per_day"]
    for r in rows:
        assert r["pooled_slope_per_day"] == pooled
        # the flag must agree with the displayed slope signs except
        # within rounding distance of zero
        if abs(r["slope_per_day"]) > 1e-5 and abs(pooled) > 1e-5:
            assert r["sign_reversed"] == (
                (r["slope_per_day"] > 0) != (pooled > 0)
            )


def test_gumbel_return_levels_monotone(spark, sf_dir):
    rows = {
        r["p"]: r
        for r in _q("gumbel_block_maxima_evt").spark_fn(
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {0.90, 0.95, 0.99}
    # higher p -> higher return level, fewer exceedances
    assert (
        rows[0.90]["return_level"]
        < rows[0.95]["return_level"]
        < rows[0.99]["return_level"]
    )
    assert rows[0.90]["n_exceed"] >= rows[0.95]["n_exceed"] >= rows[
        0.99
    ]["n_exceed"]
    r = rows[0.95]
    assert r["gumbel_beta"] > 0
    assert r["gumbel_mu"] < r["mean_max"]  # mu = mean - gamma*beta
    assert r["n_exceed"] <= r["n_days"]


def test_rm3_weights_form(spark, sf_dir):
    rows = _q("rm3_expansion_terms").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 15
    ws = [r["rm3_weight"] for r in rows]
    assert ws == sorted(ws, reverse=True)
    for r in rows:
        assert 0.0 <= r["p_feedback"] <= 1.0
        if r["is_query_term"]:
            # query terms get the lambda/3 floor
            assert r["rm3_weight"] >= 0.5 / 3 - 1e-6
        else:
            # pure feedback terms are bounded by (1-lambda)
            assert r["rm3_weight"] <= 0.5 + 1e-9
    assert any(r["is_query_term"] for r in rows)
    assert any(not r["is_query_term"] for r in rows)


def test_good_turing_identities(spark, sf_dir):
    rows = _q("good_turing_unseen_mass").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["n_singletons"] <= r["n_types"]
        assert 0.0 <= r["unseen_mass_gt"] <= 1.0
        # Chao1 is a lower-bound richness >= observed types
        assert r["chao1_richness"] >= r["n_types"] - 1e-9
        assert 0.0 < r["coverage_share"] <= 1.0
        assert abs(
            r["unseen_mass_gt"] - r["n_singletons"] / r["n_tokens"]
        ) < 1e-5


def test_durbin_watson_range(spark, sf_dir):
    (r,) = _q("durbin_watson_autocorr").spark_fn(spark, sf_dir).collect()
    assert r["n_days"] == 30
    assert 0.0 <= r["dw_stat"] <= 4.0
    v = r["verdict"]
    if r["dw_stat"] < 1.5:
        assert v == "positive_autocorr"
    elif r["dw_stat"] > 2.5:
        assert v == "negative_autocorr"
    else:
        assert v == "independent"


def test_jarque_bera_moment_bounds(spark, sf_dir):
    (r,) = _q("jarque_bera_normality").spark_fn(spark, sf_dir).collect()
    assert r["n_days"] == 30
    # standardized kurtosis is >= 1 + skew^2 (moment inequality)
    assert r["kurtosis"] >= 1 + r["skewness"] ** 2 - 0.01
    assert r["jb_stat"] >= 0.0
    jb = r["n_days"] / 6.0 * (
        r["skewness"] ** 2 + (r["kurtosis"] - 3) ** 2 / 4
    )
    assert abs(jb - r["jb_stat"]) < 0.01


def test_breusch_pagan_r2_range(spark, sf_dir):
    (r,) = _q("breusch_pagan_heteroskedasticity").spark_fn(
        spark, sf_dir
    ).collect()
    assert 0.0 <= r["aux_r2"] <= 1.0
    assert abs(r["bp_stat"] - r["n_days"] * r["aux_r2"]) < 0.01
    assert r["heteroskedastic"] == (r["bp_stat"] > 3.8415) or abs(
        r["bp_stat"] - 3.8415
    ) < 0.01


def test_cooks_distance_sorted_leverage_bounds(spark, sf_dir):
    rows = _q("cooks_distance_daily").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 10
    ds = [r["cooks_d"] for r in rows]
    assert ds == sorted(ds, reverse=True)
    for r in rows:
        # simple-regression leverage bounds: 1/n <= h <= 1
        assert 1.0 / 30 - 1e-9 <= r["leverage"] <= 1.0
        assert r["cooks_d"] >= 0.0
        assert r["influential"] == (r["cooks_d"] > 4.0 / 30) or abs(
            r["cooks_d"] - 4.0 / 30
        ) < 1e-4


def test_cohens_d_ci_and_magnitude(spark, sf_dir):
    (r,) = _q("cohens_d_effect_size").spark_fn(spark, sf_dir).collect()
    assert r["na"] > 1 and r["nb"] > 1
    assert r["d_ci_low"] <= r["cohens_d"] <= r["d_ci_high"]
    # Hedges' g shrinks toward zero and preserves sign
    assert abs(r["hedges_g"]) <= abs(r["cohens_d"]) + 1e-9
    assert (r["hedges_g"] >= 0) == (r["cohens_d"] >= 0)
    m = abs(r["cohens_d"])
    expect = (
        "negligible" if m < 0.2 else
        "small" if m < 0.5 else
        "medium" if m < 0.8 else "large"
    )
    assert r["magnitude"] == expect


def test_power_mde_monotonicity(spark, sf_dir):
    rows = {
        r["power"]: r
        for r in _q("power_analysis_mde").spark_fn(spark, sf_dir).collect()
    }
    assert set(rows) == {0.80, 0.90}
    # more power -> larger MDE at fixed n, larger n at fixed effect
    assert rows[0.90]["mde_dollars"] > rows[0.80]["mde_dollars"] > 0
    assert (
        rows[0.90]["n_per_arm_for_1dollar"]
        > rows[0.80]["n_per_arm_for_1dollar"]
        > 0
    )
    assert rows[0.80]["pooled_sd"] > 0


def test_cramers_v_bounds(spark, sf_dir):
    (r,) = _q("cramers_v_lang_source").spark_fn(spark, sf_dir).collect()
    assert r["n_langs"] == 5 and r["n_sources"] == 20
    assert 0.0 <= r["cramers_v"] <= 1.0
    assert 0.0 <= r["cramers_v_corrected"] <= 1.0
    # bias correction shrinks V
    assert r["cramers_v_corrected"] <= r["cramers_v"] + 1e-9
    assert r["chi2_stat"] >= 0.0


def test_anderson_darling_form(spark, sf_dir):
    (r,) = _q("anderson_darling_two_sample").spark_fn(
        spark, sf_dir
    ).collect()
    assert r["n_en"] + r["n_rest"] == r["n_total"]
    assert r["a2_stat"] >= 0.0
    # A2 has mean k-1=1 under H0; any real value stays far below N
    assert r["a2_stat"] < r["n_total"]
    assert r["reject_same_dist"] == (r["a2_stat"] > 2.492) or abs(
        r["a2_stat"] - 2.492
    ) < 1e-3


def test_spatial_knn_sorted_within_query(spark, sf_dir):
    rows = _q("spatial_knn_blocked").spark_fn(spark, sf_dir).collect()
    assert rows
    byq = {}
    for r in rows:
        byq.setdefault(r["q_vec"], []).append(r)
    assert len(byq) <= 16
    for q, rs in byq.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        ds = [r["dist_km"] for r in rs]
        assert ds == sorted(ds)
        for r in rs:
            assert r["n_vec"] != q
            # 3x3 of 2-degree cells bounds the reach well under 700 km
            assert 0.0 <= r["dist_km"] < 700.0


def test_best_of_n_monotone(spark, sf_dir):
    rows = {
        r["n_pick"]: r
        for r in _q("best_of_n_expected_score").spark_fn(
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {1, 2, 4, 8}
    # E[max of k] is nondecreasing in k; k=1 is the plain mean
    assert (
        rows[1]["expected_best_score"]
        <= rows[2]["expected_best_score"]
        <= rows[4]["expected_best_score"]
        <= rows[8]["expected_best_score"]
    )
    for r in rows.values():
        assert 0.0 <= r["expected_best_score"] <= 100.0


def test_pareto_frontier_is_nondominated(spark, sf_dir):
    rows = _q("pareto_frontier_quality").spark_fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    # no emitted row may be STRICTLY dominated (longer AND more
    # diverse) by another emitted row; equal lengths never dominate
    for a in rows:
        for b in rows:
            assert not (
                b["n_chars"] > a["n_chars"] and b["ttr"] > a["ttr"] + 1e-9
            ), (a, b)


def test_ipf_margins_converge_toward_uniform(spark, sf_dir):
    rows = _q("ipf_raking_weights").spark_fn(spark, sf_dir).collect()
    # observed cells only (empty lang x source cells stay zero in IPF)
    assert 90 <= len(rows) <= 100
    for r in rows:
        assert r["rake_weight"] > 0.0
        # after the column pass, lang margins are NEAR 1/5 (raking
        # converges, one row+col pass gets close but not exact)
        assert abs(r["lang_share_after"] - 0.2) < 0.05


def test_qte_quantiles_ordered(spark, sf_dir):
    rows = {
        r["percentile"]: r
        for r in _q("quantile_treatment_effect").spark_fn(
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {25, 50, 75}
    for v in ("q_variant0", "q_variant1"):
        assert rows[25][v] <= rows[50][v] <= rows[75][v]
    for r in rows.values():
        assert abs(
            r["qte_dollars"] - (r["q_variant1"] - r["q_variant0"])
        ) < 0.011


def test_mantel_haenszel_pooled_or_bounded_by_strata(spark, sf_dir):
    rows = _q("mantel_haenszel_or").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 5
    mh = rows[0]["mh_or"]
    ors = [r["stratum_or"] for r in rows if r["stratum_or"] is not None]
    assert ors, "every stratum degenerate?"
    # the MH pooled OR is a weighted combination: within strata range
    assert min(ors) - 1e-9 <= mh <= max(ors) + 1e-9
    for r in rows:
        assert r["a"] + r["b"] + r["c"] + r["d"] > 0
        assert r["mh_or"] == mh


def test_mcc_consistency(spark, sf_dir):
    (r,) = _q("mcc_en_detector").spark_fn(spark, sf_dir).collect()
    n = r["tp"] + r["fp"] + r["fn"] + r["tn"]
    assert n > 0
    assert -1.0 <= r["mcc"] <= 1.0
    assert 0.0 <= r["f1"] <= 1.0
    assert 0.0 <= r["balanced_accuracy"] <= 1.0
    assert abs(r["prevalence"] - (r["tp"] + r["fn"]) / n) < 1e-5
    # non-degenerate detector on this corpus
    assert (r["tp"] + r["fp"]) > 0 and (r["fn"] + r["tn"]) > 0


def test_pettitt_u_is_max_and_p_valid(spark, sf_dir):
    (r,) = _q("pettitt_changepoint").spark_fn(spark, sf_dir).collect()
    assert r["n_days"] == 30
    # |U| bounded by t*(n-t) <= (n/2)^2
    assert abs(r["u_stat"]) <= 15 * 15
    assert 0.0 < r["p_approx"] <= 1.0
    assert r["significant"] == (r["p_approx"] < 0.05)


def test_granger_f_nonnegative(spark, sf_dir):
    (r,) = _q("granger_causality_daily").spark_fn(spark, sf_dir).collect()
    assert r["n_obs"] == 29
    # adding a regressor can only reduce SSE: F >= 0
    assert r["f_stat"] >= -1e-6
    assert r["granger_causes"] == (r["f_stat"] > 4.2252) or abs(
        r["f_stat"] - 4.2252
    ) < 1e-3


def test_sinkhorn_plan_properties(spark, sf_dir):
    rows = _q("sinkhorn_ot_lengths").spark_fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 15
    masses = [r["plan_mass"] for r in rows]
    assert masses == sorted(masses, reverse=True)
    mtc = rows[0]["mean_transport_cost"]
    for r in rows:
        assert r["plan_mass"] >= 0.0
        assert r["cost"] == abs(r["bucket_en"] - r["bucket_rest"])
        assert r["mean_transport_cost"] == mtc
    # entropic OT keeps mass near the diagonal: top cell is local
    assert rows[0]["cost"] <= 2
    assert 0.0 <= mtc <= 11.0


def test_tukey_hsd_pairs(spark, sf_dir):
    rows = _q("tukey_hsd_priorities").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 10  # C(5,2)
    for r in rows:
        assert r["priority_a"] < r["priority_b"]
        assert r["hsd_threshold"] > 0
        assert r["significant"] == (
            abs(r["mean_diff"]) > r["hsd_threshold"]
        ) or abs(abs(r["mean_diff"]) - r["hsd_threshold"]) < 0.01


def test_storey_qvalues_monotone_and_bounded(spark, sf_dir):
    rows = sorted(
        _q("storey_qvalue_ks_tests").spark_fn(spark, sf_dir).collect(),
        key=lambda r: r["p_rank"],
    )
    assert len(rows) == 20
    pi0 = rows[0]["pi0_hat"]
    qs = [r["q_value"] for r in rows]
    # q-values are monotone nondecreasing in p-rank and within [0,1]
    assert qs == sorted(qs)
    for r in rows:
        assert 0.0 <= r["q_value"] <= 1.0
        assert r["pi0_hat"] == pi0
        # q <= pi0 * BH-adjusted p at own rank (the pre-suffix-min cand)
        assert r["q_value"] <= min(
            1.0, pi0 * 20 * r["p_value"] / r["p_rank"]
        ) + 1e-6
        assert r["discovery"] == (r["q_value"] <= 0.05) or abs(
            r["q_value"] - 0.05
        ) < 1e-6
    assert 0.0 <= pi0  # can exceed 1 before truncation? we don't truncate


def test_cochran_q_nonneg(spark, sf_dir):
    (r,) = _q("cochran_q_filters").spark_fn(spark, sf_dir).collect()
    assert r["n_docs"] > 0
    for c in ("pass_length", "pass_diversity", "pass_stopword"):
        assert 0 <= r[c] <= r["n_docs"]
    assert r["q_stat"] >= 0.0
    assert r["significant"] == (r["q_stat"] > 5.9915) or abs(
        r["q_stat"] - 5.9915
    ) < 1e-3


def test_lift_gains_monotone(spark, sf_dir):
    rows = sorted(
        _q("lift_gains_en_detector").spark_fn(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    gains = [r["gain"] for r in rows]
    cuts = [r["cutoff_score"] for r in rows]
    ns = [r["n_cum"] for r in rows]
    assert gains == sorted(gains)  # cumulative gains nondecreasing
    assert cuts == sorted(cuts, reverse=True)  # thresholds fall
    assert ns == sorted(ns)
    assert abs(rows[-1]["gain"] - 1.0) < 1e-9  # full prefix captures all
    assert abs(rows[-1]["lift"] - 1.0) < 0.01  # full-prefix lift is 1
    for r in rows:
        assert r["lift"] >= 0.0


def test_ljung_box_cumulative(spark, sf_dir):
    rows = sorted(
        _q("ljung_box_daily").spark_fn(spark, sf_dir).collect(),
        key=lambda r: r["m_lags"],
    )
    assert [r["m_lags"] for r in rows] == list(range(1, 8))
    qs = [r["q_stat"] for r in rows]
    assert qs == sorted(qs)  # Q is cumulative in m
    for r in rows:
        assert -1.0 <= r["acf"] <= 1.0
        assert r["q_stat"] >= 0.0


def test_shannon_equitability_bounds(spark, sf_dir):
    rows = _q("shannon_equitability_sources").spark_fn(
        spark, sf_dir
    ).collect()
    assert len(rows) == 20
    import math
    for r in rows:
        assert r["entropy_nats"] >= -1e-9
        assert r["entropy_nats"] <= math.log(max(2, r["n_langs"])) + 1e-6
        if r["n_langs"] > 1:
            assert 0.0 <= r["evenness_j"] <= 1.0 + 1e-9
        else:
            assert r["evenness_j"] is None


def test_birthday_collision_identities(spark, sf_dir):
    (r,) = _q("birthday_collision_hash_audit").spark_fn(
        spark, sf_dir
    ).collect()
    assert r["n_buckets"] <= min(r["n_docs"], 65536)
    assert r["collisions"] == r["n_docs"] - r["n_buckets"]
    assert r["expected_collisions"] > 0
    # a sane md5-derived bucket key tracks the birthday expectation
    # loosely (generous band: this is a sanity audit, not a CI gate)
    assert 0.0 <= r["collision_ratio"] < 10.0
    assert r["max_load"] >= 1


# --- pure-Python identities for the embedded estimator constants -----------


def test_bon_weights_normalize_to_binomial():
    from swat_mapreduce_spark.queries.model_evals import (
        _BON_KS, _BON_N, _bon_weights,
    )

    # sum_i C(i-1, k-1) over i=1..n is C(n, k): the order-statistic
    # estimator's weights are a probability distribution over sorted
    # positions once divided by C(n, k)
    for k in _BON_KS:
        ws = _bon_weights(k)
        assert len(ws) == _BON_N
        assert sum(ws) == math.comb(_BON_N, k)
        # only positions >= k can be the max of a k-subset
        assert all(w == 0 for w in ws[: k - 1])
        assert all(ws[i] <= ws[i + 1] for i in range(k - 1, _BON_N - 1))


def test_hurst_log2_literals_match_math():
    from swat_mapreduce_spark.queries.timeseries_survival import (
        _HURST_NS, _HURST_X_U,
    )

    for n in _HURST_NS:
        assert _HURST_X_U[n] == round(math.log2(n) * 1_000_000)


def test_sinkhorn_kernel_literals():
    from swat_mapreduce_spark.queries.data_selection import (
        _SK_EPS, _SK_K, _SK_MAXD,
    )

    assert _SK_K[0] == 1.0
    for d in range(1, _SK_MAXD + 1):
        assert _SK_K[d] == math.exp(-d / _SK_EPS)
        assert _SK_K[d] < _SK_K[d - 1]  # kernel decays with distance


def test_gumbel_constants():
    from swat_mapreduce_spark.queries.stats_tests import (
        _GUM_GAMMA, _GUM_LNLN, _GUM_PS, _GUM_SQRT6_PI,
    )

    assert abs(_GUM_SQRT6_PI - math.sqrt(6.0) / math.pi) < 1e-15
    assert abs(_GUM_GAMMA - 0.5772156649015329) < 1e-15
    for p in _GUM_PS:
        assert _GUM_LNLN[p] == math.log(-math.log(p))
    # higher p -> larger (less negative -> larger) return-level shift:
    # -ln(-ln p) increases with p
    assert _GUM_LNLN[0.90] > _GUM_LNLN[0.95] > _GUM_LNLN[0.99]


def test_evenness_ln_literals():
    from swat_mapreduce_spark.queries.quality_audits import (
        _EVEN_LNK, _EVEN_MAX_K,
    )

    for k in range(2, _EVEN_MAX_K + 1):
        assert _EVEN_LNK[k] == math.log(k)
