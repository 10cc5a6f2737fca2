"""Invariant tests for DoReMi reweighting, LOSO data valuation, and
the Pareto/ABC distributed cumulative-share classification."""

from __future__ import annotations

import duckdb

from swat_mapreduce_spark.queries import load_all


def _q(name):
    return load_all()[name]


def test_doremi_weights_form_a_distribution(spark, sf_dir):
    rows = _q("doremi_domain_reweight").spark_fn(spark, sf_dir).collect()
    assert rows
    total = sum(r["weight"] for r in rows)
    assert abs(total - 1.0) < 1e-3
    for r in rows:
        assert r["excess_nll"] >= 0
        assert r["weight"] > 0
        assert r["n_bigrams"] > 0
    # multiplicative-weights monotonicity: higher excess loss -> at
    # least as much weight
    srt = sorted(rows, key=lambda r: r["excess_nll"])
    for lo, hi in zip(srt, srt[1:]):
        assert hi["weight"] >= lo["weight"] - 1e-9
    # at least one source must actually exceed the baseline, else the
    # step is vacuous (CLAUDE.md gotcha 5)
    assert any(r["excess_nll"] > 0 for r in rows)


def test_loso_identities(spark, sf_dir):
    rows = _q("loso_source_value").spark_fn(spark, sf_dir).collect()
    assert rows
    c_all = sum(r["n_bigrams"] for r in rows)
    # full-corpus NLL from the per-source partials
    t_all = sum(r["own_nll"] * r["n_bigrams"] for r in rows)
    full = t_all / c_all
    for r in rows:
        # removing a source moves the mean AWAY from that source's loss
        if r["own_nll"] > full + 1e-4:
            assert r["delta_nll"] < 0
        if r["own_nll"] < full - 1e-4:
            assert r["delta_nll"] > 0
        # loso identity: loso = (T - T_s) / (C - C_s)
        want = (t_all - r["own_nll"] * r["n_bigrams"]) / (
            c_all - r["n_bigrams"]
        )
        assert abs(r["loso_nll"] - want) < 1e-3
        assert abs(r["delta_nll"] - (r["loso_nll"] - full)) < 1e-3


def test_pareto_abc_partition(spark, sf_dir):
    rows = _q("pareto_abc_cumshare").spark_fn(spark, sf_dir).collect()
    by = {r["abc_class"]: r for r in rows}
    assert set(by) <= {"A", "B", "C"} and "A" in by
    assert abs(sum(r["revenue_share"] for r in rows) - 1.0) < 1e-4
    # class cut semantics: cumulative share of A stops at 0.80, A+B at
    # 0.95 (the first part crossing a boundary belongs to the next
    # class, so class totals sit at or below the cut)
    assert by["A"]["revenue_share"] <= 0.80 + 1e-6
    if "B" in by:
        assert (
            by["A"]["revenue_share"] + by["B"]["revenue_share"]
            <= 0.95 + 1e-6
        )
    con = duckdb.connect()
    (n_parts,) = con.execute(
        f"SELECT count(DISTINCT l_partkey) FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()
    assert sum(r["n_parts"] for r in rows) == n_parts
    # revenue concentration: per-part average revenue must decrease
    # from A to C (the classes are revenue-ordered by construction)
    avg = {
        k: r["class_revenue"] / r["n_parts"] for k, r in by.items()
    }
    if "B" in by:
        assert avg["A"] >= avg["B"] - 1e-9
    if "C" in by and "B" in by:
        assert avg["B"] >= avg["C"] - 1e-9


def test_kneser_ney_matches_pure_python_for_sample_docs(spark, sf_dir):
    import math
    from collections import Counter

    rows = {
        r["doc_id"]: r
        for r in _q("kneser_ney_bigram_nll").spark_fn(spark, sf_dir).collect()
    }
    assert rows
    con = duckdb.connect()
    texts = con.execute(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    big = Counter()
    for _, t in texts:
        toks = t.split()
        big.update(zip(toks, toks[1:]))
    cp = Counter()
    n1_prev = Counter()
    n1_w = Counter()
    for (p, w), c in big.items():
        cp[p] += c
        n1_prev[p] += 1
        n1_w[w] += 1
    n1 = len(big)
    D = 0.75
    for doc_id, t in texts[:5]:
        toks = t.split()
        if len(toks) < 2:
            continue
        lps = []
        for p, w in zip(toks, toks[1:]):
            prob = max(big[(p, w)] - D, 0) / cp[p] + (
                D * n1_prev[p] / cp[p]
            ) * (n1_w[w] * 1.0 / n1)
            # engine snaps each ln to 8dp before the decimal sum
            lps.append(round(math.log(prob) * 1e8) / 1e8)
        want = round(-sum(lps) / len(lps) * 1e4) / 1e4
        assert abs(rows[doc_id]["avg_nll"] - want) < 1e-6
    # KN is a proper distribution: over SEEN continuations of any
    # context the mass must not exceed 1
    p0 = next(iter(cp))
    mass = sum(
        max(big[(p0, w)] - D, 0) / cp[p0]
        + (D * n1_prev[p0] / cp[p0]) * (n1_w[w] / n1)
        for (p, w) in big
        if p == p0
    )
    assert mass <= 1.0 + 1e-9


def test_greedy_decode_walks_the_argmax_chain(spark, sf_dir):
    from collections import Counter

    rows = sorted(
        _q("wordlm_greedy_decode").spark_fn(spark, sf_dir).collect(),
        key=lambda r: r["step"],
    )
    assert rows and rows[0]["step"] == 0
    assert [r["step"] for r in rows] == list(range(len(rows)))
    con = duckdb.connect()
    texts = [
        t
        for (t,) in con.execute(
            f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    ]
    uni = Counter()
    big = Counter()
    for t in texts:
        toks = t.split()
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    seed = min(uni, key=lambda w: (-uni[w], w))
    assert rows[0]["tok"] == seed
    nxt = {}
    for (p, w), c in big.items():
        cur = nxt.get(p)
        if cur is None or (-c, w) < cur[0]:
            nxt[p] = ((-c, w), w)
    for a, b in zip(rows, rows[1:]):
        assert nxt[a["tok"]][1] == b["tok"]


def test_basket_rules_lift_symmetry_and_order(spark, sf_dir):
    rows = _q("market_basket_rules").spark_fn(spark, sf_dir).collect()
    assert rows
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    by_pair = {}
    for r in rows:
        assert r["support_ab"] >= 2
        assert 0.0 < r["confidence"] <= 1.0
        assert r["lift"] > 0
        by_pair.setdefault(frozenset((r["ante"], r["cons"])), []).append(r)
    # lift is symmetric in (A, B): when both rule directions survive
    # the top-20 cut they must carry the same lift
    for pair, rs in by_pair.items():
        if len(rs) == 2:
            assert abs(rs[0]["lift"] - rs[1]["lift"]) < 1e-9


def test_markov_accuracy_beats_uniform(spark, sf_dir):
    rows = _q("markov_next_event_accuracy").spark_fn(spark, sf_dir).collect()
    assert rows
    n_types = len(rows)
    for r in rows:
        assert 0 < r["n_correct"] <= r["n_total"]
        assert abs(r["accuracy"] - round(r["n_correct"] / r["n_total"], 4)) < 1e-9
    # argmax prediction can never do worse than uniform guessing
    # in-sample, aggregated over the from_type
    total = sum(r["n_total"] for r in rows)
    correct = sum(r["n_correct"] for r in rows)
    assert correct / total >= 1.0 / n_types - 1e-9


def test_churn_features_are_point_in_time_correct(spark, sf_dir):
    rows = _q("churn_feature_table").spark_fn(spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    orders = con.execute(
        f"SELECT o_custkey, o_orderdate::DATE FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    ).fetchall()
    import datetime

    mx = max(d for _, d in orders)
    cutoff = mx - datetime.timedelta(days=180)
    pre = {}
    post = set()
    for k, d in orders:
        if d <= cutoff:
            lo, hi, n = pre.get(k, (d, d, 0))
            pre[k] = (min(lo, d), max(hi, d), n + 1)
        else:
            post.add(k)
    assert len(rows) == len(pre)
    for r in rows:
        lo, hi, n = pre[r["custkey"]]
        assert r["frequency"] == n
        assert r["recency_days"] == (cutoff - hi).days >= 0
        assert r["tenure_days"] == (cutoff - lo).days
        assert r["churned"] == (r["custkey"] not in post)
        assert r["monetary"] > 0


def test_cusum_changepoint_matches_numpy(spark, sf_dir):
    row = _q("cusum_changepoint_daily").spark_fn(spark, sf_dir).collect()[0]
    con = duckdb.connect()
    daily = con.execute(
        f"SELECT o_orderdate::DATE AS d, round(sum(o_totalprice), 2) "
        f"FROM read_parquet('{sf_dir}/orders.parquet') "
        f"GROUP BY 1 ORDER BY 1"
    ).fetchall()
    assert row["n_days"] == len(daily)
    mu = round(sum(v for _, v in daily) / len(daily), 6)
    s, best = 0.0, None
    for d, v in daily:
        s += v - mu
        if best is None or abs(s) > best[0] + 1e-6:
            best = (abs(s), d)
    # float recompute tolerates ~1e-2 of double drift on 1e7 sums
    assert abs(row["cusum_abs"] - best[0]) < 1.0
    assert row["changepoint_day"] == best[1]
    assert abs(row["mean_daily"] - round(mu, 2)) < 0.02


def test_negative_samples_never_cooccur(spark, sf_dir):
    rows = _q("negative_sampling_pairs").spark_fn(spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    cooc = set(
        con.execute(
            f"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey
                FROM read_parquet('{sf_dir}/lineitem.parquet'))
                SELECT a.l_partkey, b.l_partkey FROM items a JOIN items b
                ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey <> b.l_partkey"""
        ).fetchall()
    )
    anchors = set()
    for r in rows:
        assert r["cand"] != r["anchor"]
        assert (r["anchor"], r["cand"]) not in cooc
        assert 0 <= r["j"] < 5
        anchors.add(r["anchor"])
    # the anti-join must drop SOMETHING (co-occurrence is non-vacuous)
    # but not everything; at sf0.001 the 200-part catalog is dense
    # enough that ~40% of hash candidates genuinely co-occur, so the
    # bound is structural, not a rate
    assert len(anchors) <= len(rows) < 5 * len(anchors)


def test_target_encode_loo_excludes_own_label(spark, sf_dir):
    rows = _q("target_encode_loo").spark_fn(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for r in rows:
        agg[r["source"]][0] += r["y"]
        agg[r["source"]][1] += 1
    for r in rows:
        s, n = agg[r["source"]]
        if n > 1:
            assert abs(r["te_loo"] - round((s - r["y"]) / (n - 1), 4)) < 1e-9
        else:
            assert r["te_loo"] is None
        assert abs(r["te_naive"] - round(s / n, 4)) < 1e-9
    # LOO must differ from naive whenever the category is not
    # label-pure — the leakage the encoder exists to remove
    assert any(
        r["te_loo"] is not None and abs(r["te_loo"] - r["te_naive"]) > 1e-9
        for r in rows
    )


def test_ipw_estimates_are_unbiased_scale(spark, sf_dir):
    rows = _q("ipw_sample_estimate").spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_sampled"] <= r["true_docs"]
        # Horvitz-Thompson with rates >= 0.25 and hundreds of docs:
        # relative error stays well inside 35%
        assert r["doc_rel_err"] < 0.35
        assert r["est_docs"] > 0 and r["est_chars"] > 0


def test_quantile_normalization_is_monotone_per_source(spark, sf_dir):
    rows = _q("quantile_normalize_sources").spark_fn(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    per = defaultdict(list)
    n_by_source = defaultdict(int)
    for r in rows:
        assert 0 <= r["decile"] <= 9
        per[r["source"]].append((r["decile"], r["mean_raw"], r["norm_value"]))
        n_by_source[r["source"]] += r["n_docs"]
    # every source maps onto the SAME pooled reference values
    ref = {}
    for src, items in per.items():
        for d, _, nv in items:
            assert ref.setdefault(d, nv) == nv
        items.sort()
        raws = [m for _, m, _ in items]
        norms = [v for _, _, v in items]
        assert raws == sorted(raws)
        assert norms == sorted(norms)
    # doc counts per source survive the mapping
    counts = set(n_by_source.values())
    assert min(counts) > 0


def test_listagg_is_sorted_and_deduped(spark, sf_dir):
    rows = _q("listagg_order_status").spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        sts = r["statuses"].split(",")
        yrs = r["years_active"].split(",")
        assert sts == sorted(set(sts))
        assert yrs == sorted(set(yrs))
        assert r["n_orders"] > 0


def test_langid_confusion_diagonal_dominates(spark, sf_dir):
    rows = _q("langid_confusion_matrix").spark_fn(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    shares = defaultdict(float)
    for r in rows:
        assert 0.0 < r["row_share"] <= 1.0
        assert r["n"] <= r["n_true"]
        shares[r["lang"]] += r["row_share"]
        if r["is_diagonal"]:
            # the marker heuristic must be right most of the time per
            # language — this is what text_langid's is_match pins
            # per-doc; here it's the aggregated eval view
            assert r["row_share"] > 0.5
    for lang, tot in shares.items():
        assert abs(tot - 1.0) < 2e-3  # row shares partition each lang


def test_ltv_curve_is_monotone_per_cohort(spark, sf_dir):
    rows = _q("ltv_cohort_curve").spark_fn(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        assert 0 <= r["age"] <= 12
        assert r["cohort_size"] > 0
        per[r["cohort"]].append((r["age"], r["cum_revenue"], r["ltv_per_customer"]))
    for cohort, items in per.items():
        items.sort()
        cums = [c for _, c, _ in items]
        assert cums == sorted(cums)  # cumulative revenue is monotone
        for age, c, ltv in items:
            sz = next(
                r["cohort_size"] for r in rows if r["cohort"] == cohort
            )
            assert abs(ltv - round(c / sz, 2)) < 0.02


def test_sliding_bitmap_matches_bruteforce(spark, sf_dir):
    rows = {
        r["day"]: r["n_users_7d"]
        for r in _q("sliding_distinct_users_bitmap")
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert rows
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT ts::DATE, user_id FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    import datetime
    from collections import defaultdict

    by_day = defaultdict(set)
    for d, u in ev:
        by_day[d].add(u)
    mn, mx = min(by_day), max(by_day)
    for day, got in rows.items():
        users = set()
        for k in range(7):
            users |= by_day.get(day - datetime.timedelta(days=k), set())
        assert got == len(users)
        assert day >= mn + datetime.timedelta(days=6)
    # every full-window day present
    want_days = {
        mn + datetime.timedelta(days=i)
        for i in range(6, (mx - mn).days + 1)
    }
    assert set(rows) == want_days


def test_seasonal_outliers_are_the_max_residuals(spark, sf_dir):
    rows = _q("seasonal_residual_outliers").spark_fn(spark, sf_dir).collect()
    assert len(rows) == 5
    resids = [abs(r["residual"]) for r in rows]
    assert resids == sorted(resids, reverse=True)
    assert len({r["day"] for r in rows}) == 5
    for r in rows:
        assert 1 <= r["dow"] <= 7
        assert r["revenue"] > 0


def test_containment_catches_asymmetric_overlap(spark, sf_dir):
    rows = _q("dedup_containment_pairs").spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0 < r["n_common"] <= min(r["size_a"], r["size_b"])
        assert max(r["contain_a_in_b"], r["contain_b_in_a"]) >= 0.8 - 1e-9
        assert abs(r["contain_a_in_b"] - round(r["n_common"] / r["size_a"], 4)) < 1e-9


def test_winnowing_guarantee_and_density(spark, sf_dir):
    rows = (
        _q("winnowing_fingerprints")
        .spark_fn(spark, sf_dir)
        .limit(300)
        .collect()
    )
    assert rows
    import hashlib

    con = duckdb.connect()
    texts = dict(
        con.execute(
            f"SELECT doc_id, text FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    )
    for r in rows[:30]:
        toks = texts[r["doc_id"]].split()
        hs = [
            int(
                hashlib.md5(" ".join(toks[i : i + 3]).encode())
                .hexdigest()[:8],
                16,
            )
            for i in range(len(toks) - 2)
        ]
        fps = {min(hs[i : i + 4]) for i in range(len(hs) - 3)}
        assert r["n_kgrams"] == len(hs)
        assert r["n_fingerprints"] == len(fps)
        x = 0
        for f in fps:
            x ^= f
        assert r["fp_xor"] == x
        # winnowing density ~ 2/(w+1); generous band
        assert 0.1 <= r["density"] <= 0.9


def test_rbo_matches_pure_python(spark, sf_dir):
    row = _q("ranking_rbo_similarity").spark_fn(spark, sf_dir).collect()[0]
    assert row["overlap_at_30"] > 0, "vacuous RBO (gotcha 5)"
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    import math

    vecs = {i: [float(x) for x in v] for i, v in emb}
    q = vecs[0]

    def rank(dim):
        def cos(v):
            d = sum(a * b for a, b in zip(v[:dim], q[:dim]))
            na = math.sqrt(sum(a * a for a in v[:dim]))
            nb = math.sqrt(sum(b * b for b in q[:dim]))
            return round(d / (na * nb) * 1e4) / 1e4

        scored = sorted(
            ((cos(v), -i) for i, v in vecs.items() if i != 0),
            reverse=True,
        )
        return [-mi for _, mi in scored[:30]]

    a, b = rank(64), rank(16)
    pos_a = {x: i + 1 for i, x in enumerate(a)}
    pos_b = {x: i + 1 for i, x in enumerate(b)}
    common = {x: max(pos_a[x], pos_b[x]) for x in set(a) & set(b)}
    assert row["overlap_at_30"] == len(common)
    assert row["overlap_at_10"] == sum(1 for m in common.values() if m <= 10)
    rbo = sum(
        sum(
            round(1.0 / (d * (1 << d)) * 1e12) / 1e12
            for d in range(m, 31)
        )
        for m in common.values()
    )
    assert abs(row["rbo"] - round(rbo * 1e6) / 1e6) < 1e-9


def test_pca_top_component_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = sorted(
        _q("pca_power_iteration").spark_fn(spark, sf_dir).collect(),
        key=lambda r: r["dim"],
    )
    assert len(rows) == 64
    v = np.array([r["loading"] for r in rows])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3
    con = duckdb.connect()
    X = np.vstack(
        [
            np.array(e, dtype=np.float64)
            for (e,) in con.execute(
                f"SELECT embedding FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet')"
            ).fetchall()
        ]
    )
    Xc = X - X.mean(axis=0)
    # reference: the same 2 power-iteration steps in clean float64
    ref = np.full(64, 0.125)
    for _ in range(2):
        y = Xc.T @ (Xc @ ref)
        nrm = np.linalg.norm(y)
        ref = y / nrm
    # direction agreement (sign fixed by the shared deterministic v0)
    assert abs(float(np.dot(v, ref))) > 0.999
    # eigenvalue estimate ~ ||y|| / n
    assert abs(rows[0]["explained_var"] - nrm / len(X)) < 0.05 * (
        nrm / len(X)
    )


def test_wilson_interval_brackets_rate(spark, sf_dir):
    rows = _q("wilson_interval_rates").spark_fn(spark, sf_dir).collect()
    assert rows
    import math

    for r in rows:
        assert 0.0 <= r["wilson_lo"] <= r["rate"] <= r["wilson_hi"] <= 1.0
        p, n, z = r["k"] / r["n"], r["n"], 1.96
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        lo = (p + z * z / (2 * n) - half) / (1 + z * z / n)
        hi = (p + z * z / (2 * n) + half) / (1 + z * z / n)
        assert abs(r["wilson_lo"] - round(lo * 1e6) / 1e6) < 1e-9
        assert abs(r["wilson_hi"] - round(hi * 1e6) / 1e6) < 1e-9


def test_chi2_independence_matches_scipy_free_recompute(spark, sf_dir):
    row = (
        _q("chi2_independence_lang_source").spark_fn(spark, sf_dir).collect()
    )[0]
    con = duckdb.connect()
    cells = con.execute(
        f"SELECT lang, source, count(*) FROM "
        f"read_parquet('{sf_dir}/documents.parquet') GROUP BY 1, 2"
    ).fetchall()
    from collections import Counter

    rl, cs, n = Counter(), Counter(), 0
    for l_, s_, o in cells:
        rl[l_] += o
        cs[s_] += o
        n += o
    obs = {(l_, s_): o for l_, s_, o in cells}
    obs_chi2 = sum(
        round(
            (obs.get((l_, s_), 0) - rl[l_] * 1.0 * cs[s_] / n) ** 2
            / (rl[l_] * 1.0 * cs[s_] / n)
            * 1e8
        )
        / 1e8
        for l_ in rl
        for s_ in cs
    )
    assert abs(row["chi2"] - round(obs_chi2 * 1e4) / 1e4) < 1e-6
    assert row["dof"] == (len(rl) - 1) * (len(cs) - 1)
    assert row["n_docs"] == n
    import math

    v = math.sqrt(obs_chi2 / (n * min(len(rl) - 1, len(cs) - 1)))
    assert abs(row["cramers_v"] - round(v * 1e4) / 1e4) < 1e-6
    assert 0.0 <= row["cramers_v"] <= 1.0
