"""Relational parity, batch 2: scalar math/regexp packs, pivot,
exact percentiles, correlated subqueries, explode/posexplode, range
window frames, HAVING, cross join, deterministic sampling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import hashing as H
from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

# --- math function pack ----------------------------------------------------
_MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       abs(l_extendedprice - 50000.0) AS abs_diff,
       ceil(l_extendedprice)::BIGINT AS ceil_price,
       floor(l_extendedprice)::BIGINT AS floor_price,
       round(sqrt(l_quantity), 4) AS sqrt_qty,
       round(ln(l_extendedprice), 4) AS ln_price,
       round(pow(1.0 + l_discount, 2), 4) AS pow_disc,
       l_orderkey % 7 AS mod7,
       sign(l_extendedprice - 50000.0)::BIGINT AS sign_diff,
       round(greatest(l_discount, l_tax), 4) AS max_rate,
       round(least(l_discount, l_tax), 4) AS min_rate
FROM lineitem
WHERE l_orderkey % 25 = 0
"""


@register("math_funcs", oracle=_MATH_ORACLE)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.filter(F.col("l_orderkey") % 25 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - 50000.0).alias("abs_diff"),
        F.ceil(price).cast("long").alias("ceil_price"),
        F.floor(price).cast("long").alias("floor_price"),
        R.r(F.sqrt("l_quantity"), 4).alias("sqrt_qty"),
        R.r(F.log(price), 4).alias("ln_price"),
        R.r(F.pow(F.col("l_discount") + 1.0, 2), 4).alias("pow_disc"),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.signum(price - 50000.0).cast("long").alias("sign_diff"),
        R.r(F.greatest("l_discount", "l_tax"), 4).alias("max_rate"),
        R.r(F.least("l_discount", "l_tax"), 4).alias("min_rate"),
    )


# --- regexp pack -----------------------------------------------------------
_REGEXP_ORACLE = r"""
SELECT p_partkey,
       regexp_extract(p_name, '[a-z]+') AS first_word,
       regexp_replace(p_name, '[aeiou]', '*', 'g') AS no_vowels,
       regexp_matches(p_type, '^(STANDARD|PROMO)') AS is_std_promo,
       (p_brand LIKE 'Brand#1%') AS like_b1
FROM part
WHERE regexp_matches(p_name, '^[a-m]')
"""


@register("regexp_funcs", oracle=_REGEXP_ORACLE)
def regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    return part.filter(F.col("p_name").rlike("^[a-m]")).select(
        "p_partkey",
        F.regexp_extract("p_name", "[a-z]+", 0).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("no_vowels"),
        F.col("p_type").rlike("^(STANDARD|PROMO)").alias("is_std_promo"),
        F.col("p_brand").like("Brand#1%").alias("like_b1"),
    )


# --- pivot (wide conditional aggregation) ----------------------------------
_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]

_PIVOT_ORACLE = """
SELECT user_id,
       {cols}
FROM events
GROUP BY user_id
""".format(
    cols=",\n       ".join(
        f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS n_{t}"
        for t in _EVENT_TYPES
    )
)


@register("pivot_event_counts", oracle=_PIVOT_ORACLE)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    pv = (
        events.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves absent combos NULL; the CASE-count oracle yields 0
    return pv.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
            for t in _EVENT_TYPES
        ],
    )


# --- exact interpolated percentiles ----------------------------------------
_PCT_ORACLE = """
SELECT c_mktsegment,
       round(quantile_cont(c_acctbal, 0.25), 4) AS p25,
       round(quantile_cont(c_acctbal, 0.5), 4) AS p50,
       round(quantile_cont(c_acctbal, 0.9), 4) AS p90
FROM customer
GROUP BY c_mktsegment
"""


@register("agg_percentiles", oracle=_PCT_ORACLE)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        R.r(F.percentile("c_acctbal", F.lit(0.25)), 4).alias("p25"),
        R.r(F.percentile("c_acctbal", F.lit(0.5)), 4).alias("p50"),
        R.r(F.percentile("c_acctbal", F.lit(0.9)), 4).alias("p90"),
    )


# --- correlated scalar subquery --------------------------------------------
_CORR_SQL = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o
WHERE o.o_totalprice > (
    SELECT 2 * avg(o2.o_totalprice) FROM orders o2
    WHERE o2.o_custkey = o.o_custkey
)
"""


@register("correlated_subquery", oracle=_CORR_SQL)
def correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_CORR_SQL)


# --- explode / posexplode --------------------------------------------------
_EXPLODE_ORACLE = """
WITH u AS (
    SELECT vec_id,
           unnest(embedding) AS val,
           generate_subscripts(embedding, 1) - 1 AS pos
    FROM embeddings
    WHERE vec_id < 20
)
SELECT vec_id, pos::BIGINT AS pos, round(val::DOUBLE, 4) AS val
FROM u WHERE pos % 8 = 0
"""


@register("explode_embeddings", oracle=_EXPLODE_ORACLE)
def explode_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("vec_id") < 20)
        .select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .filter(F.col("pos") % 8 == 0)
        .select(
            "vec_id",
            F.col("pos").cast("long").alias("pos"),
            R.r(F.col("val").cast("double"), 4).alias("val"),
        )
    )


# --- sorted collect (deterministic list agg) -------------------------------
_COLLECT_ORACLE = """
SELECT c_nationkey,
       string_agg(seg, ',' ORDER BY seg) AS segments
FROM (SELECT DISTINCT c_nationkey, c_mktsegment AS seg FROM customer)
GROUP BY c_nationkey
"""


@register("agg_collect_sorted", oracle=_COLLECT_ORACLE)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    return (
        cust.select("c_nationkey", F.col("c_mktsegment").alias("seg"))
        .distinct()
        .groupBy("c_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("seg")), ",").alias(
                "segments"
            )
        )
    )


# --- range window frame (value-range, not row-count) -----------------------
_RANGE_FRAME_ORACLE = """
SELECT o_orderkey, o_custkey, d,
       count(*) OVER (PARTITION BY o_custkey ORDER BY d
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_last_30d
FROM (
    SELECT o_orderkey, o_custkey,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS d
    FROM orders
)
"""


@register("window_range_frame", oracle=_RANGE_FRAME_ORACLE)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("long")
        .alias("d"),
    )
    w = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-30, 0)
    return base.select(
        "o_orderkey", "o_custkey", "d", F.count(F.lit(1)).over(w).alias("n_last_30d")
    )


# --- HAVING ----------------------------------------------------------------
_HAVING_ORACLE = """
SELECT c_nationkey, count(*) AS n
FROM customer
GROUP BY c_nationkey
HAVING count(*) > 50
"""


@register("having_filter", oracle=_HAVING_ORACLE)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 50)
    )


# --- cross join (explicit cartesian of two tiny dims) ----------------------
_CROSS_ORACLE = """
SELECT r.r_name, s.seg
FROM region r CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) s
"""


@register("cross_join_dims", oracle=_CROSS_ORACLE)
def cross_join_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = read_table(spark, sf_dir, "region")
    cust = read_table(spark, sf_dir, "customer")
    segs = cust.select(F.col("c_mktsegment").alias("seg")).distinct()
    return region.select("r_name").crossJoin(segs)


# --- deterministic sampling (portable hash, not Bernoulli RNG) -------------
_SAMPLE_ORACLE = f"""
SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
WHERE {H.duck_hash_uint(H.sql_salted('o_orderkey', "'samp'"), 8)} / {float(16**8)} < 0.1
"""


@register("deterministic_sample", oracle=_SAMPLE_ORACLE)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% reproducible sample via md5 — the scale-path alternative to
    ``df.sample()`` when lineage-stable sampling matters (same rows
    selected on every run/cluster)."""
    orders = read_table(spark, sf_dir, "orders")
    keep = H.hash_unit(F.col("o_orderkey"), "samp", 8) < 0.1
    return orders.filter(keep).agg(
        F.count(F.lit(1)).alias("n"),
        R.r(F.sum("o_totalprice"), 2).alias("total"),
    )


# --- month-over-month growth -----------------------------------------------
# Growth metrics: monthly revenue per order priority with the previous
# month's value and pct change — one aggregate then a lag window over
# the (priority, month) rollup (group count bounded, so the window
# partition is tiny). Decimal-exact sums; pct change rounded 4dp.

_MOM_ORACLE = """
WITH m AS (
    SELECT o_orderpriority,
           date_trunc('month', o_orderdate)::TIMESTAMP AS month,
           round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2)::DOUBLE
               AS revenue
    FROM orders GROUP BY o_orderpriority, month
)
SELECT o_orderpriority, month, revenue,
       lag(revenue) OVER w AS prev_revenue,
       round((revenue - lag(revenue) OVER w)
             / lag(revenue) OVER w, 4) AS mom_pct
FROM m
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)
"""


@register("growth_mom_by_priority", oracle=_MOM_ORACLE)
def growth_mom_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        "o_orderpriority",
        F.date_trunc("month", "o_orderdate").cast("timestamp").alias("month"),
    ).agg(R.money_sum("o_totalprice").alias("revenue"))
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "o_orderpriority",
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        R.r((F.col("revenue") - prev) / prev, 4).alias("mom_pct"),
    )


# --- robust statistics: median absolute deviation --------------------------
# Outlier-resistant dispersion per event type: MAD = median of
# |x - median(x)|. Two exact-percentile aggregations (each one
# shuffle; Spark's percentile is a sort-free high-accuracy aggregate,
# DuckDB's median interpolates identically on doubles).

_MAD_ORACLE = """
WITH med AS (
    SELECT event_type, median(value) AS m
    FROM events GROUP BY event_type
)
SELECT e.event_type,
       round(any_value(med.m), 4) AS median_value,
       round(median(abs(e.value - med.m)), 4) AS mad
FROM events e JOIN med ON e.event_type = med.event_type
GROUP BY e.event_type
"""


@register("robust_mad_stats", oracle=_MAD_ORACLE)
def robust_mad_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("m")
    )
    joined = ev.join(F.broadcast(med), "event_type")
    return joined.groupBy("event_type").agg(
        R.r(F.first("m"), 4).alias("median_value"),
        R.r(
            F.expr("percentile(abs(value - m), 0.5)"), 4
        ).alias("mad"),
    )


# --- SLA latency percentiles -----------------------------------------------
# Ship-delay distribution per order priority: p50/p90/p99 of
# (shipdate - orderdate) in days — the SLA-latency readout every ops
# dashboard carries. One join shuffle + one aggregate; delays are
# exact integer day counts so the exact-percentile interpolation is
# identical in both engines.

_SLA_ORACLE = """
WITH d AS (
    SELECT o.o_orderpriority,
           date_diff('day', o.o_orderdate, l.l_shipdate) AS delay_days
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
)
SELECT o_orderpriority,
       count(*) AS n,
       round(quantile_cont(delay_days, 0.5), 4) AS p50,
       round(quantile_cont(delay_days, 0.9), 4) AS p90,
       round(quantile_cont(delay_days, 0.99), 4) AS p99,
       max(delay_days)::BIGINT AS max_delay
FROM d GROUP BY o_orderpriority
"""


@register("sla_ship_delay_percentiles", oracle=_SLA_ORACLE)
def sla_ship_delay_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    d = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).cast("long").alias("delay_days"),
    )
    pct = lambda p: F.expr(f"percentile(delay_days, {p})")  # noqa: E731
    return d.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        R.r(pct(0.5), 4).alias("p50"),
        R.r(pct(0.9), 4).alias("p90"),
        R.r(pct(0.99), 4).alias("p99"),
        F.max("delay_days").alias("max_delay"),
    )


# --- market-basket co-purchase pairs ---------------------------------------
# Association mining's first step: part pairs co-occurring in the same
# order, kept above a minimum support. The pair join is keyed by
# orderkey, so candidate volume is sum(basket_size^2) — bounded by the
# biggest basket (~7 lines in TPC-H shapes), never corpus-quadratic.
# One join shuffle + one pair aggregate.

_BASKET_ORACLE = """
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, count(*) AS support
FROM pairs
GROUP BY part_a, part_b
HAVING count(*) >= 2
"""


@register("market_basket_pairs", oracle=_BASKET_ORACLE)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = a.join(
        b, (a.ok == b.ok) & (F.col("part_a") < F.col("part_b"))
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )


# --- item-item collaborative filtering -------------------------------------
# The recommender step after market_basket_pairs: normalize pair
# support into cosine similarity n_ab / sqrt(n_a · n_b) over order
# baskets and keep each item's top-3 neighbors — the item-item CF
# model (Amazon-style) as a dataflow. Candidates stay basket-blocked
# (the same bounded pair join as support mining); the per-item top-k
# is a WindowGroupLimit, not a global sort. Support >= 2 prunes the
# pair tail BEFORE the window.
_ITEMCF_ORACLE = """
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
freq AS (
    SELECT l_partkey, count(*) AS n FROM items GROUP BY l_partkey
),
pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS nab
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= 2
),
sym AS (
    SELECT part_a AS i, part_b AS j, nab FROM pairs
    UNION ALL
    SELECT part_b, part_a, nab FROM pairs
),
scored AS (
    SELECT s.i, s.j,
           round(s.nab / sqrt(fi.n * fj.n) * 10000) / 10000 + 0.0 AS sim
    FROM sym s
    JOIN freq fi ON fi.l_partkey = s.i
    JOIN freq fj ON fj.l_partkey = s.j
)
SELECT i AS part, j AS neighbor, sim
FROM (
    SELECT i, j, sim,
           row_number() OVER (PARTITION BY i
                              ORDER BY sim DESC, j) AS rn
    FROM scored)
WHERE rn <= 3
"""


@register("itemcf_topk_neighbors", oracle=_ITEMCF_ORACLE)
def itemcf_topk_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    items = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, (a.ok == b.ok) & (F.col("part_a") < F.col("part_b")))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("nab"))
        .filter(F.col("nab") >= 2)
    )
    sym = pairs.select(
        F.col("part_a").alias("i"), F.col("part_b").alias("j"), "nab"
    ).unionAll(
        pairs.select(
            F.col("part_b").alias("i"), F.col("part_a").alias("j"), "nab"
        )
    )
    fi = freq.select(F.col("l_partkey").alias("i"), F.col("n").alias("ni"))
    fj = freq.select(F.col("l_partkey").alias("j"), F.col("n").alias("nj"))
    scored = (
        sym.join(fi, "i")
        .join(fj, "j")
        .select(
            "i",
            "j",
            (
                F.round(
                    F.col("nab")
                    / F.sqrt(F.col("ni") * F.col("nj"))
                    * 10000.0
                )
                / 10000.0
                + 0.0
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("i").orderBy(F.desc("sim"), F.asc("j"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("i").alias("part"),
            F.col("j").alias("neighbor"),
            "sim",
        )
    )


# --- association rules (confidence / lift) ----------------------------------
# The Apriori step after market_basket_pairs: directed rules A→B with
# confidence = supp(AB)/supp(A) and lift = supp(AB)·N/(supp(A)·supp(B)),
# top-20 by lift. Item supports are one distinct-items aggregate; the
# rule table doubles the (support ≥ 2) pair list — still
# Σ basket²-bounded. A fixed confidence threshold goes VACUOUS as the
# corpus grows (pair support stays flat while item support scales), so
# the cut is a rank cut: TakeOrdered top-20 on the 6dp-snapped lift
# with (ante, cons) tie-breaks — deterministic and non-empty at every
# scale factor.
_RULES_ORACLE = """
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
nn AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n FROM items),
isup AS (SELECT l_partkey, count(*)::BIGINT AS s FROM items GROUP BY 1),
pairs AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*)::BIGINT AS sab
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING count(*) >= 2
),
rules AS (
    SELECT pa AS ante, pb AS cons, sab FROM pairs
    UNION ALL
    SELECT pb, pa, sab FROM pairs
),
rr AS (
    SELECT r.ante, r.cons, r.sab,
           round(r.sab * 1.0 / ia.s * 10000) / 10000 + 0.0 AS confidence,
           round(r.sab * 1.0 * nn.n / (ia.s * ic.s) * 1000000) / 1000000
               + 0.0 AS lift
    FROM rules r
    JOIN isup ia ON ia.l_partkey = r.ante
    JOIN isup ic ON ic.l_partkey = r.cons
    CROSS JOIN nn
)
SELECT ante, cons, sab AS support_ab, confidence,
       round(lift * 10000) / 10000 + 0.0 AS lift
FROM rr
ORDER BY lift DESC, ante, cons
LIMIT 20
"""


@register("market_basket_rules", oracle=_RULES_ORACLE)
def market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    nn = items.agg(
        F.countDistinct("l_orderkey").alias("n")
    )
    isup = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("s"))
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb")
    )
    pairs = (
        a.join(b, (a.ok == b.ok) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("sab"))
        .filter(F.col("sab") >= 2)
    )
    rules = pairs.select(
        F.col("pa").alias("ante"), F.col("pb").alias("cons"), "sab"
    ).unionAll(
        pairs.select(
            F.col("pb").alias("ante"), F.col("pa").alias("cons"), "sab"
        )
    )
    ia = isup.select(F.col("l_partkey").alias("ante"), F.col("s").alias("sa"))
    ic = isup.select(F.col("l_partkey").alias("cons"), F.col("s").alias("sc"))
    rr = (
        rules.join(ia, "ante")
        .join(ic, "cons")
        .crossJoin(F.broadcast(nn))
        .select(
            "ante",
            "cons",
            "sab",
            R.r(F.col("sab") * 1.0 / F.col("sa"), 4).alias("confidence"),
            R.r(
                F.col("sab") * 1.0 * F.col("n") / (F.col("sa") * F.col("sc")),
                6,
            ).alias("lift"),
        )
    )
    return (
        rr.orderBy(F.desc("lift"), F.asc("ante"), F.asc("cons"))
        .limit(20)
        .select(
            "ante",
            "cons",
            F.col("sab").alias("support_ab"),
            "confidence",
            R.r(F.col("lift"), 4).alias("lift"),
        )
    )


# --- deterministic negative sampling (recommender prep) ---------------------
# Contrastive training needs NEGATIVES: for every anchor part, k
# candidate parts that NEVER co-occurred with it in any order. The
# candidate stream is md5-derived (functions/hashing — JVM-side,
# oracle-mirrored) so it is reproducible at any scale, then verified
# negative by a left-anti join against the co-occurrence pair list
# (Σ basket²-bounded, the market_basket machinery). Self-hits are
# filtered. Partkeys are dense 0..N-1 (see stable_row_ids for the
# non-dense general case); N ships via a 1-row broadcast.
_NEG_K = 5

_NEG_ORACLE = f"""
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
anchors AS (SELECT DISTINCT l_partkey AS anchor FROM items),
nn AS (SELECT count(*)::BIGINT AS n FROM anchors),
cands AS (
    SELECT a.anchor, j.j,
           {H.duck_hash_uint("a.anchor || ':' || j.j")} % nn.n AS cand
    FROM anchors a, (SELECT unnest(generate_series(0, {_NEG_K - 1})) AS j)
         AS j, nn
),
cooc AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
)
SELECT c.anchor, c.j::BIGINT AS j, c.cand
FROM cands c
WHERE c.cand <> c.anchor
  AND NOT EXISTS (SELECT 1 FROM cooc
                  WHERE cooc.pa = c.anchor AND cooc.pb = c.cand)
"""


@register("negative_sampling_pairs", oracle=_NEG_ORACLE)
def negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    anchors = items.select(F.col("l_partkey").alias("anchor")).distinct()
    nn = anchors.agg(F.count(F.lit(1)).alias("n"))
    js = F.explode(F.sequence(F.lit(0), F.lit(_NEG_K - 1))).alias("j")
    cands = (
        anchors.crossJoin(F.broadcast(nn))
        .select("anchor", "n", js)
        .select(
            "anchor",
            F.col("j").cast("long").alias("j"),
            F.pmod(
                H.hash_uint(
                    F.concat(
                        F.col("anchor").cast("string"),
                        F.lit(":"),
                        F.col("j").cast("string"),
                    )
                ),
                F.col("n"),
            ).alias("cand"),
        )
        .filter(F.col("cand") != F.col("anchor"))
    )
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb")
    )
    cooc = (
        a.join(b, (a.ok == b.ok) & (F.col("pa") != F.col("pb")))
        .select("pa", "pb")
        .distinct()
    )
    return cands.join(
        cooc,
        (cands.anchor == cooc.pa) & (cands.cand == cooc.pb),
        "left_anti",
    ).select("anchor", "j", "cand")
