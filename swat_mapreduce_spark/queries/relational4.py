"""Scalar/window/collection function coverage, part 3 (SURVEY.md §2B
"scalar function library" + "window functions" rows).

Each query exposes a pack of built-ins the reference lacks entirely,
shaped so the output is plain comparable columns (maps and arrays are
reduced back to scalars where cross-engine value hashing would be
format-sensitive). All pure narrow transforms except the explicit
groupBy/window queries — nothing here shuffles more than its oracle
semantics require.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table


# --- window analytics: ntile / percent_rank / cume_dist / nth_value ------
# Deterministic ordering: (o_totalprice, o_orderkey) is unique.
_WANALYTICS_ORACLE = """
SELECT o_orderkey, o_orderpriority,
       ntile(4) OVER w AS price_quartile,
       round(percent_rank() OVER w, 4) AS pct_rank,
       round(cume_dist() OVER w, 4) AS cdist,
       nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderpriority
           ORDER BY o_totalprice, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS second_cheapest,
       first_value(o_orderkey) OVER w AS cheapest,
       last_value(o_orderkey) OVER (PARTITION BY o_orderpriority
           ORDER BY o_totalprice, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS priciest
FROM orders
WHERE o_orderdate >= TIMESTAMP '2001-01-01'
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


@register("window_analytics_pack", oracle=_WANALYTICS_ORACLE)
def window_analytics_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).alias("price_quartile"),
            R.r(F.percent_rank().over(w), 4).alias("pct_rank"),
            R.r(F.cume_dist().over(w), 4).alias("cdist"),
            F.nth_value("o_orderkey", 2).over(wfull).alias("second_cheapest"),
            F.first("o_orderkey").over(w).alias("cheapest"),
            F.last("o_orderkey").over(wfull).alias("priciest"),
        )
    )


# --- higher-order array functions over embeddings ------------------------
# filter/exists/forall/aggregate/zip_with reduced to scalars.
_HOF_ORACLE = """
SELECT vec_id,
       len(list_filter(embedding, x -> x > 0)) AS n_pos,
       list_count(embedding) > len(list_filter(embedding, x -> x <= 0.9))
           AS has_gt_09,
       len(list_filter(embedding, x -> x > -2)) = list_count(embedding)
           AS all_gt_neg2,
       round(list_sum(list_transform(embedding, x -> x::DOUBLE * x)), 4)
           AS sum_sq,
       round(list_sum(list_apply(range(1, list_count(embedding) + 1),
                                 i -> embedding[i]::DOUBLE * i)), 4)
           AS weighted_sum
FROM embeddings
"""


@register("array_higher_order", oracle=_HOF_ORACLE)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    idx = F.sequence(F.lit(1), F.size("embedding"))
    return emb.select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
        F.exists(e, lambda x: x > 0.9).alias("has_gt_09"),
        F.forall(e, lambda x: x > -2).alias("all_gt_neg2"),
        R.r(F.aggregate(e, F.lit(0.0), lambda a, x: a + x * x), 4).alias("sum_sq"),
        R.r(
            F.aggregate(
                F.zip_with(e, idx, lambda x, i: x * i.cast("double")),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            4,
        ).alias("weighted_sum"),
    )


# --- map construction + lookup (reduced to scalars at the sink) ----------
_MAP_ORACLE = """
WITH counts AS (
    SELECT user_id, event_type, count(*) AS n, round(sum(value), 4) AS sv
    FROM events GROUP BY user_id, event_type
)
SELECT user_id,
       coalesce(any_value(CASE WHEN event_type = 'click' THEN n END), 0)
           AS clicks,
       coalesce(any_value(CASE WHEN event_type = 'purchase' THEN n END), 0)
           AS purchases,
       coalesce(any_value(CASE WHEN event_type = 'error' THEN sv END), 0.0)
           AS error_value,
       count(*) AS n_types
FROM counts GROUP BY user_id
"""


@register("map_funcs", oracle=_MAP_ORACLE)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a per-user map<event_type, struct(n, sv)> with
    ``map_from_entries``, then read it back with ``element_at`` /
    ``map_keys`` — demonstrating the map type while emitting plain
    comparable scalars."""
    events = read_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"), R.r(F.sum("value"), 4).alias("sv")
    )
    mapped = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", F.struct("n", "sv")))
        ).alias("m")
    )
    return mapped.select(
        "user_id",
        F.coalesce(F.element_at("m", "click").getField("n"), F.lit(0)).alias(
            "clicks"
        ),
        F.coalesce(
            F.element_at("m", "purchase").getField("n"), F.lit(0)
        ).alias("purchases"),
        F.coalesce(
            F.element_at("m", "error").getField("sv"), F.lit(0.0)
        ).alias("error_value"),
        F.size(F.map_keys("m")).cast("long").alias("n_types"),
    )


# --- bitwise operations --------------------------------------------------
_BITWISE_ORACLE = """
SELECT o_orderkey,
       o_orderkey & 255 AS low_byte,
       o_orderkey | 4096 AS with_flag,
       xor(o_orderkey, 21845) AS xored,
       o_orderkey << 2 AS shl,
       o_orderkey >> 3 AS shr,
       bit_count(o_orderkey) AS popcount
FROM orders WHERE o_orderkey % 97 = 0
"""


@register("bitwise_funcs", oracle=_BITWISE_ORACLE)
def bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return orders.filter(k % 97 == 0).select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.bit_count(k).alias("popcount"),
    )


# --- string pack 2: pad/translate/levenshtein/split_part/repeat ----------
_STR2_ORACLE = """
SELECT c_custkey,
       lpad(c_name, 25, '*') AS padded,
       rpad(c_mktsegment, 12, '.') AS rpadded,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS lowered_vowels,
       levenshtein(c_mktsegment, 'BUILDING') AS lev_to_building,
       split_part(c_name, '#', 2) AS name_num,
       repeat(substr(c_mktsegment, 1, 1), 3) AS tripled,
       reverse(c_mktsegment) AS revseg,
       ascii(c_mktsegment) AS first_code,
       chr(65 + (c_custkey % 26)::INT) AS letter,
       strpos(c_mktsegment, 'I') AS i_pos
FROM customer WHERE c_custkey % 13 = 0
"""


@register("string_funcs2", oracle=_STR2_ORACLE)
def string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    seg = F.col("c_mktsegment")
    return cust.filter(F.col("c_custkey") % 13 == 0).select(
        "c_custkey",
        F.lpad("c_name", 25, "*").alias("padded"),
        F.rpad(seg, 12, ".").alias("rpadded"),
        F.translate(seg, "AEIOU", "aeiou").alias("lowered_vowels"),
        F.levenshtein(seg, F.lit("BUILDING")).alias("lev_to_building"),
        F.split_part("c_name", F.lit("#"), F.lit(2)).alias("name_num"),
        F.repeat(F.substring(seg, 1, 1), 3).alias("tripled"),
        F.reverse(seg).alias("revseg"),
        F.ascii(seg).alias("first_code"),
        F.chr(F.lit(65) + F.col("c_custkey") % 26).alias("letter"),
        F.instr(seg, "I").alias("i_pos"),
    )


# --- date/interval pack 2 ------------------------------------------------
# Spark dayofweek: 1=Sunday; DuckDB dayofweek: 0=Sunday → oracle +1.
_DATE2_ORACLE = """
SELECT event_id,
       (ts + INTERVAL 7 DAY)::DATE AS plus_week,
       (ts + INTERVAL 3 MONTH)::DATE AS plus_3mo,
       last_day(ts::DATE) AS month_end,
       dayofweek(ts) + 1 AS dow,
       weekofyear(ts) AS woy,
       dayofyear(ts) AS doy,
       floor(epoch(ts))::BIGINT AS unix_sec,
       make_date(2020, (event_id % 12 + 1)::INT, 1) AS synth_date,
       date_trunc('week', ts)::DATE AS week_start
FROM events WHERE event_id % 53 = 0
"""


@register("date_funcs2", oracle=_DATE2_ORACLE)
def date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    ts = F.col("ts")
    return events.filter(F.col("event_id") % 53 == 0).select(
        "event_id",
        F.date_add(ts.cast("date"), 7).alias("plus_week"),
        F.add_months(ts.cast("date"), 3).alias("plus_3mo"),
        F.last_day(ts.cast("date")).alias("month_end"),
        F.dayofweek(ts).alias("dow"),
        F.weekofyear(ts).alias("woy"),
        F.dayofyear(ts).alias("doy"),
        F.unix_timestamp(ts).alias("unix_sec"),
        F.make_date(
            F.lit(2020), (F.col("event_id") % 12 + 1).cast("int"), F.lit(1)
        ).alias("synth_date"),
        F.date_trunc("week", ts).cast("date").alias("week_start"),
    )


# --- unionByName (schema-aligned union of differently-ordered columns) ---
_UNION_BYNAME_ORACLE = """
SELECT user_id, event_type, n FROM (
  SELECT user_id, event_type, count(*) AS n FROM events
  WHERE event_type = 'click' GROUP BY user_id, event_type
  UNION ALL
  SELECT user_id, event_type, count(*) AS n FROM events
  WHERE event_type = 'purchase' GROUP BY user_id, event_type
) u
"""


@register("set_union_by_name", oracle=_UNION_BYNAME_ORACLE)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", "event_type", "n")
    )
    # deliberately different column order — unionByName aligns by name
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("n", "event_type", "user_id")
    )
    return clicks.unionByName(purchases)


# --- null-handling pack: nullif / ifnull / nvl2 / coalesce chains --------
_NULLS_ORACLE = """
SELECT l_orderkey, l_linenumber,
       nullif(l_discount, 0.0) AS disc_or_null,
       coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_neg1,
       CASE WHEN nullif(l_tax, 0.0) IS NOT NULL THEN 'taxed' ELSE 'tax_free'
            END AS tax_status,
       coalesce(nullif(l_returnflag, 'N'), '(none)') AS flag_or_none
FROM lineitem WHERE l_orderkey % 251 = 0
"""


@register("null_handling_funcs", oracle=_NULLS_ORACLE)
def null_handling_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    disc_nn = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.filter(F.col("l_orderkey") % 251 == 0).select(
        "l_orderkey",
        "l_linenumber",
        disc_nn.alias("disc_or_null"),
        F.ifnull(disc_nn, F.lit(-1.0)).alias("disc_or_neg1"),
        F.nvl2(
            F.nullif(F.col("l_tax"), F.lit(0.0)),
            F.lit("taxed"),
            F.lit("tax_free"),
        ).alias("tax_status"),
        F.coalesce(
            F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("(none)")
        ).alias("flag_or_none"),
    )


# --- skew-split join: hot keys broadcast, cold keys shuffled -------------
# Semantically a plain inner join (the oracle); physically the hot 20%
# of users bypass the shuffle entirely (operators/skew.py).
_SKEW_ORACLE = """
SELECT c_mktsegment, event_type, count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment, event_type
"""


@register("skew_split_join_events", oracle=_SKEW_ORACLE)
def skew_split_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swat_mapreduce_spark.operators import skew

    events = read_table(spark, sf_dir, "events")
    cust = read_table(spark, sf_dir, "customer")
    hot = skew.hot_keys(events, "user_id", min_count=200)
    joined = skew.skew_split_join(events, cust, "user_id", "c_custkey", hot)
    return joined.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        R.r(F.sum("value"), 2).alias("sum_value"),
    )


# --- median / mode aggregates (exact; mode tie-broken by min value) ------
# Spark's mode() tie-breaking is nondeterministic; both sides compute
# the deterministic "most frequent, then smallest" via count+rank so
# the oracle is stable.
_MEDIAN_MODE_ORACLE = """
WITH freq AS (
    SELECT o_orderpriority, o_orderstatus, count(*) AS n
    FROM orders GROUP BY o_orderpriority, o_orderstatus
),
best AS (
    SELECT o_orderpriority, o_orderstatus AS mode_status,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY n DESC, o_orderstatus) AS rn
    FROM freq
)
SELECT m.o_orderpriority,
       round(median(o.o_totalprice), 4) AS median_price,
       any_value(b.mode_status) AS mode_status
FROM orders o
JOIN best b ON b.o_orderpriority = o.o_orderpriority AND b.rn = 1
JOIN (SELECT DISTINCT o_orderpriority FROM orders) m
  ON m.o_orderpriority = o.o_orderpriority
GROUP BY m.o_orderpriority
"""


@register("agg_median_mode", oracle=_MEDIAN_MODE_ORACLE)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    freq = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("n"), F.asc("o_orderstatus")
    )
    best = (
        freq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_orderpriority").alias("bp"),
            F.col("o_orderstatus").alias("mode_status"),
        )
    )
    med = orders.groupBy("o_orderpriority").agg(
        R.r(F.median("o_totalprice"), 4).alias("median_price")
    )
    return med.join(
        F.broadcast(best), med.o_orderpriority == F.col("bp")
    ).select("o_orderpriority", "median_price", "mode_status")


# --- schema-on-read JSON: from_json -> typed struct ----------------------
# (json_extract_agg covers get_json_object string extraction; this is
# the typed from_json surface with a declared schema.)
_FROM_JSON_ORACLE = """
SELECT event_type,
       count(*) AS n,
       sum((props->>'k')::BIGINT)::BIGINT AS sum_k,
       min((props->>'k')::BIGINT) AS min_k,
       max((props->>'k')::BIGINT) AS max_k
FROM events
GROUP BY event_type
"""


@register("from_json_typed", oracle=_FROM_JSON_ORACLE)
def from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    parsed = events.withColumn(
        "p", F.from_json("props", "k bigint")
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p.k").alias("sum_k"),
        F.min("p.k").alias("min_k"),
        F.max("p.k").alias("max_k"),
    )


# --- boolean aggregates: every / some (bool_and / bool_or) ---------------
_BOOL_AGG_ORACLE = """
SELECT event_type,
       bool_and(value >= 0) AS all_nonneg,
       bool_or(value > 99) AS any_gt99,
       count(*) FILTER (WHERE value > 50) AS n_gt50
FROM events
GROUP BY event_type
"""


@register("bool_aggs", oracle=_BOOL_AGG_ORACLE)
def bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.every(F.col("value") >= 0).alias("all_nonneg"),
        F.some(F.col("value") > 99).alias("any_gt99"),
        F.count_if(F.col("value") > 50).alias("n_gt50"),
    )


# --- explode_outer / posexplode_outer (null-preserving expansion) --------
# Rows whose array is NULL (doc_id % 5 == 0 here) must survive with a
# NULL element — the outer-variant contract that plain explode drops.
_EXPLODE_OUTER_ORACLE = """
WITH src AS (
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0 THEN NULL
                ELSE string_split(lang, '') END AS arr
    FROM documents WHERE doc_id % 7 = 0
)
SELECT doc_id,
       CASE WHEN arr IS NULL THEN NULL
            ELSE generate_subscripts(arr, 1) END AS pos,
       unnest(CASE WHEN arr IS NULL THEN [NULL] ELSE arr END) AS ch
FROM src
"""


@register("explode_outer_nulls", oracle=_EXPLODE_OUTER_ORACLE)
def explode_outer_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 7 == 0
    )
    src = docs.withColumn(
        "arr",
        F.when(F.col("doc_id") % 5 == 0, F.lit(None)).otherwise(
            F.split("lang", "")
        ),
    )
    return src.select(
        "doc_id", F.posexplode_outer("arr").alias("pos0", "ch")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "ch")


# --- unpivot / melt: wide measures -> (name, value) rows -----------------
_UNPIVOT_ORACLE = """
SELECT l_orderkey, l_linenumber, measure, round(value, 4) AS value
FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
      FROM lineitem WHERE l_orderkey % 503 = 0)
UNPIVOT (value FOR measure IN (l_quantity, l_discount, l_tax))
"""


@register("unpivot_measures", oracle=_UNPIVOT_ORACLE)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") % 503 == 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
        .unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=["l_quantity", "l_discount", "l_tax"],
            variableColumnName="measure",
            valueColumnName="value0",
        )
        .select(
            "l_orderkey", "l_linenumber", "measure",
            R.r("value0", 4).alias("value"),
        )
    )


# --- interval range frame: sliding 3-day window over timestamps ----------
# rangeBetween with an interval bound — the time-based frame variant
# (window_range_frame covers numeric bounds).
_INTERVAL_FRAME_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN INTERVAL 3 DAY PRECEDING
                                AND CURRENT ROW) AS n_3day,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate
                      RANGE BETWEEN INTERVAL 3 DAY PRECEDING
                                AND CURRENT ROW), 2) AS spend_3day
FROM orders
WHERE o_custkey % 17 = 0
"""


@register("window_interval_frame", oracle=_INTERVAL_FRAME_ORACLE)
def window_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    orders.filter(F.col("o_custkey") % 17 == 0).createOrReplaceTempView(
        "_ivf_orders"
    )
    # interval-bounded RANGE frames are SQL-only in Spark (the
    # DataFrame rangeBetween takes longs); this IS the engine surface
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_orderdate,
               count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                              RANGE BETWEEN INTERVAL 3 DAY PRECEDING
                                        AND CURRENT ROW) AS n_3day,
               round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate
                              RANGE BETWEEN INTERVAL 3 DAY PRECEDING
                                        AND CURRENT ROW) * 100.0) / 100.0
                   AS spend_3day
        FROM _ivf_orders
        """
    )


# --- bivariate/dispersion statistics aggregates --------------------------
_STATS2_ORACLE = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covs,
       round(covar_pop(l_quantity, l_discount), 4) AS qty_disc_covp,
       round(stddev_pop(l_extendedprice), 4) AS price_sd_pop,
       round(var_pop(l_quantity), 4) AS qty_var_pop,
       round(stddev_samp(l_tax), 4) AS tax_sd_samp
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_stats_bivariate", oracle=_STATS2_ORACLE)
def agg_stats_bivariate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        R.r(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        R.r(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covs"
        ),
        R.r(F.covar_pop("l_quantity", "l_discount"), 4).alias("qty_disc_covp"),
        R.r(F.stddev_pop("l_extendedprice"), 4).alias("price_sd_pop"),
        R.r(F.var_pop("l_quantity"), 4).alias("qty_var_pop"),
        R.r(F.stddev_samp("l_tax"), 4).alias("tax_sd_samp"),
    )


# --- regexp_extract_all + str_to_map -------------------------------------
_REGEXP_ALL_ORACLE = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
       len(regexp_extract_all(text, '[.!?]')) AS n_sentence_marks,
       regexp_extract(concat('lang=', lang, ',src=', source),
                      'lang=([^,]*)', 1) AS lang_kv,
       regexp_extract(concat('lang=', lang, ',src=', source),
                      'src=(.*)$', 1) AS src_kv
FROM documents WHERE doc_id % 41 = 0
"""


@register("regexp_extract_all_kv", oracle=_REGEXP_ALL_ORACLE)
def regexp_extract_all_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    kv = F.concat(
        F.lit("lang="), F.col("lang"), F.lit(",src="), F.col("source")
    )
    m = F.str_to_map(kv, F.lit(","), F.lit("="))
    return docs.filter(F.col("doc_id") % 41 == 0).select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[A-Za-z]+"), F.lit(0))).alias("n_words"),
        F.size(F.regexp_extract_all("text", F.lit("[.!?]"), F.lit(0))).alias(
            "n_sentence_marks"
        ),
        F.element_at(m, "lang").alias("lang_kv"),
        F.element_at(m, "src").alias("src_kv"),
    )


# --- VariantType semi-structured path (Spark 4) --------------------------
# parse_json -> VARIANT -> typed variant_get: the modern
# schema-flexible JSON path (vs from_json's declared schema).
_VARIANT_ORACLE = """
SELECT event_type,
       sum((props->>'k')::BIGINT)::BIGINT AS sum_k,
       count(*) FILTER (WHERE (props->>'k')::BIGINT > 50) AS n_big
FROM events
GROUP BY event_type
"""


@register("variant_json_typed_get", oracle=_VARIANT_ORACLE)
def variant_json_typed_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count_if(F.col("k") > 50).alias("n_big"),
        )
    )


# --- multiset set ops: intersectAll / exceptAll --------------------------
# (set_intersect/set_except cover the DISTINCT variants; these keep
# duplicate multiplicities — INTERSECT ALL / EXCEPT ALL.)
_MULTISET_ORACLE = """
SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity > 45
INTERSECT ALL
SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_discount > 0.08
"""


@register("set_intersect_all", oracle=_MULTISET_ORACLE)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 45).select("l_returnflag", "l_linestatus")
    b = li.filter(F.col("l_discount") > 0.08).select("l_returnflag", "l_linestatus")
    return a.intersectAll(b)


_EXCEPTALL_ORACLE = """
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_orderpriority FROM orders WHERE o_totalprice > 400000
"""


@register("set_except_all", oracle=_EXCEPTALL_ORACLE)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    # 400000: rare enough that the F-status multiset retains surplus
    # multiplicity at every sf (200000 subtracted everything away)
    b = orders.filter(F.col("o_totalprice") > 400000).select("o_orderpriority")
    return a.exceptAll(b)


# --- grouping() / grouping_id() over rollup ------------------------------
_GROUPING_ID_ORACLE = """
SELECT coalesce(l_returnflag, '(all)') AS returnflag,
       coalesce(l_linestatus, '(all)') AS linestatus,
       grouping(l_returnflag) AS g_flag,
       grouping(l_linestatus) AS g_status,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("agg_grouping_id", oracle=_GROUPING_ID_ORACLE)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            F.col("g_flag").cast("long"),
            F.col("g_status").cast("long"),
            "n",
        )
    )


# --- error-safe arithmetic: try_divide / try_cast / try_add --------------
# ANSI-safe forms that yield NULL instead of failing — the robustness
# surface for dirty data.
_TRY_FUNCS_ORACLE = """
SELECT event_id,
       CASE WHEN (props->>'k')::BIGINT = 0 THEN NULL
            ELSE value / (props->>'k')::BIGINT END AS per_k,
       TRY_CAST(event_type AS BIGINT) AS bad_cast,
       TRY_CAST('20' || lpad((event_id % 99)::VARCHAR, 2, '0')
                AS BIGINT) AS good_cast
FROM events WHERE event_id % 61 = 0
"""


@register("try_functions", oracle=_TRY_FUNCS_ORACLE)
def try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return events.filter(F.col("event_id") % 61 == 0).select(
        "event_id",
        F.try_divide(F.col("value"), k).alias("per_k"),
        F.try_to_number(F.col("event_type"), F.lit("999")).cast("bigint")
            .alias("bad_cast"),
        F.concat(
            F.lit("20"), F.lpad((F.col("event_id") % 99).cast("string"), 2, "0")
        ).cast("bigint").alias("good_cast"),
    )


# --- map value lambdas: transform_values / map_filter --------------------
# Reduced to scalars (map render formats differ across engines).
_MAP_LAMBDA_ORACLE = """
WITH counts AS (
    SELECT user_id, event_type, count(*) AS n
    FROM events GROUP BY user_id, event_type
)
SELECT user_id,
       coalesce(any_value(CASE WHEN event_type = 'view' THEN n * 100 END), -1)
           AS views_pct,
       count(*) FILTER (WHERE n > 10) AS n_frequent_types
FROM counts GROUP BY user_id
"""


@register("map_value_lambdas", oracle=_MAP_LAMBDA_ORACLE)
def map_value_lambdas(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    mapped = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("m")
    )
    scaled = F.transform_values(F.col("m"), lambda _, v: v * 100)
    frequent = F.map_filter(F.col("m"), lambda _, v: v > 10)
    return mapped.select(
        "user_id",
        F.coalesce(F.element_at(scaled, "view"), F.lit(-1)).alias("views_pct"),
        F.size(F.map_keys(frequent)).cast("long").alias("n_frequent_types"),
    )


# --- array edit functions: compact / append / prepend / remove -----------
_ARRAY_EDIT_ORACLE = """
WITH src AS (
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0
                THEN [n_chars, NULL, n_chars + 1]
                ELSE [n_chars, n_chars + 1] END AS arr
    FROM documents WHERE doc_id % 23 = 0
)
SELECT doc_id,
       len(list_filter(arr, x -> x IS NOT NULL)) AS n_compact,
       list_prepend(0::BIGINT, list_filter(arr, x -> x IS NOT NULL))
           AS with_head,
       list_append(list_filter(arr, x -> x IS NOT NULL), -1::BIGINT)
           AS with_tail
FROM src
"""


@register("array_edit_funcs", oracle=_ARRAY_EDIT_ORACLE)
def array_edit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    arr = F.when(
        F.col("doc_id") % 3 == 0,
        F.array("n_chars", F.lit(None), F.col("n_chars") + 1),
    ).otherwise(F.array("n_chars", F.col("n_chars") + 1))
    compact = F.array_compact(arr)
    return docs.filter(F.col("doc_id") % 23 == 0).select(
        "doc_id",
        F.size(compact).alias("n_compact"),
        F.array_prepend(compact, F.lit(0).cast("bigint")).alias("with_head"),
        F.array_append(compact, F.lit(-1).cast("bigint")).alias("with_tail"),
    )


# --- bucketed tables + shuffle-free sort-merge join ----------------------
# The 100 TB co-location strategy made oracle-checkable: both fact
# tables are written bucketed+sorted on the join key, so the SMJ reads
# bucket i of each side directly — NO Exchange on either side of the
# join (tests/test_plans.py asserts the plan; this query pins the
# results). At scale this is how nightly orders⋈lineitem pipelines
# amortize one bucketed write across every downstream join.
_SMB_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_lines,
       round(sum(CAST(l_extendedprice AS DECIMAL(30,8))), 2)::DOUBLE
           AS total_price
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


@register("bucketed_smb_join", oracle=_SMB_ORACLE)
def bucketed_smb_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    from swat_mapreduce_spark.functions import rounding as _R

    suffix = _uuid.uuid4().hex[:8]
    ot, lt = f"smb_orders_{suffix}", f"smb_lineitem_{suffix}"
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    for df, name, key in ((orders, ot, "o_orderkey"), (lineitem, lt, "l_orderkey")):
        (
            # repartition on the bucket key first → exactly one file
            # per bucket, so the scan's per-file sort order satisfies
            # the SMJ requirement and the local Sorts disappear too
            df.repartition(8, F.col(key))
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(name)
        )
    o, li = spark.table(ot), spark.table(lt)
    # merge hint: at small SF Catalyst would broadcast the orders side
    # and never touch the bucketed layout; the hint forces the SMJ so
    # the plan exercises (and tests/test_plans.py asserts) the
    # zero-Exchange bucket-to-bucket read this query exists to pin
    return (
        o.hint("merge").join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            _R.money_sum("l_extendedprice").alias("total_price"),
        )
    )


# --- recursive CTE (Spark 4 WITH RECURSIVE) -------------------------------
# Hierarchy walk over a deterministic binary tree on the nation table
# (parent(k) = (k-1) div 2): per-node depth and root via recursive
# union — the Spark 4 recursive-CTE surface, checked against DuckDB's
# own WITH RECURSIVE. Spark plans each recursion level as a separate
# union step; for unbounded-depth graph closure at 100 TB prefer the
# iterative checkpointed form (operators/dedup.connected_components).
_RCTE_SPARK = """
WITH RECURSIVE h(n_nationkey, n_name, depth, root) AS (
    SELECT n_nationkey, n_name, 0, n_nationkey
    FROM nation WHERE n_nationkey = 0
    UNION ALL
    SELECT c.n_nationkey, c.n_name, h.depth + 1, h.root
    FROM nation c JOIN h ON (c.n_nationkey - 1) DIV 2 = h.n_nationkey
    WHERE c.n_nationkey > 0
)
SELECT n_nationkey, n_name, depth, root FROM h
"""

_RCTE_ORACLE = """
WITH RECURSIVE h(n_nationkey, n_name, depth, root) AS (
    SELECT n_nationkey, n_name, 0, n_nationkey
    FROM nation WHERE n_nationkey = 0
    UNION ALL
    SELECT c.n_nationkey, c.n_name, h.depth + 1, h.root
    FROM nation c JOIN h ON (c.n_nationkey - 1) // 2 = h.n_nationkey
    WHERE c.n_nationkey > 0
)
SELECT n_nationkey, n_name, depth, root FROM h
"""


@register("recursive_cte_hierarchy", oracle=_RCTE_ORACLE)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(_RCTE_SPARK)


# --- schema evolution: mergeSchema across parquet generations -------------
# v1 files carry (doc_id, lang); v2 adds n_chars. mergeSchema reads
# both generations as one table with nulls for the missing column —
# the append-only schema-evolution contract every long-lived lake
# table depends on.
_MERGE_SCHEMA_ORACLE = """
SELECT lang,
       count(*) AS n_docs,
       count(n_chars) AS n_with_chars,
       sum(coalesce(n_chars, 0))::BIGINT AS total_chars
FROM (
    SELECT lang, NULL::BIGINT AS n_chars FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT lang, n_chars FROM documents WHERE doc_id % 2 = 1
)
GROUP BY lang
"""


@register("schema_evolution_merge", oracle=_MERGE_SCHEMA_ORACLE)
def schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    docs = read_table(spark, sf_dir, "documents")
    base = os.path.join(
        tempfile.gettempdir(), f"swat_evo_{uuid.uuid4().hex[:8]}"
    )
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.parquet(
        f"{base}/gen=1"
    )
    docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "n_chars"
    ).write.parquet(f"{base}/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    return merged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("n_chars").alias("n_with_chars"),
        F.sum(F.coalesce("n_chars", F.lit(0))).alias("total_chars"),
    )


# --- null-safe equality join (<=>) ----------------------------------------
# Key = nullif(event_type, 'error'): the error rows carry NULL keys.
# A plain equi-join drops them (NULL = NULL is NULL); the null-safe
# operator (<=> / IS NOT DISTINCT FROM) matches them — pinning the
# three-valued-logic corner every dedup-on-nullable-key hits.
_NULLSAFE_ORACLE = """
WITH k AS (
    SELECT event_id, nullif(event_type, 'error') AS key FROM events
),
dim(key, label) AS (
    VALUES ('click', 'interactive'), ('view', 'interactive'),
           ('purchase', 'transactional'), ('signup', 'transactional'),
           (NULL, 'failed')
)
SELECT coalesce(d.label, 'unmatched') AS label, count(*) AS n
FROM k LEFT JOIN dim d ON k.key IS NOT DISTINCT FROM d.key
GROUP BY 1
"""


@register("nullsafe_join", oracle=_NULLSAFE_ORACLE)
def nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    k = events.select(
        "event_id", F.nullif("event_type", F.lit("error")).alias("key")
    )
    dim = spark.createDataFrame(
        [
            ("click", "interactive"),
            ("view", "interactive"),
            ("purchase", "transactional"),
            ("signup", "transactional"),
            (None, "failed"),
        ],
        "key string, label string",
    )
    return (
        k.join(F.broadcast(dim), k.key.eqNullSafe(dim.key), "left")
        .groupBy(F.coalesce("label", F.lit("unmatched")).alias("label"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- IGNORE NULLS window navigation ----------------------------------------
# last_value/lag over a SPARSE column (only purchases carry a value
# here): IGNORE NULLS is the "carry forward the last real observation"
# primitive — the same gap-fill semantics the as-of join builds on
# (operators/asof.py), exposed as its own oracle-pinned surface.

_WIN_IGNULLS_ORACLE = """
WITH t AS (
    SELECT event_id, user_id, ts,
           CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
    FROM events
)
SELECT event_id, user_id,
       round(last_value(purchase_value IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 4) AS last_purchase_value,
       count(purchase_value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS n_purchases_so_far
FROM t
"""


@register("window_ignore_nulls", oracle=_WIN_IGNULLS_ORACLE)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    sparse = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        R.r(
            F.last(sparse, ignorenulls=True).over(w), 4
        ).alias("last_purchase_value"),
        F.count(sparse).over(w).alias("n_purchases_so_far"),
    )


# --- binary / crypto scalar functions --------------------------------------
# sha2-256 and base64 are directly cross-engine-comparable; AES is not
# reproducible in DuckDB, so the oracle pins its CONTRACT instead:
# decrypt(encrypt(x)) == x under a fixed key (ECB keeps the ciphertext
# deterministic too — acceptable here because the query tests the API,
# not a security posture; GCM's random IV would break rerun equality).

_CRYPTO_ORACLE = """
SELECT doc_id,
       sha256(text) AS sha_hex,
       to_base64(substr(text, 1, 12)::BLOB) AS b64_prefix,
       TRUE AS aes_roundtrip_ok
FROM documents
"""


@register("binary_crypto_funcs", oracle=_CRYPTO_ORACLE)
def binary_crypto_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    key = F.lit("0123456789abcdef")  # 16-byte AES-128 key, fixed
    enc = F.aes_encrypt(
        F.col("text").cast("binary"), key.cast("binary"), F.lit("ECB")
    )
    dec = F.aes_decrypt(enc, key.cast("binary"), F.lit("ECB"))
    return docs.select(
        "doc_id",
        F.sha2("text", 256).alias("sha_hex"),
        F.base64(F.substring("text", 1, 12).cast("binary")).alias(
            "b64_prefix"
        ),
        (dec.cast("string") == F.col("text")).alias("aes_roundtrip_ok"),
    )


# --- URL scalar functions ---------------------------------------------------
# parse_url component extraction (HOST/PATH/QUERY + keyed query param)
# over URLs synthesized from events, plus an url_encode→url_decode
# identity check. The roundtrip boolean is computed Spark-side and
# pinned TRUE by the oracle (this DuckDB build ships no url_encode/
# url_decode, and Spark's form-style '+' encoding wouldn't byte-match
# percent-style anyway — the identity is the portable contract).
_URL_ORACLE = """
WITH u AS (
    SELECT event_id,
           'https://cdn.example.com/e/' || event_type
               || '?uid=' || user_id || '&t=' || event_type AS url,
           event_type, user_id
    FROM events
)
SELECT event_id,
       'cdn.example.com' AS host,
       '/e/' || event_type AS path,
       'uid=' || user_id || '&t=' || event_type AS query,
       user_id::VARCHAR AS uid_param,
       TRUE AS enc_roundtrip_ok
FROM u
"""


@register("url_funcs", oracle=_URL_ORACLE)
def url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    url = F.concat(
        F.lit("https://cdn.example.com/e/"),
        F.col("event_type"),
        F.lit("?uid="),
        F.col("user_id"),
        F.lit("&t="),
        F.col("event_type"),
    )
    withu = ev.select("event_id", "event_type", "user_id", url.alias("url"))
    return withu.select(
        "event_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("uid")).alias("uid_param"),
        (
            F.url_decode(F.url_encode("url")) == F.col("url")
        ).alias("enc_roundtrip_ok"),
    )
