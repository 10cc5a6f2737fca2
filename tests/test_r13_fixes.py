"""Round-13 optimization internals: cosine_pre bit-identity, the
by-name identifier guard, and the persisted multi-action aggregates.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import arrays as A
from swat_mapreduce_spark.functions import text as T

SF = "/root/testdata/sf0.001"


def test_cosine_pre_bit_identical(spark):
    # cosine_pre(a, b, l2(a), l2(b)) must reproduce cosine(a, b)'s
    # EXACT double (same multiplication order), not just approximately
    # — the whole r13 norm-hoisting sweep rides on this identity.
    df = spark.range(200).select(
        F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda i: F.rand(42) * i + F.col("id") * 0.001 + 0.1,
        ).alias("a"),
        F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda i: F.rand(7) * i - F.col("id") * 0.002 + 0.2,
        ).alias("b"),
    )
    out = df.select(
        (
            A.cosine(F.col("a"), F.col("b"))
            == A.cosine_pre(
                F.col("a"),
                F.col("b"),
                A.l2_norm(F.col("a")),
                A.l2_norm(F.col("b")),
            )
        ).alias("same")
    )
    assert out.filter(~F.col("same")).count() == 0


def test_py_l2_norm_matches_engine(spark):
    vec = [0.1 * k + 0.037 for k in range(24)]
    engine = spark.range(1).select(
        A.l2_norm(F.array(*[F.lit(float(x)) for x in vec])).alias("n")
    ).first()["n"]
    assert A.py_l2_norm(vec) == engine  # bit-exact, not approx


def test_char_helpers_reject_non_identifier():
    with pytest.raises(ValueError):
        T.char_bigrams_from("lower(txt)")
    with pytest.raises(ValueError):
        T.char_shingles_from_array("cs; DROP")
    # plain identifiers still build a Column
    T.char_bigrams_from("cs")
    T.char_shingles_from_array("cs")


def test_rfm_segmentation_rows(spark):
    # the persisted tile chain must produce the same 4x4x4 census as
    # a bare global-window ntile reference on the same aggregate
    from swat_mapreduce_spark.queries import load_all
    from pyspark.sql import Window

    reg = load_all()
    out = {
        (r["r_q"], r["f_q"], r["m_q"]): r["n_customers"]
        for r in reg["rfm_segmentation"].spark_fn(spark, SF).collect()
    }
    from swat_mapreduce_spark.sources.readers import read_table

    orders = read_table(spark, SF, "orders")
    m = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(30,8)")).alias("monetary"),
    )
    ref = (
        m.select(
            F.ntile(4)
            .over(Window.orderBy(F.desc("last_order"), F.asc("o_custkey")))
            .alias("r_q"),
            F.ntile(4)
            .over(Window.orderBy(F.desc("frequency"), F.asc("o_custkey")))
            .alias("f_q"),
            F.ntile(4)
            .over(Window.orderBy(F.desc("monetary"), F.asc("o_custkey")))
            .alias("m_q"),
        )
        .groupBy("r_q", "f_q", "m_q")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    expect = {
        (r["r_q"], r["f_q"], r["m_q"]): r["n"] for r in ref.collect()
    }
    assert out == expect


def test_stream_probe_rows_match_batch_probe(spark):
    # persist=False micro-batch probing must drain exactly the batch
    # probe's rows (same docs, same index)
    from swat_mapreduce_spark.queries import load_all

    reg = load_all()
    stream_rows = sorted(
        tuple(r)
        for r in reg["stream_probe_dedup_index"].spark_fn(spark, SF).collect()
    )
    batch_rows = sorted(
        tuple(r)
        for r in reg["dedup_probe_incremental"].spark_fn(spark, SF).collect()
    )
    assert stream_rows == batch_rows
