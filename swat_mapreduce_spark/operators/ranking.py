"""Distributed global ranking / ntile.

A bare ``Window.orderBy(...)`` (no partition) funnels the whole table
through ONE task — the classic global-rank scale trap. The scalable
form mirrors ``stable_row_ids`` (queries/relational5.py): range-bucket
the sort key, count buckets (tiny job), broadcast cumulative offsets,
rank locally per bucket, and derive ntile from the global rank with
the exact SQL-ntile size formula::

    ntile_k(rank r of n) = ((r - 1) * k) DIV n + 1

which reproduces ntile's first-buckets-get-the-remainder sizing
(for n = 10, k = 4 → sizes 3,3,2,2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_global_rank(
    df: DataFrame,
    value: Column,
    tiebreak: Column,
    parts: int = 8,
    out: str = "_rank",
    num: Column | None = None,
) -> DataFrame:
    """Dense 1..N rank over ``(value ASC, tiebreak ASC)`` with
    parallelism = ``parts`` and no single-partition window.

    The bucket boundaries come from min/max of a NUMERIC projection of
    ``value`` (monotone binning only — exact order is decided by the
    per-bucket window sort, so boundary placement never affects
    correctness, only balance; skewed keys call for CDF-derived
    boundaries instead). ``num`` overrides the default double cast for
    types that don't cast numerically (timestamps: pass epoch
    seconds).

    PRECONDITION: ``num`` must be non-null on every row (SQL rank has
    a defined NULL order; this helper does not). A NULL projection
    would land in a bucket absent from the offset map and silently
    rank NULL — checked loudly below, piggybacked on the min/max job.
    """
    num = value.cast("double") if num is None else num
    tagged = df.withColumn("_v", value).withColumn("_vn", num).withColumn(
        "_tb", tiebreak
    )
    mn, mx, n_null = tagged.agg(
        F.min("_vn"),
        F.max("_vn"),
        F.count(F.when(F.col("_vn").isNull(), F.lit(1))),
    ).first()
    if n_null:
        raise ValueError(
            f"distributed_global_rank: {n_null} rows have a NULL sort "
            "projection — rank over non-null values only (filter or "
            "coalesce first)"
        )
    if mn is None or mx == mn:
        bucket = F.lit(0)
    else:
        span = mx - mn
        bucket = F.least(
            F.lit(parts - 1),
            F.floor(((F.col("_vn") - mn) * parts) / span).cast("int"),
        )
    bucketed = tagged.withColumn("_b", bucket)
    counts = {
        r["_b"]: r["c"]
        for r in bucketed.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    offsets, acc = [], 0
    for b in range(parts):
        offsets.append(acc)
        acc += counts.get(b, 0)
    offset_map = F.create_map(
        *[F.lit(x) for b in range(parts) for x in (b, offsets[b])]
    )
    w = Window.partitionBy("_b").orderBy(F.col("_v").asc(), F.col("_tb").asc())
    rank = F.element_at(offset_map, F.col("_b")) + F.row_number().over(w)
    return bucketed.withColumn(out, rank.cast("long")).drop(
        "_v", "_vn", "_tb", "_b"
    )


def distributed_ntile_desc(
    df: DataFrame,
    value: Column,
    tiebreak_asc: Column,
    k: int,
    parts: int = 8,
    out: str = "_ntile",
    num: Column | None = None,
) -> DataFrame:
    """``ntile(k) OVER (ORDER BY value DESC, tiebreak ASC)`` without a
    global window: the DESC rank is derived as ``n + 1 - rank_asc``
    over the REVERSED order ``(value ASC, tiebreak DESC)`` — an exact
    reversal even under value ties — then the ntile size formula maps
    rank to bucket."""
    # reversal trick needs a numeric tiebreak to negate; callers pass a
    # numeric key column (ids), which all engine tables have
    ranked = distributed_global_rank(
        df,
        value,
        (-tiebreak_asc).cast("double"),
        parts=parts,
        out="_r_asc",
        num=num,
    )
    n = ranked.count()
    # SQL ntile front-loads the remainder: the first (n mod k) buckets
    # hold ceil(n/k) rows, the rest floor(n/k) — NOT the even spread
    # floor((r-1)k/n) gives (which alternates big/small buckets and
    # diverges whenever k does not divide n). Piecewise integer DIV —
    # never float division, whose integer exactness dies long before
    # 1e12 rows.
    q, rem = divmod(n, k)
    with_rd = ranked.withColumn(
        "_rd", (F.lit(n) + 1 - F.col("_r_asc")).cast("long")
    )
    if q == 0:
        ntile = F.expr("CAST(_rd AS INT)")
    else:
        cut = rem * (q + 1)
        ntile = F.expr(
            f"CAST(CASE WHEN _rd <= {cut}"
            f" THEN (_rd - 1) DIV {q + 1} + 1"
            f" ELSE {rem} + (_rd - {cut} - 1) DIV {q} + 1 END AS INT)"
        )
    return with_rd.withColumn(out, ntile).drop("_r_asc", "_rd")
