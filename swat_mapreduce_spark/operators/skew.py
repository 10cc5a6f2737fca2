"""Skew-aware join strategies for 100 TB-scale fact tables.

Spark's AQE handles moderate skew (skewJoin.enabled splits oversized
partitions), but pathological hot keys — a handful of keys owning a
double-digit percentage of a fact table — deserve the classic
hot/cold split: route hot-key rows through a broadcast join (no
shuffle of the skewed mass at all), cold keys through the normal
shuffled join, and union. Semantics are exactly an inner equi-join;
the split is purely physical.

The reference has no joins at all (SURVEY.md §2B), so this is part of
the engine's added scale surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(fact: DataFrame, key: str, min_count: int) -> list:
    """Keys whose fact-side frequency exceeds ``min_count``.

    One aggregation job; the result is collected to the driver but is
    bounded by |keys over threshold| — pick min_count so this is at
    most a few thousand values (they feed an isin() filter and a
    broadcast, both of which need small lists anyway).
    """
    rows = (
        fact.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > min_count)
        .select(key)
        .collect()
    )
    return [r[0] for r in rows]


def skew_split_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    hot: list,
) -> DataFrame:
    """Inner equi-join split by hot keys.

    hot rows:  fact ⋈ broadcast(dim_hot)  — the skewed mass never
               shuffles; each executor streams its own fact rows.
    cold rows: regular shuffled join — well-distributed by hypothesis.

    Result is the exact inner-join multiset (hot/cold partition the key
    space). Column set = fact columns + dim columns (minus dim_key).
    """
    if not hot:
        return fact.join(dim, fact[fact_key] == dim[dim_key]).drop(dim_key)
    hot_lit = [F.lit(k) for k in hot]
    fact_hot = fact.filter(F.col(fact_key).isin(hot_lit))
    fact_cold = fact.filter(~F.col(fact_key).isin(hot_lit))
    dim_hot = dim.filter(F.col(dim_key).isin(hot_lit))
    dim_cold = dim.filter(~F.col(dim_key).isin(hot_lit))
    joined_hot = fact_hot.join(
        F.broadcast(dim_hot), fact_hot[fact_key] == dim_hot[dim_key]
    ).drop(dim_key)
    joined_cold = fact_cold.join(
        dim_cold, fact_cold[fact_key] == dim_cold[dim_key]
    ).drop(dim_key)
    return joined_hot.unionByName(joined_cold)


def salted_repartition(df: DataFrame, key: str, salts: int) -> DataFrame:
    """Append a deterministic salt column and repartition on
    (key, salt) — spreads a hot key over ``salts`` partitions for
    downstream per-partition work (e.g. sortWithinPartitions,
    mapInPandas). Salt is derived from a hash of the whole row's
    monotonically varying bits, not a RNG, so replays are stable."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*df.columns), F.lit(salts)).cast("int")
    )
    return salted.repartition(F.col(key), F.col("_salt"))
