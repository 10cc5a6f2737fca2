"""Entity resolution: blocked fuzzy matching → transitive clustering
→ survivorship — the master-data-management pipeline over the parts
catalog.

``entity_resolution_parts`` treats each part row as a product *record*
and resolves records describing the same product:

1. **Blocking** on (name noun, type, size) — candidate pairs only
   form inside a block, so comparison volume is Σ block², never
   corpus² (the same discipline as the LSH dedup family), and the
   whole block key rides ONE equi-join; only the edit-distance
   predicate is post-join. (Size is exact-match by design: a ±k size
   tolerance chains sizes transitively into corpus-spanning
   components with O(size-range) diameter — the classic ER
   over-merge failure; exact size keeps cluster diameter at the
   adjective-chain length, ≤ ~12 observed at sf0.1.)
2. **Matching**: levenshtein(adjective) ≤ 2 — a JVM-side built-in,
   no Python in the pair loop.
3. **Transitive clustering** via iterative min-label propagation
   (operators/dedup.connected_components — O(diameter) rounds,
   lineage-checkpointed). The synthetic adjectives chain
   cold~old~red~new at distance ≤ 2, so the closure genuinely merges
   chains a pairwise join would miss — the classic ER over-merge the
   operator must reproduce faithfully.
4. **Survivorship**: per cluster elect the min-id record's name as
   canonical (unique-key min_by — CLAUDE.md gotcha 9 satisfied by
   p_partkey uniqueness), keep the max price as the surviving value,
   and report how many distinct brands the duplicate listings
   straddle.

Oracle: the same blocked pairs, closed under a recursive CTE
(min reachable id == propagated label — same shape as the near-dup
component oracle in queries/dedup.py).

100 TB posture: parts is a dimension table, but the shape is the
scale shape regardless — blocking bounds pair volume, label
propagation is a per-round (neighbor-min aggregate + label join)
shuffle pair over the edge list only, and survivorship is one
groupBy over cluster members.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.operators.dedup import connected_components
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

_LEV_MAX = 2

_ER_ORACLE = f"""
WITH RECURSIVE p AS (
    SELECT p_partkey AS k, split_part(p_name, ' ', 1) AS adj,
           split_part(p_name, ' ', 2) AS noun, p_type AS t, p_size AS s
    FROM part
),
edges AS (
    SELECT a.k AS u, b.k AS v
    FROM p a JOIN p b
      ON a.noun = b.noun AND a.t = b.t AND a.s = b.s AND a.k < b.k
     AND levenshtein(a.adj, b.adj) <= {_LEV_MAX}
),
sym AS (
    SELECT u, v FROM edges UNION SELECT v, u FROM edges
),
reach(u, v) AS (
    SELECT u, v FROM sym
    UNION
    SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
),
comp AS (
    SELECT u AS k, least(u, min(v)) AS cluster_id
    FROM reach GROUP BY u
)
SELECT c.cluster_id,
       count(*)::BIGINT AS n_members,
       min_by(pt.p_name, pt.p_partkey) AS canonical_name,
       round(max(pt.p_retailprice) * 100) / 100 + 0.0 AS survivor_price,
       min(pt.p_size)::BIGINT AS size,
       count(DISTINCT pt.p_brand)::BIGINT AS n_brands
FROM comp c JOIN part pt ON pt.p_partkey = c.k
GROUP BY c.cluster_id
"""


@register("entity_resolution_parts", oracle=_ER_ORACLE)
def entity_resolution_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    p = part.select(
        F.col("p_partkey").alias("k"),
        F.split("p_name", " ").getItem(0).alias("adj"),
        F.split("p_name", " ").getItem(1).alias("noun"),
        F.col("p_type").alias("t"),
        F.col("p_size").alias("s"),
    )
    a, bb = p.alias("a"), p.alias("b")
    edges = (
        a.join(
            bb,
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.t") == F.col("b.t"))
            & (F.col("a.s") == F.col("b.s"))
            & (F.col("a.k") < F.col("b.k"))
            & (
                F.levenshtein(F.col("a.adj"), F.col("b.adj")) <= _LEV_MAX
            ),
        )
        .select(F.col("a.k").alias("u"), F.col("b.k").alias("v"))
    )
    comp = connected_components(edges, src="u", dst="v")
    members = comp.select(
        F.col("node").alias("k"), F.col("component").alias("cluster_id")
    ).join(part, F.col("k") == F.col("p_partkey"))
    return members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min_by("p_name", "p_partkey").alias("canonical_name"),
        R.r(F.max("p_retailprice"), 2).alias("survivor_price"),
        F.min("p_size").cast("long").alias("size"),
        F.countDistinct("p_brand").alias("n_brands"),
    )
