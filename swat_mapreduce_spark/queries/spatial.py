"""Spatial ops: grid-cell-blocked radius join over synthetic
coordinates derived deterministically from the embeddings table
(dims 1-2 scaled to lat/lon — the testdata has no native geo columns;
the *blocking machinery* is the operator under test and is real).

Neighbor-cell blocking is the spatial sibling of LSH bucketing: pair
candidates must share a grid cell OR touch one of its 8 neighbors, so
the candidate volume is Σ|cell|·|neighborhood| — density-bounded,
never N². Cell size is chosen ≥ the radius in degrees at every
latitude in range, which makes the blocking EXACT (no missed pairs),
unlike LSH's probabilistic recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swat_mapreduce_spark.functions import rounding as R
from swat_mapreduce_spark.queries import register
from swat_mapreduce_spark.sources.readers import read_table

_LAT_SCALE = 100.0  # dim1 (±0.4) → ±40°
_LON_SCALE = 150.0  # dim2 (±0.41) → ±62°
_RADIUS_KM = 100.0
# Cell must cover the radius in BOTH axes for neighbor-cell blocking to
# be exact: 100 km of latitude ≈ 0.90°, and 100 km of longitude at the
# LATITUDE bound (it is latitude, via cos(lat), that shrinks longitude
# degrees — longitude's own ±62° span is irrelevant to cell width).
# Testdata latitude (embedding[1]·100, gaussian-ish) peaks ≈ ±41°
# (0.90/cos 41° ≈ 1.19°); we enforce exactness up to _LAT_EXACT_BOUND
# = 60° (0.90/cos 60° ≈ 1.80° ≤ 2.0°) via _assert_blocking_exact below
# and pin the data premise in tests/test_llm_ops.py.
_CELL_DEG = 2.0
_LAT_EXACT_BOUND = 60.0
_EARTH_KM = 6371.0

import math as _math

def _assert_blocking_exact() -> None:
    deg_per_km_lat = 360.0 / (2 * _math.pi * _EARTH_KM)
    lon_deg = (
        _RADIUS_KM * deg_per_km_lat
        / _math.cos(_math.radians(_LAT_EXACT_BOUND))
    )
    lat_deg = _RADIUS_KM * deg_per_km_lat
    assert max(lon_deg, lat_deg) <= _CELL_DEG, (
        f"cell {_CELL_DEG}° < radius in degrees ({lon_deg:.3f}) at "
        f"|lat| = {_LAT_EXACT_BOUND}° — neighbor-cell blocking would "
        "MISS pairs; widen _CELL_DEG or lower _LAT_EXACT_BOUND"
    )

_assert_blocking_exact()

_POINTS_DUCK = f"""
pts AS (
    SELECT vec_id,
           embedding[1]::DOUBLE * {_LAT_SCALE} AS lat,
           embedding[2]::DOUBLE * {_LON_SCALE} AS lon
    FROM embeddings
)
"""

# haversine(a, b) in km; same double formula in both engines
_HAV_DUCK = (
    f"2 * {_EARTH_KM} * asin(sqrt("
    "pow(sin(radians(b.lat - a.lat) / 2), 2)"
    " + cos(radians(a.lat)) * cos(radians(b.lat))"
    " * pow(sin(radians(b.lon - a.lon) / 2), 2)))"
)

_GRID_JOIN_ORACLE = f"""
WITH {_POINTS_DUCK},
cells AS (
    SELECT vec_id, lat, lon,
           floor(lat / {_CELL_DEG})::BIGINT AS cy,
           floor(lon / {_CELL_DEG})::BIGINT AS cx
    FROM pts
),
probe AS (
    SELECT c.vec_id, c.lat, c.lon,
           c.cy + dy.d AS py, c.cx + dx.d AS px
    FROM cells c,
         generate_series(-1, 1) AS dy(d),
         generate_series(-1, 1) AS dx(d)
),
pairs AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_HAV_DUCK} * 100) / 100 + 0.0 AS dist_km
    FROM probe a
    JOIN cells b ON b.cy = a.py AND b.cx = a.px
                AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, dist_km
FROM pairs WHERE dist_km <= {_RADIUS_KM}
"""


@register("spatial_grid_radius_join", oracle=_GRID_JOIN_ORACLE)
def spatial_grid_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        (F.element_at(F.col("embedding"), 1).cast("double") * _LAT_SCALE)
        .alias("lat"),
        (F.element_at(F.col("embedding"), 2).cast("double") * _LON_SCALE)
        .alias("lon"),
    )
    cells = pts.select(
        "vec_id",
        "lat",
        "lon",
        F.floor(F.col("lat") / _CELL_DEG).alias("cy"),
        F.floor(F.col("lon") / _CELL_DEG).alias("cx"),
    )
    offsets = F.expr(
        "explode(flatten(transform(sequence(-1, 1), dy ->"
        " transform(sequence(-1, 1), dx -> struct(dy, dx)))))"
    )
    probe = cells.select(
        F.col("vec_id").alias("vec_a"),
        F.col("lat").alias("a_lat"),
        F.col("lon").alias("a_lon"),
        "cy",
        "cx",
        offsets.alias("o"),
    ).select(
        "vec_a",
        "a_lat",
        "a_lon",
        (F.col("cy") + F.col("o.dy")).alias("py"),
        (F.col("cx") + F.col("o.dx")).alias("px"),
    )
    b = cells.select(
        F.col("vec_id").alias("vec_b"),
        F.col("lat").alias("b_lat"),
        F.col("lon").alias("b_lon"),
        "cy",
        "cx",
    )
    hav = (
        2
        * _EARTH_KM
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("b_lat") - F.col("a_lat")) / 2), 2)
                + F.cos(F.radians("a_lat"))
                * F.cos(F.radians("b_lat"))
                * F.pow(
                    F.sin(F.radians(F.col("b_lon") - F.col("a_lon")) / 2), 2
                )
            )
        )
    )
    return (
        probe.join(
            b,
            (F.col("py") == F.col("cy"))
            & (F.col("px") == F.col("cx"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b", R.r(hav, 2).alias("dist_km"))
        .filter(F.col("dist_km") <= _RADIUS_KM)
    )


# --- per-cell density stats (the "geohash aggregation" shape) --------------
# The other standard spatial primitive: bucket points into grid cells
# and aggregate per cell — one shuffle on the cell key, |cells|-row
# output, the spatial analog of a groupBy day. Reports the densest
# cells (top 20 by count, tie-broken by cell coords).
_CELL_STATS_ORACLE = f"""
WITH {_POINTS_DUCK},
cells AS (
    SELECT floor(lat / {_CELL_DEG})::BIGINT AS cy,
           floor(lon / {_CELL_DEG})::BIGINT AS cx,
           lat, lon
    FROM pts
)
SELECT cy, cx, count(*)::BIGINT AS n_points,
       round(avg(lat) * 10000) / 10000 + 0.0 AS centroid_lat,
       round(avg(lon) * 10000) / 10000 + 0.0 AS centroid_lon
FROM cells GROUP BY cy, cx
ORDER BY n_points DESC, cy, cx
LIMIT 20
"""


@register("spatial_cell_density", oracle=_CELL_STATS_ORACLE)
def spatial_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        (F.element_at(F.col("embedding"), 1).cast("double") * _LAT_SCALE)
        .alias("lat"),
        (F.element_at(F.col("embedding"), 2).cast("double") * _LON_SCALE)
        .alias("lon"),
    )
    return (
        pts.select(
            F.floor(F.col("lat") / _CELL_DEG).alias("cy"),
            F.floor(F.col("lon") / _CELL_DEG).alias("cx"),
            "lat",
            "lon",
        )
        .groupBy("cy", "cx")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            (F.round(F.avg("lat") * 10000.0) / 10000.0 + 0.0).alias(
                "centroid_lat"
            ),
            (F.round(F.avg("lon") * 10000.0) / 10000.0 + 0.0).alias(
                "centroid_lon"
            ),
        )
        .orderBy(F.desc("n_points"), "cy", "cx")
        .limit(20)
    )


# --- DBSCAN point classification (core / border / noise) -------------------------
# The density-clustering front half of DBSCAN (Ester et al. 1996)
# over the synthetic geo points: eps = 50 km, minPts = 4 neighbors —
# a point is CORE with >= minPts others within eps, BORDER if not
# core but within eps of a core, NOISE otherwise. Neighbor pairs come
# from the same exact grid-cell blocking as spatial_grid_radius_join
# (cell 2° covers 50 km everywhere the radius-100 bound already
# holds), so candidate volume stays density-bounded — never N². The
# eps comparison runs on the 2dp-snapped haversine (the family's
# established cross-engine distance grid). Output: one bounded
# summary row.
_DBSCAN_EPS_KM = 50.0
_DBSCAN_MINPTS = 4

_DBSCAN_ORACLE = f"""
WITH {_POINTS_DUCK},
cells AS (
    SELECT vec_id, lat, lon,
           floor(lat / {_CELL_DEG})::BIGINT AS cy,
           floor(lon / {_CELL_DEG})::BIGINT AS cx
    FROM pts
),
probe AS (
    SELECT c.vec_id, c.lat, c.lon,
           c.cy + dy.d AS py, c.cx + dx.d AS px
    FROM cells c,
         generate_series(-1, 1) AS dy(d),
         generate_series(-1, 1) AS dx(d)
),
nbr AS (
    SELECT a.vec_id AS va, b.vec_id AS vb
    FROM probe a
    JOIN cells b ON b.cy = a.py AND b.cx = a.px
                AND a.vec_id <> b.vec_id
    WHERE round({_HAV_DUCK} * 100) / 100 <= {_DBSCAN_EPS_KM}
),
deg AS (SELECT va, count(*)::BIGINT AS k FROM nbr GROUP BY va),
core AS (SELECT va FROM deg WHERE k >= {_DBSCAN_MINPTS}),
border AS (
    SELECT DISTINCT n.va
    FROM nbr n JOIN core c ON c.va = n.vb
    WHERE n.va NOT IN (SELECT va FROM core)
)
SELECT (SELECT count(*) FROM pts)::BIGINT AS n_points,
       (SELECT count(*) FROM core)::BIGINT AS n_core,
       (SELECT count(*) FROM border)::BIGINT AS n_border,
       ((SELECT count(*) FROM pts) - (SELECT count(*) FROM core)
        - (SELECT count(*) FROM border))::BIGINT AS n_noise,
       (SELECT max(k) FROM deg)::BIGINT AS max_neighbors
"""


@register("dbscan_core_points", oracle=_DBSCAN_ORACLE)
def dbscan_core_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        (F.element_at(F.col("embedding"), 1).cast("double") * _LAT_SCALE)
        .alias("lat"),
        (F.element_at(F.col("embedding"), 2).cast("double") * _LON_SCALE)
        .alias("lon"),
    )
    cells = pts.select(
        "vec_id",
        "lat",
        "lon",
        F.floor(F.col("lat") / _CELL_DEG).alias("cy"),
        F.floor(F.col("lon") / _CELL_DEG).alias("cx"),
    ).persist()
    offsets = F.expr(
        "explode(flatten(transform(sequence(-1, 1), dy ->"
        " transform(sequence(-1, 1), dx -> struct(dy, dx)))))"
    )
    probe = cells.select(
        F.col("vec_id").alias("va"),
        F.col("lat").alias("a_lat"),
        F.col("lon").alias("a_lon"),
        "cy",
        "cx",
        offsets.alias("o"),
    ).select(
        "va",
        "a_lat",
        "a_lon",
        (F.col("cy") + F.col("o.dy")).alias("py"),
        (F.col("cx") + F.col("o.dx")).alias("px"),
    )
    bb = cells.select(
        F.col("vec_id").alias("vb"),
        F.col("lat").alias("b_lat"),
        F.col("lon").alias("b_lon"),
        F.col("cy").alias("bcy"),
        F.col("cx").alias("bcx"),
    )
    hav = (
        F.lit(2.0 * _EARTH_KM)
        * F.asin(
            F.sqrt(
                F.pow(
                    F.sin(F.radians(F.col("b_lat") - F.col("a_lat")) / 2), 2
                )
                + F.cos(F.radians("a_lat"))
                * F.cos(F.radians("b_lat"))
                * F.pow(
                    F.sin(F.radians(F.col("b_lon") - F.col("a_lon")) / 2),
                    2,
                )
            )
        )
    )
    nbr = (
        probe.join(
            bb,
            (F.col("bcy") == F.col("py"))
            & (F.col("bcx") == F.col("px"))
            & (F.col("va") != F.col("vb")),
        )
        .filter(F.round(hav * 100) / 100 <= F.lit(_DBSCAN_EPS_KM))
        .select("va", "vb")
        .persist()
    )
    deg = nbr.groupBy("va").agg(F.count(F.lit(1)).cast("long").alias("k"))
    core = deg.filter(F.col("k") >= _DBSCAN_MINPTS).select("va")
    border = (
        nbr.join(
            F.broadcast(core.select(F.col("va").alias("vb"))), "vb"
        )
        .select("va")
        .join(F.broadcast(core), "va", "left_anti")
        .distinct()
    )
    n_points = pts.count()
    n_core = core.count()
    n_border = border.count()
    max_k = deg.agg(F.max("k").alias("m")).first()["m"]
    nbr.unpersist()
    cells.unpersist()
    return spark.createDataFrame(
        [
            (
                n_points,
                n_core,
                n_border,
                n_points - n_core - n_border,
                int(max_k) if max_k is not None else None,
            )
        ],
        "n_points long, n_core long, n_border long, n_noise long,"
        " max_neighbors long",
    )


# --- blocked k-nearest-neighbor join ----------------------------------------------
# The kNN companion to the radius join: for a FIXED-COUNT hash-ordered
# sample of 16 query points (CLAUDE.md gotcha 14 — never a corpus
# fraction), the 5 nearest neighbors WITHIN THE 3×3 CELL NEIGHBORHOOD
# — the same probe-bounded semantic as an IVF index probe (documented:
# a neighbor outside the 3×3 block is out of scope by construction,
# exactly like nprobe-bounded IVF recall; the 2° cell ≥ 100 km makes
# anything missed ≥ ~100 km away). Ranking runs on the family's
# 2dp-snapped haversine as an exact integer centi-km key with vec_id
# tie-break, so top-5 cuts are exact on both engines. Scale: candidate
# volume = 16 queries × bounded neighborhood density; ranking windows
# are PARTITIONED per query.
_KNN_Q = 16
_KNN_K = 5

from swat_mapreduce_spark.functions import hashing as _H

_KNN_HASH_DUCK = _H.duck_hash_uint(_H.sql_salted("vec_id", "'knn'"), 8)

_KNN_ORACLE = f"""
WITH {_POINTS_DUCK},
cells AS (
    SELECT vec_id, lat, lon,
           floor(lat / {_CELL_DEG})::BIGINT AS cy,
           floor(lon / {_CELL_DEG})::BIGINT AS cx
    FROM pts
),
q AS (
    SELECT vec_id, lat, lon, cy, cx FROM cells
    ORDER BY {_KNN_HASH_DUCK}, vec_id
    LIMIT {_KNN_Q}
),
probe AS (
    SELECT q.vec_id, q.lat, q.lon,
           q.cy + dy.d AS py, q.cx + dx.d AS px
    FROM q, generate_series(-1, 1) AS dy(d),
            generate_series(-1, 1) AS dx(d)
),
cand AS (
    SELECT a.vec_id AS q_vec, b.vec_id AS n_vec,
           CAST(round({_HAV_DUCK} * 100) AS BIGINT) AS dist_cm
    FROM probe a
    JOIN cells b ON b.cy = a.py AND b.cx = a.px
                AND b.vec_id <> a.vec_id
),
ranked AS (
    SELECT q_vec, n_vec, dist_cm,
           row_number() OVER (PARTITION BY q_vec
                              ORDER BY dist_cm, n_vec) AS rk
    FROM cand
)
SELECT q_vec, rk::BIGINT AS rank, n_vec,
       round(dist_cm * 1.0 / 100 * 100) / 100 + 0.0 AS dist_km
FROM ranked WHERE rk <= {_KNN_K}
"""


@register("spatial_knn_blocked", oracle=_KNN_ORACLE)
def spatial_knn_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        (F.element_at(F.col("embedding"), 1).cast("double") * _LAT_SCALE)
        .alias("lat"),
        (F.element_at(F.col("embedding"), 2).cast("double") * _LON_SCALE)
        .alias("lon"),
    )
    cells = pts.select(
        "vec_id",
        "lat",
        "lon",
        F.floor(F.col("lat") / _CELL_DEG).alias("cy"),
        F.floor(F.col("lon") / _CELL_DEG).alias("cx"),
    )
    q = cells.orderBy(
        _H.hash_uint(F.col("vec_id"), "knn", 8), F.asc("vec_id")
    ).limit(_KNN_Q)
    offsets = F.expr(
        "explode(flatten(transform(sequence(-1, 1), dy ->"
        " transform(sequence(-1, 1), dx -> struct(dy, dx)))))"
    )
    probe = q.select(
        F.col("vec_id").alias("q_vec"),
        F.col("lat").alias("a_lat"),
        F.col("lon").alias("a_lon"),
        "cy",
        "cx",
        offsets.alias("o"),
    ).select(
        "q_vec",
        "a_lat",
        "a_lon",
        (F.col("cy") + F.col("o.dy")).alias("py"),
        (F.col("cx") + F.col("o.dx")).alias("px"),
    )
    b = cells.select(
        F.col("vec_id").alias("n_vec"),
        F.col("lat").alias("b_lat"),
        F.col("lon").alias("b_lon"),
        "cy",
        "cx",
    )
    hav = (
        2
        * _EARTH_KM
        * F.asin(
            F.sqrt(
                F.pow(
                    F.sin(F.radians(F.col("b_lat") - F.col("a_lat")) / 2),
                    2,
                )
                + F.cos(F.radians("a_lat"))
                * F.cos(F.radians("b_lat"))
                * F.pow(
                    F.sin(
                        F.radians(F.col("b_lon") - F.col("a_lon")) / 2
                    ),
                    2,
                )
            )
        )
    )
    cand = (
        F.broadcast(probe)
        .join(
            b,
            (F.col("py") == F.col("cy"))
            & (F.col("px") == F.col("cx"))
            & (F.col("n_vec") != F.col("q_vec")),
        )
        .select(
            "q_vec",
            "n_vec",
            F.round(hav * 100).cast("long").alias("dist_cm"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_vec").orderBy("dist_cm", "n_vec")
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _KNN_K)
        .select(
            "q_vec",
            "rank",
            "n_vec",
            R.r(F.col("dist_cm") * F.lit(1.0) / 100, 2).alias("dist_km"),
        )
    )
