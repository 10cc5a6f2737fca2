"""As-of join and gap-based sessionization — operators Spark lacks as
built-ins, composed from union+window (no ``applyInPandas`` needed, so
the whole plan stays JVM-side and scales with one shuffle per window).

As-of join strategy (the standard Spark formulation):
  1. union the left ("probe") and right ("quote") streams with a kind
     tag, right-before-left on timestamp ties;
  2. one window per key ordered by (ts, kind, id):
     ``last(right_value, ignoreNulls)`` over unbounded-preceding..current
     carries the most recent right-side value forward;
  3. keep only left rows.
One shuffle (the window partitionBy) — same cost as a regular join.
A merge_asof via ``applyInPandas`` would ship both streams to Python;
this stays in Tungsten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` and equal key. Ties (equal ts) match."""
    right_cols = right_cols or []
    # Carry ALL right-side values in ONE struct so last(..., ignorenulls)
    # picks every asof_* value from the SAME right row — per-column
    # last(ignorenulls) could mix rows when the matched row holds a NULL
    # in one right_col (ADVICE r4). The struct is NULL (as a whole) on
    # left rows, so ignorenulls skips exactly the non-right rows.
    r_struct = F.struct(
        F.col(right_ts).cast("timestamp").alias("_rts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r_struct_t = right.select(r_struct.alias("_r")).schema["_r"].dataType
    l_tag = left.select(
        F.col(on).alias("_key"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_kind"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_struct_t).alias("_r"),
    )
    r_tag = right.select(
        F.col(on).alias("_key"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_kind"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_r"),
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_key")
        .orderBy("_ts", "_kind")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "_l",
        F.last("_r", ignorenulls=True).over(w).alias("_asof"),
        "_kind",
    ).filter(F.col("_kind") == 1)
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    return carried.select(
        *out_cols,
        F.col("_asof._rts").alias("asof_ts"),
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in right_cols],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the EARLIEST right row with
    ``right.ts >= left.ts`` and equal key (ties match) — the forward
    direction pandas ``merge_asof(direction='forward')`` / QuestDB
    ``LT JOIN`` mirror of :func:`asof_join`. With ``tolerance_seconds``
    set, matches farther than the tolerance are nulled out (the row is
    kept, unmatched — merge_asof semantics).

    Same one-shuffle union+window shape as the backward form, with the
    frame flipped to current-row..unbounded-following and ``first``
    instead of ``last``. Within a timestamp tie, left rows sort before
    right rows so the tying right row lands inside the frame. Callers
    with duplicate (key, ts) right rows should pre-dedup them — window
    order among identical keys would otherwise be nondeterministic.
    """
    right_cols = right_cols or []
    # Single-struct carry: see asof_join — guarantees all asof_* values
    # come from the one matched (earliest) right row even when some of
    # its right_cols are NULL (ADVICE r4).
    r_struct = F.struct(
        F.col(right_ts).cast("timestamp").alias("_rts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r_struct_t = right.select(r_struct.alias("_r")).schema["_r"].dataType
    l_tag = left.select(
        F.col(on).alias("_key"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_kind"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_struct_t).alias("_r"),
    )
    r_tag = right.select(
        F.col(on).alias("_key"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_kind"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_r"),
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_key")
        .orderBy("_ts", "_kind")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = u.select(
        "_l",
        F.first("_r", ignorenulls=True).over(w).alias("_asof"),
        "_kind",
    ).filter(F.col("_kind") == 0)
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out = carried.select(
        *out_cols,
        F.col("_asof._rts").alias("asof_ts"),
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in right_cols],
    )
    if tolerance_seconds is not None:
        within = (
            F.unix_micros(F.col("asof_ts"))
            - F.unix_micros(F.col(left_ts))
        ) <= tolerance_seconds * 1_000_000
        out = out.select(
            *left.columns,
            F.when(within, F.col("asof_ts")).alias("asof_ts"),
            *[
                F.when(within, F.col(f"asof_{c}")).alias(f"asof_{c}")
                for c in right_cols
            ],
        )
    return out


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the right row with equal key whose
    timestamp is CLOSEST in EITHER direction — pandas
    ``merge_asof(direction='nearest')``. Equidistant ties take the
    backward (earlier) right row, pandas' convention. With
    ``tolerance_seconds``, matches farther than the tolerance are
    nulled out (row kept, unmatched). Adds ``asof_dir`` ('backward' /
    'forward' / NULL when unmatched).

    Still ONE shuffle: the backward carry (``last`` over
    unbounded-preceding..current) and the forward carry (``first``
    over current..unbounded-following) share the same
    partitionBy/orderBy, so Spark evaluates both in a single
    WindowExec over one hash exchange; the closer candidate is picked
    row-locally. Right rows sort BEFORE left rows on timestamp ties,
    so a tying right row lands in the backward frame at distance 0 —
    which the tie rule awards to backward regardless. Callers with
    duplicate (key, ts) right rows should pre-dedup them (same
    determinism caveat as :func:`asof_join_forward`).
    """
    right_cols = right_cols or []
    # Single-struct carry (see asof_join): every asof_* value comes
    # from ONE right row even when some right_cols are NULL.
    r_struct = F.struct(
        F.col(right_ts).cast("timestamp").alias("_rts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r_struct_t = right.select(r_struct.alias("_r")).schema["_r"].dataType
    l_tag = left.select(
        F.col(on).alias("_key"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_kind"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_struct_t).alias("_r"),
    )
    r_tag = right.select(
        F.col(on).alias("_key"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_kind"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_r"),
    )
    u = l_tag.unionByName(r_tag)
    order = Window.partitionBy("_key").orderBy("_ts", "_kind")
    w_back = order.rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = order.rowsBetween(0, Window.unboundedFollowing)
    carried = u.select(
        "_l",
        "_ts",
        F.last("_r", ignorenulls=True).over(w_back).alias("_b"),
        F.first("_r", ignorenulls=True).over(w_fwd).alias("_f"),
        "_kind",
    ).filter(F.col("_kind") == 1)
    d_back = F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_b._rts"))
    d_fwd = F.unix_micros(F.col("_f._rts")) - F.unix_micros(F.col("_ts"))
    # tie (d_back == d_fwd) → backward, pandas merge_asof convention
    take_fwd = F.col("_b").isNull() | (
        F.col("_f").isNotNull() & (d_fwd < d_back)
    )
    picked = carried.select(
        "_l",
        "_ts",
        F.when(take_fwd, F.col("_f")).otherwise(F.col("_b")).alias("_asof"),
        F.when(
            F.col("_b").isNull() & F.col("_f").isNull(),
            F.lit(None).cast("string"),
        )
        .when(take_fwd, F.lit("forward"))
        .otherwise(F.lit("backward"))
        .alias("asof_dir"),
    )
    if tolerance_seconds is not None:
        dist = F.abs(
            F.unix_micros(F.col("_asof._rts")) - F.unix_micros(F.col("_ts"))
        )
        within = dist <= tolerance_seconds * 1_000_000
        picked = picked.select(
            "_l",
            F.when(within, F.col("_asof")).alias("_asof"),
            F.when(within, F.col("asof_dir")).alias("asof_dir"),
        )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    return picked.select(
        *out_cols,
        F.col("_asof._rts").alias("asof_ts"),
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in right_cols],
        "asof_dir",
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the previous event of the same key is >= gap (session-window
    end-exclusive semantics, matching Structured Streaming's
    ``session_window``). Adds ``session_num`` (1-based per key)."""
    order_cols = order_cols or [ts]
    w = Window.partitionBy(key).orderBy(*order_cols)
    gap_us = gap_seconds * 1_000_000
    prev = F.lag(F.unix_micros(F.col(ts))).over(w)
    is_new = F.when(
        prev.isNull() | (F.unix_micros(F.col(ts)) - prev >= gap_us), 1
    ).otherwise(0)
    return events.withColumn(
        "session_num",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
