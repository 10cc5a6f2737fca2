"""Portable deterministic hashing — identical in Spark SQL and DuckDB.

The engine's deterministic stand-in for model logits (FIXTURES.md §B3)
and all LSH/minhash machinery are built on md5 so that every derived
number is bit-identical between the Spark implementation and the DuckDB
oracle: both engines agree on ``md5(utf8_string)`` and on hex→int
conversion, so ``hash_uint(expr, salt, nibbles)`` is the one shared
primitive.

Spark side: ``conv(substr(md5(x),1,n),16,10)`` (JVM, codegen'd).
DuckDB side: ``('0x' || substr(md5(x),1,n))::BIGINT``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def salted(col: Column, salt) -> Column:
    """``concat(col, ':', salt)`` — the canonical salting layout."""
    return F.concat(col.cast("string"), F.lit(":"), F.lit(str(salt)))


def hash_hex(col: Column, nibbles: int = 8) -> Column:
    """First ``nibbles`` hex chars of md5(col)."""
    return F.substring(F.md5(col.cast("string")), 1, nibbles)


def hash_uint(col: Column, salt=None, nibbles: int = 8) -> Column:
    """Deterministic uniform uint in [0, 16**nibbles) from md5.

    JVM-side only (md5 + conv + cast) — stays inside whole-stage
    codegen; no Python boundary.
    """
    s = salted(col, salt) if salt is not None else col.cast("string")
    return F.conv(hash_hex(s, nibbles), 16, 10).cast("bigint")


def hash_unit(col: Column, salt=None, nibbles: int = 8) -> Column:
    """Deterministic uniform double in [0, 1)."""
    return hash_uint(col, salt, nibbles) / float(16**nibbles)


# ---------------------------------------------------------------------------
# SQL-string builders (both dialects) — used to author oracle SQL that is
# guaranteed to agree with the Column builders above.
# ---------------------------------------------------------------------------

def sql_salted(expr: str, salt_expr: str) -> str:
    return f"({expr}) || ':' || ({salt_expr})"


def spark_hash_uint(expr: str, nibbles: int = 8) -> str:
    return f"cast(conv(substr(md5({expr}),1,{nibbles}),16,10) as bigint)"


def duck_hash_uint(expr: str, nibbles: int = 8) -> str:
    return f"('0x' || substr(md5({expr}),1,{nibbles}))::BIGINT"


# --- deterministic logits (FIXTURES.md §B3 stand-in for the model) ---------
# Block-derived: one md5 digest yields EIGHT 4-nibble logits, so a
# 30-class score vector costs ceil(30/8)=4 md5 calls per row instead of
# 30 — this is the hot path of the flagship pipeline, and hash CPU is
# the whole cost of the stand-in model at scale.
#   block b = md5(path || ':' || (i div 8)); logit_i = int(hex nibbles
#   [4*(i%8), 4*(i%8)+4) of block, 16)/4096 - 8  ∈ [-8, 8)
# decode_ok(path): first byte of md5(path||':decode') >= 13 (~5% failures,
# FIXTURES.md §B3's decode_ok=false fraction).

LOGIT_NIBBLES = 4
LOGIT_PER_BLOCK = 32 // LOGIT_NIBBLES  # 8 logits per md5 digest
LOGIT_SCALE = 4096.0
LOGIT_SHIFT = 8.0
DECODE_SALT = "decode"
DECODE_FAIL_BELOW = 13  # P(fail) = 13/256 ≈ 5%


def logit(col: Column, i) -> Column:
    """Deterministic pseudo-logit for class ``i`` of ``col`` (a path)."""
    block, off = divmod(int(i), LOGIT_PER_BLOCK)
    nib = F.substring(
        F.md5(salted(col, block)), off * LOGIT_NIBBLES + 1, LOGIT_NIBBLES
    )
    return (
        F.conv(nib, 16, 10).cast("bigint") / LOGIT_SCALE - LOGIT_SHIFT
    )


def logits_array(col: Column, n: int = 30) -> Column:
    """Length-``n`` array<double> of deterministic logits — pure JVM
    expressions, mirrors the model score vector shape
    (``python/predict_batch_threaded_local.py:113-115``).

    Block-derived: the ceil(n/8) md5 digests are materialized ONCE in
    an array-of-blocks expression and the single-level lambda only
    slices nibbles out of them — ceil(n/8) md5 evaluations per row
    (4 for n=30) instead of one per class. The lambda references the
    outer ``blocks`` column expression, never another lambda's
    variable, so the nested-lambda name-collision hazard (see round-1
    minhash incident, CLAUDE.md gotcha 1) does not apply."""
    n_blocks = (n + LOGIT_PER_BLOCK - 1) // LOGIT_PER_BLOCK
    blocks = F.array(*[F.md5(salted(col, b)) for b in range(n_blocks)])
    return F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: F.conv(
            F.substr(
                F.element_at(blocks, (i / LOGIT_PER_BLOCK).cast("int") + 1),
                (i % LOGIT_PER_BLOCK) * LOGIT_NIBBLES + 1,
                F.lit(LOGIT_NIBBLES),
            ),
            16,
            10,
        ).cast("bigint")
        / LOGIT_SCALE
        - LOGIT_SHIFT,
    )


def decode_ok(col: Column) -> Column:
    """~95% true; stands in for PIL decode success
    (``python/predict_batch_threaded_local.py:100-108``)."""
    return hash_uint(col, DECODE_SALT, 2) >= DECODE_FAIL_BELOW


def duck_logit(path_expr: str, i_expr: str) -> str:
    block = f"(({i_expr}) // {LOGIT_PER_BLOCK})"
    off = f"((({i_expr}) % {LOGIT_PER_BLOCK}) * {LOGIT_NIBBLES} + 1)"
    nib = f"substr(md5({sql_salted(path_expr, block)}), {off}, {LOGIT_NIBBLES})"
    return f"('0x' || {nib})::BIGINT/{LOGIT_SCALE} - {LOGIT_SHIFT}"


def duck_decode_ok(path_expr: str) -> str:
    h = duck_hash_uint(sql_salted(path_expr, f"'{DECODE_SALT}'"), 2)
    return f"{h} >= {DECODE_FAIL_BELOW}"
