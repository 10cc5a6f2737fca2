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
# logit_i(path) = hash_uint(path||':'||i, 4 nibbles)/4096 - 8  ∈ [-8, 8)
# decode_ok(path): first byte of md5(path||':decode') >= 13 (~5% failures,
# FIXTURES.md §B3's decode_ok=false fraction).

LOGIT_NIBBLES = 4
LOGIT_SCALE = 4096.0
LOGIT_SHIFT = 8.0
DECODE_SALT = "decode"
DECODE_FAIL_BELOW = 13  # P(fail) = 13/256 ≈ 5%


def logit(col: Column, i) -> Column:
    """Deterministic pseudo-logit for class ``i`` of ``col`` (a path)."""
    return hash_uint(col, i, LOGIT_NIBBLES) / LOGIT_SCALE - LOGIT_SHIFT


def logits_array(col: Column, n: int = 30) -> Column:
    """Length-``n`` array<double> of deterministic logits — pure JVM
    expressions, mirrors the model score vector shape
    (``python/predict_batch_threaded_local.py:113-115``)."""
    return F.array(*[logit(col, i) for i in range(n)])


def decode_ok(col: Column) -> Column:
    """~95% true; stands in for PIL decode success
    (``python/predict_batch_threaded_local.py:100-108``)."""
    return hash_uint(col, DECODE_SALT, 2) >= DECODE_FAIL_BELOW


def duck_logit(path_expr: str, i_expr: str) -> str:
    h = duck_hash_uint(sql_salted(path_expr, i_expr), LOGIT_NIBBLES)
    return f"{h}/{LOGIT_SCALE} - {LOGIT_SHIFT}"


def duck_decode_ok(path_expr: str) -> str:
    h = duck_hash_uint(sql_salted(path_expr, f"'{DECODE_SALT}'"), 2)
    return f"{h} >= {DECODE_FAIL_BELOW}"
