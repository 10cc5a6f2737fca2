"""Cross-engine-stable rounding.

DuckDB implements ``round(x, n)`` for doubles as
``std::round(x * 10^n) / 10^n``. Spark's ``F.round(x, n)`` instead
rounds the exact decimal expansion of the double (BigDecimal HALF_UP),
which can differ by 1e-n when a computed value lands near a .5
boundary (e.g. a quality score of exactly 0.84025). Since the
correctness oracle IS DuckDB, the engine's rounding mimics DuckDB's
procedure: same multiply, same scale-0 round (HALF_UP on an exact
double tie == C++ round-half-away), same divide → bit-identical
doubles in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def r(col: Column | str, digits: int = 4) -> Column:
    if isinstance(col, str):
        col = F.col(col)
    p = float(10**digits)
    # trailing + 0.0 folds IEEE -0.0 into +0.0 (DuckDB round() can emit
    # -0.0 for tiny negatives; a -0.0/0.0 split breaks the value hash)
    return F.round(col * p) / p + 0.0


def money_sum(col: Column, digits: int = 2) -> Column:
    """Exact money aggregation: cast to DECIMAL(30,8) BEFORE summing.

    Distributed double sums depend on accumulation order; at 1e7+
    magnitudes the ~1e-5 absolute noise can flip a 2dp rounding when
    the true value sits near a .xx5 boundary (observed on TPC-H Q9 at
    sf0.1). Decimal sums are exact and order-independent in both Spark
    and DuckDB, so round(sum(decimal), d) is bit-stable at ANY scale.
    The oracle mirror is :func:`duck_money_sum`.
    """
    if isinstance(col, str):
        col = F.col(col)
    return F.round(F.sum(col.cast("decimal(30,8)")), digits).cast("double")


def duck_money_sum(expr: str, digits: int = 2) -> str:
    """DuckDB SQL mirroring :func:`money_sum`."""
    return f"round(sum(CAST(({expr}) AS DECIMAL(30,8))), {digits})::DOUBLE"
