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
    return F.round(col * p) / p
