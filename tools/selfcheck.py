"""Self-check harness mimicking the correctness driver: run every
registered Spark query and its DuckDB oracle on the same parquet,
compare row-count + column names + order-insensitive value hash
(floats rounded to 4dp, mirroring FIXTURES.md §C).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def norm_value(v):
    """Normalize one cell for hashing.

    Deliberately TYPE-PRESERVING: the external driver hashes values
    type-aware (a DuckDB HUGEINT/DECIMAL result does NOT match a Spark
    bigint even when numerically equal — see VERDICT.md round 1), so a
    Decimal here keeps a distinct tag instead of being folded into
    float/int. Local green must predict driver green; when in doubt be
    STRICTER than the driver, never looser.
    """
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, Decimal):
        # canonical scale-free form, but tagged so it can never collide
        # with an int64/double from the other engine
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        return "dec:" + s
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        r = round(v, 4) + 0.0  # fold IEEE -0.0 into +0.0
        # NOTE: no int-folding — a whole double stays "1.0" so that an
        # int64-vs-double divergence between Spark and the oracle fails
        # here instead of only under the driver.
        return repr(r)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        # distinct from datetime: Spark DateType vs TIMESTAMP must not
        # silently compare equal
        return "date:" + v.strftime("%Y-%m-%d")
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, len(rows)


def run(sf_dir: str, only: list[str] | None = None) -> int:
    import duckdb

    from swat_mapreduce_spark.queries import load_all
    from swat_mapreduce_spark.session import get_spark
    from swat_mapreduce_spark.sources.readers import TABLES

    spark = get_spark("selfcheck", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    reg = load_all()
    names = only or sorted(reg)
    failures = 0
    for name in names:
        q = reg[name]
        t0 = time.time()
        try:
            sdf = q.spark_fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            sh, sn = table_hash(scols, srows)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:28s} spark error: {str(e).splitlines()[0][:160]}")
            failures += 1
            continue
        finally:
            # per-query persist() blocks (LSH/minhash/charlm) would
            # otherwise accumulate for the 281-query session lifetime
            spark.catalog.clearCache()
        if q.oracle is None:
            print(f"rows  {name:28s} {sn:6d} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.sql(q.oracle)
            dcols = [c for c in res.columns]
            # fetch via Arrow, NOT fetchall(): duckdb's fetchall folds
            # HUGEINT into plain int, masking the decimal128-vs-int64
            # drift the driver's type-aware hash catches (VERDICT r1)
            atbl = res.arrow()
            dmaps = atbl.to_pylist()
            drows = [tuple(m[c] for c in dcols) for m in dmaps]
            dh, dn = table_hash(dcols, drows)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:28s} duckdb error: {str(e).splitlines()[0][:160]}")
            failures += 1
            continue
        ok = sn == dn and sorted(scols) == sorted(dcols) and sh == dh
        if ok:
            print(f"OK    {name:28s} {sn:6d} rows hash={sh} [{time.time()-t0:.1f}s]")
        else:
            failures += 1
            print(
                f"FAIL  {name:28s} spark({sn},{sh}) duck({dn},{dh}) "
                f"cols spark={sorted(scols)} duck={sorted(dcols)}"
            )
            # print a tiny diff sample
            sset = {
                "\x01".join(
                    norm_value(r[i])
                    for i in sorted(range(len(scols)), key=lambda i: scols[i])
                )
                for r in srows
            }
            dset = {
                "\x01".join(
                    norm_value(r[i])
                    for i in sorted(range(len(dcols)), key=lambda i: dcols[i])
                )
                for r in drows
            }
            for line in list(sset - dset)[:3]:
                print(f"      spark-only: {line[:200]}")
            for line in list(dset - sset)[:3]:
                print(f"      duck-only : {line[:200]}")
    print(f"\n{len(names) - failures}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = args[1:] if args and os.path.isdir(args[0]) else args
    sys.exit(run(sf_dir, only or None))
