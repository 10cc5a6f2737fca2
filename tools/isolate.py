"""Isolated per-query steady-state measurement for pin adjudication.

Usage:
    python tools/isolate.py [--sf DIR] [--reps N] query1 query2 ...

Runs the named registry queries in ONE quiet warmed session (the
BENCH_PINS.json methodology: isolated reps, sf0.1, local[32]) and
prints every rep plus the warmed best, as JSON on the last line.
Streaming queries are still repeated — their rep spread IS the
state-store-init evidence a pin needs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from swat_mapreduce_spark.queries import load_all
    from swat_mapreduce_spark.session import get_spark

    spark = get_spark("isolate")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    # Same machinery warmup as bench.py so rep 1 isn't pure JIT.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _pd_identity(it):
        yield from it

    spark.range(10_000).mapInPandas(_pd_identity, "id long").count()

    out: dict[str, dict] = {}
    for name in args.queries:
        q = reg[name]
        reps: list[float] = []
        for _ in range(args.reps):
            t0 = time.time()
            q.spark_fn(spark, args.sf).count()
            reps.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
        out[name] = {"reps": reps, "best": min(reps)}
        print(f"# {name}: {reps} -> best {min(reps):.3f}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
