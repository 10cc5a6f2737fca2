"""Dump .explain("formatted") for named registry queries to files.

Usage: python tools/dumpplan.py <outdir> <suffix> query1 [query2 ...]

Writes <outdir>/<query>_<suffix>.txt for each query, planned against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). Round-12 plan
evidence: plans/r12/<query>_before.txt / _after.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    from swat_mapreduce_spark.plans.explain import formatted_plan
    from swat_mapreduce_spark.queries import load_all
    from swat_mapreduce_spark.session import get_spark

    spark = get_spark("dumpplan")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    for name in names:
        entry = reg[name]
        # plan_fn exposes the heavy pre-collect subtree for queries
        # whose spark_fn materializes internally (bounded driver state)
        fn = entry.plan_fn or entry.spark_fn
        df = fn(spark, sf_dir)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
