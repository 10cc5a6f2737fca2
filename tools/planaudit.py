"""Plan audit: dump a physical-plan census for every registered query
to PLANS.md — exchanges (shuffles), broadcast joins, pushed filters,
Python-eval stages, scan read-schemas.

This is the ".explain('formatted') and iterate" discipline made
repeatable: run after adding operators, read the census, fix plans
that shuffle or scan more than they should.

Usage: python tools/planaudit.py [sf_dir] [out_md]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def audit_one(name: str, df) -> dict:
    """Counts of scale-relevant node kinds in the FINAL (adaptive)
    plan section. The formatted explain of an unexecuted AQE plan
    repeats everything under '== Initial Plan ==' — only the first
    section is counted."""
    from swat_mapreduce_spark.plans.explain import formatted_plan

    plan = formatted_plan(df).split("== Initial Plan ==")[0]
    # numbered tree nodes: "(12) NodeName [codegen id : 3]"
    nodes = re.findall(r"\(\d+\)\s+([A-Za-z]+)", plan)
    # Exchange kind lives in its Arguments detail line (detail blocks
    # look like "(4) Exchange\nInput [..]: ...\nArguments: hashpartitioning(...)")
    ex_args = re.findall(
        r"\(\d+\)\s+Exchange\n(?:[^\n]*\n)*?Arguments: (\w+)", plan
    )
    counts = {
        "shuffles": sum(
            1 for a in ex_args if a in ("hashpartitioning", "rangepartitioning")
        ),
        "broadcasts": nodes.count("BroadcastExchange"),
        "bcast_joins": nodes.count("BroadcastHashJoin")
        + nodes.count("BroadcastNestedLoopJoin"),
        "smj": nodes.count("SortMergeJoin"),
        "python": sum(
            nodes.count(n)
            for n in (
                "ArrowEvalPython",
                "BatchEvalPython",
                "MapInPandas",
                "FlatMapGroupsInPandas",
                "PythonMapInArrow",
                "BatchEvalPythonUDTF",
            )
        ),
        "scans": nodes.count("Scan"),
        "sorts": nodes.count("Sort"),
        # registry-wide no-cartesian contract: pinned at zero by
        # tests/test_parity_utils.py over every census row
        "cartesian": nodes.count("CartesianProduct"),
    }
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    counts["pushed_filters"] = sum(1 for p in pushed if p.strip())
    counts["global_windows"] = _count_global_windows(plan)
    return counts


def _count_global_windows(plan: str) -> int:
    """WindowExec nodes with NO partition spec — every row flows
    through ONE task ("No Partition Defined" at runtime), so each
    occurrence must be provably bounded-input (the allowlist test in
    tests/test_parity_utils.py enforces the documentation).

    Window detail blocks print ``Arguments: [exprs], [partition],
    [order]`` with EMPTY TRAILING GROUPS OMITTED, so the grouping is
    reconstructed from content: order-spec groups contain ASC/DESC,
    partition groups are bare column lists."""
    n = 0
    for block in re.split(r"\n\n", plan):
        first = block.lstrip().split("\n", 1)[0].strip()
        m = re.match(r"\(\d+\)\s+(Window|WindowGroupLimit)$", first)
        if not m:
            continue
        arg_lines = [
            line for line in block.split("\n")
            if line.startswith("Arguments:")
        ]
        if not arg_lines:
            continue
        body = arg_lines[0][len("Arguments:"):].strip()
        groups = body.split("], [")
        if m.group(1) == "WindowGroupLimit":
            # Arguments: [partition], [order], rankFn, limit, mode —
            # the partition spec LEADS; global iff it is "[" + empty
            if not groups[0].strip().lstrip("[").strip():
                n += 1
        elif len(groups) >= 3:
            # Window: [exprs], [partition], [order] — global iff
            # partition empty
            if not groups[1].strip():
                n += 1
        elif len(groups) == 2:
            # order-only (global) vs partition-only (partitioned)
            if re.search(r"\b(ASC|DESC) NULLS", groups[1]):
                n += 1
        else:
            n += 1  # exprs only: no partition, no order
    return n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    out_md = sys.argv[2] if len(sys.argv) > 2 else "PLANS.md"

    from swat_mapreduce_spark.queries import load_all
    from swat_mapreduce_spark.session import get_spark

    spark = get_spark("planaudit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    rows = []
    skipped = []
    for name in sorted(reg):
        fn = reg[name].spark_fn
        try:
            # streaming queries execute on construction (availableNow);
            # their batch plans are covered by their batch-agg twins
            if name.startswith("stream_"):
                skipped.append(name)
                continue
            df = fn(spark, sf_dir)
            rows.append((name, audit_one(name, df)))
        except Exception as e:  # noqa: BLE001
            rows.append((name, {"error": str(e)[:80]}))

    cols = ["shuffles", "broadcasts", "bcast_joins", "smj", "python",
            "scans", "sorts", "pushed_filters", "cartesian",
            "global_windows"]
    lines = [
        "# PLANS — physical-plan census (generated by tools/planaudit.py)",
        "",
        f"Scale factor dir: `{sf_dir}`. Counts of plan nodes per query —",
        "`shuffles` = hash/range Exchanges (each is a full network",
        "repartition of its input at 100 TB), `broadcasts` = small-side",
        "broadcast exchanges, `python` = Arrow/pandas eval stages (the",
        "deliberate Python surfaces only), `pushed_filters` = parquet",
        "scans with at least one pushed predicate.",
        "",
        "Streaming queries are omitted (they execute on construction;",
        "their aggregation plans mirror the batch twins).",
        "",
        "Cross-SF stability (verified round 5 for the then-314 queries;",
        "RE-VERIFIED round 7 for the full 345-row registry including all",
        "50 r6 additions): regenerating this census against",
        "`/root/testdata/sf0.1` produces IDENTICAL counts for",
        "every row — no broadcast flips to sort-merge, no extra",
        "exchanges, no plan reshapes as the data grows 10x.",
        "A drift guard sampling r6-added join-bearing queries at two",
        "SFs runs in tests/test_parity_utils.py.",
        "Dimension-side join strategies are largely pinned by explicit",
        "`broadcast()` hints (90 call sites, not left to size-threshold",
        "luck); the few threshold-decided broadcasts stay far under the",
        "limit at 10x data. The plan shapes audited here are therefore",
        "the shapes that ship at larger scale factors.",
        "",
        "Queries whose pipeline persists a shared subtree (the r3",
        "materialization pass: minhash/ngram/simhash dedup, charlm)",
        "under-count here: the un-executed plan reads the persisted",
        "relation, hiding the exchanges inside the cached segment.",
        "The pre-persist shuffle census for those queries is recorded",
        "in SCALING.md's dedup-family notes.",
        "",
        "`global_windows` counts WindowExec nodes with NO partition",
        "spec (single-task at runtime). Every nonzero entry must sit",
        "on the bounded-input allowlist in tests/test_parity_utils.py",
        "— windows over tables already cut to a constant row count",
        "(top-k limits, decile tables, fixed query samples), where a",
        "one-task window is correct by construction.",
        "",
        "| query | " + " | ".join(cols) + " |",
        "|---|" + "---|" * len(cols),
    ]
    for name, c in rows:
        if "error" in c:
            lines.append(f"| {name} | ERROR: {c['error']} |")
        else:
            lines.append(
                f"| {name} | " + " | ".join(str(c[k]) for k in cols) + " |"
            )
    lines.append("")
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_md}: {len(rows)} queries audited, "
          f"{len(skipped)} streaming skipped")


if __name__ == "__main__":
    main()
