"""Mechanical tripwire for CLAUDE.md gotcha 10 (VERDICT r9 #1).

Spark's two-arg ``sequence(a, b)`` DESCENDS when ``b < a`` (default
step -1) while DuckDB's ``generate_series(a, b)`` is EMPTY — so any
sequence whose upper bound is computed from data (``length(text) - 1``,
``size(t) - 1``, ``n - lag``, ``ceil(...)``) can silently diverge (or
throw via ``element_at(t, 0)``) on degenerate rows. Every such call in
registered-query source must sit behind a guard (``F.when(... >= ...)``,
``CASE WHEN``, or an upstream ``.filter(...)``) or carry an explicit
entry below proving the bound cannot fall under the lower bound.

This test parses the raw source text: it paren-matches each
``sequence(`` call (works for both the DSL form and SQL embedded in
string literals, since the SQL itself is paren-balanced), classifies
the upper bound as data-computed vs constant, and demands a guard token
in the preceding window. New unguarded sites fail here before they can
reach the registry.
"""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parents[1] / "swat_mapreduce_spark"
SCAN_DIRS = [PKG / "queries", PKG / "operators", PKG / "functions"]

# Tokens that mark a guard when found in the window BEFORE the call.
_GUARD_RE = re.compile(r"F\.when\(|CASE WHEN|\.filter\(|WHERE\s")
_GUARD_WINDOW = 700  # chars — covers an upstream .filter a few lines up

# arg2 shapes that are compile-time constants (cannot descend):
#   F.lit(<python-expr with no column refs>), bare ints, module constants
_CONST_ARG2 = re.compile(
    r"""^\s*(
        F\.lit\([^()]*\)(\.cast\([^()]*\))?   # F.lit(...) [+ cast]
      | \d+                                   # bare integer literal
      | _[A-Z][A-Z_0-9]*                      # module-level constant
      | \{[^{}]*\}                            # f-string splice of a constant
    )\s*$""",
    re.VERBOSE,
)

# Provably-safe unguarded sites: (path-suffix, arg2 substring) -> reason.
# Add here ONLY with a written proof the bound >= lower bound always.
ALLOWLIST = {
    # date ranges where arg2 = arg1 + positive interval
    ("queries/temporal.py", "date_add"): "arg2 = arg1 + k days, k >= 0",
    ("queries/scale_patterns.py", "date_add"): "arg2 = arg1 + 6 days",
    ("queries/temporal.py", "INTERVAL"): "hourly range, t1 >= t0 by agg",
    ("queries/scale_patterns.py", "last_day"): "month span >= its 1st",
    ("queries/temporal.py", "last_day"): "month span >= its 1st",
    # fixed-dimension embedding arrays (generator writes DIM floats)
    ("queries/relational4.py", 'F.size("embedding")'):
        "embeddings are fixed non-empty DIM vectors",
    ("queries/temporal.py", 'F.col("k")'):
        "k = size(collect_list over a window containing current row) >= 1",
    # counts that are >= 1 by construction of the aggregate they index
    ("queries/quality_audits.py", 'F.col("n")'):
        "n = count(*) of a non-empty group, >= 1",
    ("queries/sql_surfaces.py", "sequence(1, n)"):
        "n is a positive literal column from VALUES",
}


def _iter_calls(text: str):
    """Yield (start_idx, args_text) for each sequence( call. Matches on
    comment lines are skipped — prose like '# guards sequence(3, n)'
    is not a call site."""
    for m in re.finditer(r"\bsequence\(", text):
        line_start = text.rfind("\n", 0, m.start()) + 1
        if text[line_start : m.start()].lstrip().startswith("#"):
            continue
        i = m.end()
        depth = 1
        j = i
        while j < len(text) and depth:
            if text[j] == "(":
                depth += 1
            elif text[j] == ")":
                depth -= 1
            j += 1
        yield m.start(), text[i : j - 1]


def _split_top(args: str):
    out, depth, cur = [], 0, []
    for ch in args:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def _risky(arg2: str) -> bool:
    """Upper bound computed from row data -> can fall below the start."""
    if _CONST_ARG2.match(arg2):
        return False
    return bool(
        re.search(r"length\(|size\(|ceil\(|F\.col\(|n_chunks|\bn\b", arg2)
    )


def test_no_unguarded_data_bounded_sequence():
    offenders = []
    for d in SCAN_DIRS:
        for path in sorted(d.glob("*.py")):
            text = path.read_text()
            rel = str(path.relative_to(PKG.parent))
            for pos, args in _iter_calls(text):
                parts = _split_top(args)
                if len(parts) < 2:
                    continue
                arg2 = parts[1]
                if not _risky(arg2):
                    continue
                window = text[max(0, pos - _GUARD_WINDOW) : pos]
                if _GUARD_RE.search(window):
                    continue
                line = text.count("\n", 0, pos) + 1
                if any(
                    rel.endswith(sfx) and frag in args
                    for (sfx, frag) in ALLOWLIST
                ):
                    continue
                offenders.append(f"{rel}:{line}  sequence({args[:90]}...)")
    assert not offenders, (
        "unguarded data-computed sequence bounds (gotcha 10 — wrap in "
        "F.when(bound >= lower, ...) / CASE WHEN, or pre-filter, or "
        "allowlist with proof):\n" + "\n".join(offenders)
    )
