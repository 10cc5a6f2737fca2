"""Property-based tests (hypothesis) for the cross-engine primitives
everything else leans on: the shared rounding formula and the md5
hash-uint scheme must agree between Python, DuckDB, and Spark for ALL
inputs, not just the ones the fixed testdata happens to produce."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _py_round_halfaway(x: float, digits: int) -> float:
    """Reference implementation of the engine's rounding contract
    (functions/rounding.py): scale, round half away from zero,
    unscale — DuckDB's double rounding procedure."""
    p = float(10**digits)
    return math.copysign(math.floor(abs(x) * p + 0.5) / p, x)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(max_examples=300, deadline=None)
@given(
    st.floats(
        min_value=-1e6,
        max_value=1e6,
        allow_nan=False,
        allow_infinity=False,
    ),
    st.integers(min_value=0, max_value=6),
)
def test_round_matches_duckdb(x: float, digits: int):
    con = duckdb.connect()
    (expected,) = con.execute(
        f"SELECT round({x!r}::DOUBLE, {digits})"
    ).fetchone()
    got = _py_round_halfaway(x, digits)
    # DuckDB rounds the scaled double; equality must be bitwise on the
    # double result (both compute round(x*10^d)/10^d)
    assert got == expected or (
        math.isnan(got) and math.isnan(expected)
    ), f"x={x!r} d={digits}: py={got!r} duck={expected!r}"


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=50), st.integers(0, 100))
def test_hash_uint_matches_duckdb(s: str, salt: int):
    """functions/hashing.py contract: Python hashlib, DuckDB md5-hex
    parse, and (by the selfcheck suite) Spark conv() all agree."""
    import hashlib

    payload = f"{s}:{salt}"
    h = hashlib.md5(payload.encode()).hexdigest()[:8]
    py_val = int(h, 16)
    con = duckdb.connect()
    (duck_val,) = con.execute(
        "SELECT ('0x' || substr(md5(?1 || ':' || ?2), 1, 8))::BIGINT",
        [s, str(salt)],
    ).fetchone()
    assert py_val == duck_val


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=1,
        max_size=20,
    )
)
def test_softmax_argmax_reference_semantics(vals):
    """argmax must return the FIRST maximal index (torch.max
    semantics, python/predict_batch_threaded_local.py:115-117) and
    softmax must sum to ~1 — pinned in pure Python as the spec the
    Spark arrays.py implementation mirrors (equality with Spark is
    covered by the softmax_top1 oracle query)."""
    mx = max(vals)
    first_idx = vals.index(mx)
    assert all(vals[i] < mx for i in range(first_idx))
    denom = sum(math.exp(v) for v in vals)
    probs = [math.exp(v) / denom for v in vals]
    assert abs(sum(probs) - 1.0) < 1e-9
    assert probs.index(max(probs)) <= first_idx


def test_minhash_signatures_match_reference_after_lambda_churn(spark, sf_dir):
    """Regression: PySpark derives higher-order-function arity from the
    Python callable's signature, so a default-arg capture
    (``lambda s, k=k``) silently becomes the (element, index) form and
    the salt turns into a stringified index Column. The signatures
    must equal the hashlib reference BOTH fresh and after unrelated
    lambda expressions have been built in the same session."""
    import hashlib

    from pyspark.sql import functions as F

    from swat_mapreduce_spark.operators import dedup as D
    from swat_mapreduce_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents").limit(50)
    docsh = D.doc_shingle_arrays(docs, 3)
    expected = {}
    for r in docsh.collect():
        if r["sh_arr"]:
            hs = [
                int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
                for s in r["sh_arr"]
            ]
            expected[r["doc_id"]] = [
                min((D.MH_A[k] * h + D.MH_B[k]) % D.MERSENNE61 for h in hs)
                for k in range(D.NUM_HASHES)
            ]

    def check():
        got = {
            r["doc_id"]: [r[f"h{k}"] for k in range(D.NUM_HASHES)]
            for r in D.minhash_signatures_from_arrays(docsh).collect()
            if r["h0"] is not None
        }
        assert got == expected

    check()
    # churn the session's lambda machinery with unrelated HOF exprs
    arr = F.array(*[F.lit(float(i)) for i in range(5)])
    for _ in range(4):
        spark.range(10).select(
            F.aggregate(
                F.zip_with(arr, arr, lambda a, b: a * b),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("s"),
            F.exists(F.filter(arr, lambda x: x > 1), lambda x: x > 2).alias("e"),
            F.transform(arr, lambda x, i: x + i.cast("double")).alias("t"),
        ).collect()
    check()
