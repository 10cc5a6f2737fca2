"""Round-11 ADVICE fixes: pacf degenerate-series guard.

A daily series with n <= _PACF_MAX_LAG rows empties the mf filter;
pacf_durbin_levinson must return the oracle's no-rows result (empty
frame with the declared schema) instead of IndexError-ing on
collect()[0]. Cannot fire on current testdata (~30 days) — planted.
"""

from __future__ import annotations

import datetime

from swat_mapreduce_spark.queries import load_all

REG = load_all()


def test_pacf_short_series_returns_empty(spark, tmp_path):
    rows = [
        (datetime.datetime(2024, 1, 1 + d, 12, 0, 0), float(10 + d))
        for d in range(3)  # 3 days < _PACF_MAX_LAG = 5
    ]
    spark.createDataFrame(rows, "ts timestamp, value double").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    df = REG["pacf_durbin_levinson"].spark_fn(spark, str(tmp_path))
    assert df.columns == ["lag", "pacf"]
    assert df.count() == 0
