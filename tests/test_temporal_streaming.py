"""As-of join, sessionization, streaming window semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from swat_mapreduce_spark.operators.asof import asof_join, sessionize
from swat_mapreduce_spark.sources.readers import read_table


def test_asof_semantics(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, on="user_id").collect()
    assert len(joined) == purchases.count(), "left rows preserved (left asof)"
    for r in joined:
        if r.asof_ts is not None:
            assert r.asof_ts <= r.ts, "asof match must not be in the future"


def test_asof_picks_latest(spark):
    df_l = spark.createDataFrame(
        [(1, 100), (1, 250)], "k int, t int"
    ).select("k", F.timestamp_seconds("t").alias("ts"), F.col("t").alias("id"))
    df_r = spark.createDataFrame(
        [(1, 50), (1, 99), (1, 100), (1, 200)], "k int, t int"
    ).select("k", F.timestamp_seconds("t").alias("ts"))
    out = {r.id: r.asof_ts for r in asof_join(df_l, df_r, on="k").collect()}
    assert out[100].second == 40  # ts=100s → matches right row at t=100 (tie inclusive)
    assert out[250].minute == 3 and out[250].second == 20  # t=200


def test_sessionize_gap(spark):
    rows = [(1, t) for t in [0, 100, 2000, 2100, 5000]]
    df = spark.createDataFrame(rows, "user_id int, t int").select(
        "user_id", F.timestamp_seconds("t").alias("ts")
    )
    out = sessionize(df, key="user_id", ts="ts", gap_seconds=1800).collect()
    nums = [r.session_num for r in sorted(out, key=lambda r: r.ts)]
    assert nums == [1, 1, 2, 2, 3]


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    from swat_mapreduce_spark.streaming import jobs

    stream = jobs.events_stream(spark, sf_dir)
    streamed = jobs.run_available_now(
        jobs.tumbling_counts(stream, "1 hour"), "t_batcheq"
    )
    events = read_table(spark, sf_dir, "events")
    batch = (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    s = {(r.window_start, r.event_type): r.n for r in streamed.collect()}
    b = {(r.window_start, r.event_type): r.n for r in batch.collect()}
    assert s == b, "availableNow streaming agg must equal the batch agg"


def test_streaming_session_positive(spark, sf_dir):
    from swat_mapreduce_spark.streaming import jobs

    stream = jobs.events_stream(spark, sf_dir)
    sessions = jobs.run_available_now(
        jobs.session_counts(stream, "30 minutes"), "s_pos"
    ).collect()
    assert sessions
    assert all(r.n_events >= 1 for r in sessions)


def test_stateful_state_survives_across_microbatches(spark, sf_dir, tmp_path):
    """applyInPandasWithState: feed the same users in two separate
    files with maxFilesPerTrigger=1 so they arrive in different
    micro-batches; the second batch's emission must include counts
    carried in GroupState from the first."""
    import uuid

    from pyspark.sql import functions as F

    from swat_mapreduce_spark.sources.readers import read_table
    from swat_mapreduce_spark.streaming import jobs

    events = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    early = events.filter(F.col("event_id") % 2 == 0)
    late = events.filter(F.col("event_id") % 2 == 1)
    src = tmp_path / "stream_src"
    early.coalesce(1).write.parquet(str(src / "batch0"))
    late.coalesce(1).write.parquet(str(src / "batch1"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    qname = f"stateful_test_{uuid.uuid4().hex[:8]}"
    q = (
        jobs.stateful_user_stats(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(qname)
    # more emissions than users => state was updated across >1 batch
    n_users = events.select("user_id").distinct().count()
    assert out.count() > n_users
    # final (max) per-user count equals the full batch aggregate
    final = {
        r["user_id"]: r["mx"]
        for r in out.groupBy("user_id").agg(F.max("n_events").alias("mx")).collect()
    }
    expected = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert final == expected


def test_stream_dedup_collapses_cross_batch_duplicates(spark, sf_dir, tmp_path):
    """dropDuplicates state must suppress a duplicate key arriving in a
    LATER micro-batch (within the watermark horizon)."""
    import uuid

    from pyspark.sql import functions as F

    from swat_mapreduce_spark.sources.readers import read_table
    from swat_mapreduce_spark.streaming import jobs

    events = read_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    src = tmp_path / "dedup_src"
    events.coalesce(1).write.parquet(str(src / "batch0"))
    # batch1 replays the SAME events (all duplicates)
    events.coalesce(1).write.parquet(str(src / "batch1"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    qname = f"sdedup_test_{uuid.uuid4().hex[:8]}"
    q = (
        jobs.stream_dedup(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(qname)
    assert out.count() == events.count()  # replay fully suppressed
    assert out.select("event_id").distinct().count() == events.count()


def test_stateful_query_on_rocksdb_state_store(spark, sf_dir, tmp_path):
    """The 100 TB state path: the same stateful aggregation must run on
    the RocksDB state store provider (spillable, incremental
    checkpoints) — config-only swap, no code change."""
    import uuid

    from pyspark.sql import functions as F

    from swat_mapreduce_spark.sources.readers import read_table
    from swat_mapreduce_spark.streaming import jobs

    events = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    src = tmp_path / "rocks_src"
    events.coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    qname = f"rocks_{uuid.uuid4().hex[:8]}"
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        q = (
            jobs.tumbling_counts(stream, "1 hour")
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "rocks_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert "RocksDB" in q.lastProgress["stateOperators"][0][
            "customMetrics"
        ].__str__() or "rocksdb" in str(
            q.lastProgress["stateOperators"][0]
        ), "query must actually run on the RocksDB provider"
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    got = spark.table(qname).agg(F.sum("n").alias("s")).first()["s"]
    assert got == events.count()


def test_observe_metrics_on_batch_query(spark, sf_dir):
    """df.observe(): accumulator-style metrics collected during a
    normal action — the audit-counters surface (rows seen, sum checks)
    with zero extra passes."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from swat_mapreduce_spark.sources.readers import read_table

    li = read_table(spark, sf_dir, "lineitem")
    obs = Observation("audit")
    audited = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum("l_quantity").alias("qty_sum"),
    )
    n = audited.filter(F.col("l_quantity") > 25).count()
    assert obs.get["rows_seen"] == li.count()
    assert obs.get["qty_sum"] > 0
    assert n < obs.get["rows_seen"]


def test_streaming_checkpoint_restart_exactly_once(spark, sf_dir, tmp_path):
    """Fault-tolerance contract: stop a file-sink stream, add new
    source data, restart with the SAME checkpoint — the sink must
    contain every source row exactly once (no reprocessing of batch0,
    no loss of batch1)."""
    from pyspark.sql import functions as F

    from swat_mapreduce_spark.sources.readers import read_table

    events = read_table(spark, sf_dir, "events")
    b0 = events.filter(F.col("event_id") % 2 == 0)
    b1 = events.filter(F.col("event_id") % 2 == 1)
    src = tmp_path / "src"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    b0.coalesce(1).write.parquet(str(src / "f0"))

    def run_once():
        q = (
            spark.readStream.schema(events.schema)
            .parquet(f"{src}/*")
            .select("event_id", "user_id", "value")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(sink).count() == b0.count()
    b1.coalesce(1).write.parquet(str(src / "f1"))
    run_once()
    out = spark.read.parquet(sink)
    assert out.count() == events.count()  # exactly once, no dupes
    assert out.select("event_id").distinct().count() == events.count()


def test_foreach_batch_sink(spark, sf_dir, tmp_path):
    """foreachBatch: arbitrary batch logic per micro-batch (the
    merge/upsert sink pattern) — collect per-batch aggregates into a
    driver-side audit list and a parquet sink."""
    from pyspark.sql import functions as F

    from swat_mapreduce_spark.sources.readers import read_table

    events = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    src = tmp_path / "fb_src"
    events.coalesce(1).write.parquet(str(src))
    sink = str(tmp_path / "fb_sink")
    seen = []

    def handle(batch_df, batch_id: int):
        agg = batch_df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        )
        agg.write.mode("append").parquet(sink)
        seen.append((batch_id, batch_df.count()))

    q = (
        spark.readStream.schema(events.schema)
        .parquet(str(src))
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "fb_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sum(n for _, n in seen) == events.count()
    total = (
        spark.read.parquet(sink).agg(F.sum("n").alias("s")).first()["s"]
    )
    assert total == events.count()


def test_drop_duplicates_within_watermark(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark (Spark 3.5+): dedup state expires
    with the watermark instead of growing forever — duplicates within
    the horizon are still suppressed."""
    from pyspark.sql import functions as F

    from swat_mapreduce_spark.sources.readers import read_table

    events = read_table(spark, sf_dir, "events").filter(
        F.col("event_id") < 200
    )
    doubled = events.union(events)
    src = tmp_path / "ddw_src"
    doubled.coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    out_name = "ddw_out"
    q = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .writeStream.format("memory")
        .queryName(out_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table(out_name).count() == events.count()


def test_streaming_classify_matches_batch(spark, tmp_path):
    """The classification pipeline must produce identical predictions
    whether the manifest arrives as a batch file or as a stream of
    files — one dataflow, two execution modes."""
    import uuid

    from pyspark.sql import functions as F

    from swat_mapreduce_spark.operators import classify
    from swat_mapreduce_spark.streaming import jobs

    mdir = tmp_path / "manifests"
    mdir.mkdir()
    (mdir / "m0.txt").write_text(
        "/data/img/a.jpg\n# comment\n\n/data/img/b.jpg\n"
    )
    (mdir / "m1.txt").write_text("/data/img/c.jpg\n/data/img/b.jpg\n")

    qname = f"sclassify_{uuid.uuid4().hex[:8]}"
    q = (
        jobs.streaming_classify(spark, str(mdir))
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["image_path"], r["class"], round(r["prob"], 4))
        for r in spark.table(qname).collect()
    }

    batch_manifest = spark.createDataFrame(
        [("/data/img/a.jpg",), ("# comment",), ("",), ("/data/img/b.jpg",),
         ("/data/img/c.jpg",), ("/data/img/b.jpg",)],
        "line string",
    )
    preds = classify.predict_top1(
        classify.score(classify.clean_manifest(batch_manifest))
    )
    batch = {
        (r["image_path"], r["class"], round(r["prob"], 4))
        for r in classify.attach_labels(preds, spark).collect()
    }
    assert streamed == batch
    assert len(streamed) == 3  # a, b, c (sets collapse the dup b)


def test_foreachbatch_idempotent_sink(spark, sf_dir, tmp_path):
    """foreachBatch parquet sink keyed by epoch: replaying an epoch
    (exactly what Structured Streaming does after a failure between
    sink write and offset commit) must not duplicate rows, because
    each epoch overwrites its own directory — the standard
    exactly-once-by-idempotence sink recipe."""
    import glob

    from pyspark.sql import functions as F

    from swat_mapreduce_spark.streaming import jobs

    out = str(tmp_path / "sink")

    def write_epoch(batch_df, epoch_id):
        (
            batch_df.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .parquet(f"{out}/epoch={epoch_id}")
        )

    stream = jobs.events_stream(spark, sf_dir)
    agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    q = (
        agg.writeStream.foreachBatch(write_epoch)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    first = spark.read.parquet(f"{out}/epoch=0").drop("epoch")
    baseline = {tuple(r) for r in first.collect()}
    assert len(baseline) == 5  # one row per event type

    # replay epoch 0 (same batch content, same epoch id)
    replay_df = spark.createDataFrame(first.collect(), first.schema)
    write_epoch(replay_df, 0)
    again = {
        tuple(r)
        for r in spark.read.parquet(f"{out}/epoch=0").drop("epoch").collect()
    }
    assert again == baseline  # no duplication after replay
    assert len(glob.glob(f"{out}/epoch=0/*.parquet")) >= 1


def test_tws_processor_logic_without_runtime():
    """transformWithStateInPandas needs a protobuf runtime this
    container lacks, so the StatefulProcessor's accumulate/emit logic
    is pinned directly: fake ValueState, two batches, running stats
    must merge across them (count adds, max maxes, first_ts mins)."""
    import pandas as pd

    from swat_mapreduce_spark.streaming.jobs import _UserStatsProcessor

    class FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeState()

        def getValueState(self, name, schema):
            return self.state

    proc = _UserStatsProcessor()
    handle = FakeHandle()
    proc.init(handle)

    b1 = pd.DataFrame(
        {
            "value": [3.0, 7.55555],
            "ts": pd.to_datetime(["2024-01-01 10:00:00", "2024-01-01 11:00:00"]),
        }
    )
    out1 = list(proc.handleInputRows((42,), iter([b1]), None))
    assert len(out1) == 1
    row = out1[0].iloc[0]
    assert row["user_id"] == 42 and row["n_events"] == 2
    assert row["max_value"] == 7.5556  # half-away rounding, oracle form
    assert row["first_ts"] == pd.Timestamp("2024-01-01 10:00:00")

    b2 = pd.DataFrame(
        {
            "value": [9.0],
            "ts": pd.to_datetime(["2024-01-01 09:00:00"]),
        }
    )
    out2 = list(proc.handleInputRows((42,), iter([b2]), None))
    row2 = out2[0].iloc[0]
    assert row2["n_events"] == 3  # state carried across batches
    assert row2["max_value"] == 9.0
    assert row2["first_ts"] == pd.Timestamp("2024-01-01 09:00:00")
    proc.close()


def test_tws_attribution_replay_converges_across_batches(
    spark, sf_dir, tmp_path
):
    """The processor's claim: last-click ValueState carries across
    micro-batches, so a two-batch time-split replay attributes a
    batch-2 purchase to its batch-1 click, and per-user counter
    emissions SUM to the single-batch totals."""
    import uuid

    import pytest
    from pyspark.sql import functions as F

    from swat_mapreduce_spark.queries.streaming_queries import (
        _tws_runtime_available,
    )
    from swat_mapreduce_spark.sources.readers import read_table
    from swat_mapreduce_spark.streaming import jobs

    if not _tws_runtime_available():
        pytest.skip("no protobuf runtime for transformWithState")

    events = read_table(spark, sf_dir, "events").filter(
        F.col("user_id") < 30
    )
    mid = events.approxQuantile("event_id", [0.5], 0.0)[0]
    src = tmp_path / "tws_replay"
    events.filter(F.col("event_id") <= mid).coalesce(1).write.parquet(
        str(src / "b0")
    )
    events.filter(F.col("event_id") > mid).coalesce(1).write.parquet(
        str(src / "b1")
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    qname = f"twsattr_{uuid.uuid4().hex[:8]}"
    try:
        q = (
            jobs.tws_attribution(stream)
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(provider_key, prev)
    summed = {
        r["user_id"]: (int(r["np"]), int(r["na"]))
        for r in spark.table(qname)
        .groupBy("user_id")
        .agg(
            F.sum("n_purchases").alias("np"),
            F.sum("n_attributed").alias("na"),
        )
        .collect()
    }
    # batch truth: carry-forward over the full per-user stream
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    truth_df = (
        events.withColumn(
            "lk",
            F.last(
                F.when(
                    F.col("event_type") == "click",
                    F.get_json_object("props", "$.k"),
                ),
                ignorenulls=True,
            ).over(w),
        )
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("np"),
            F.sum(
                F.when(F.col("lk").isNotNull(), 1).otherwise(0)
            ).alias("na"),
        )
    )
    truth = {
        r["user_id"]: (int(r["np"]), int(r["na"]))
        for r in truth_df.collect()
    }
    assert {u: v for u, v in summed.items() if v != (0, 0)} == truth


def test_stream_left_outer_join_emits_all_clicks(spark, sf_dir):
    """Every click must appear exactly once per batch-join multiplicity
    — including the LAST click, whose unmatched emission depends on
    the flush sentinels advancing BOTH sides' watermarks (a sentinel
    on one side leaves the min-watermark pinned; a sentinel-dropping
    filter in the streaming plan gets pushed into the scans and kills
    the sentinels entirely — both failure modes leave the final
    clicks stuck in state)."""
    from pyspark.sql import functions as F

    from swat_mapreduce_spark.queries.streaming_queries import (
        stream_left_outer_join,
    )
    from swat_mapreduce_spark.sources.readers import read_table

    out = stream_left_outer_join(spark, sf_dir)
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    # every distinct click id is present (outer semantics)
    assert (
        out.select("click_id").distinct().count() == clicks.count()
    )
    # the chronologically last click made it out (the sentinel-flush
    # regression fires exactly here)
    last_click = (
        clicks.orderBy(F.desc("ts")).select("event_id").first().event_id
    )
    assert out.filter(F.col("click_id") == last_click).count() >= 1


def test_stream_dedup_within_watermark_exact(spark, sf_dir):
    from swat_mapreduce_spark.queries.streaming_queries import (
        stream_dedup_within_watermark,
    )
    from swat_mapreduce_spark.sources.readers import read_table

    out = stream_dedup_within_watermark(spark, sf_dir)
    ev = read_table(spark, sf_dir, "events")
    assert out.count() == ev.select("event_id").distinct().count()


def test_stream_left_outer_join_recovers_across_restart(
    spark, sf_dir, tmp_path
):
    """Unmatched-click state must survive a query restart: run 1
    drains only the real data (no watermark progress → nothing
    evicted except what the in-run watermark allows), then the flush
    sentinels arrive and run 2 restarts from the SAME checkpoint —
    the union of both runs' outputs must equal the batch left join."""
    import time as _time

    from pyspark.sql import functions as F

    from swat_mapreduce_spark.sources.readers import read_table
    from swat_mapreduce_spark.streaming import jobs

    ev = read_table(spark, sf_dir, "events")
    src = str(tmp_path / "in")
    chk = str(tmp_path / "chk")
    ev.coalesce(1).write.parquet(src)

    outdir = str(tmp_path / "out")

    def run():
        # memory sink doesn't support checkpoint recovery; the file
        # sink does (idempotent via the sink's own commit log)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            jobs.interval_join_left_outer(stream, "1 hour")
            .writeStream.format("parquet")
            .option("path", outdir)
            .outputMode("append")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(outdir)

    out1 = run()
    n1 = out1.count()

    mx = ev.agg(F.max("ts")).collect()[0][0]
    for days in (30, 60):
        _time.sleep(1.1)
        spark.createDataFrame(
            [
                (-1, mx, -1, "click", 0.0, "{}"),
                (-2, mx, -2, "purchase", 0.0, "{}"),
            ],
            ev.schema,
        ).withColumn(
            "ts", F.col("ts") + F.expr(f"INTERVAL {days} DAYS")
        ).coalesce(1).write.mode("append").parquet(src)

    all_out = run()
    combined = all_out.filter(F.col("c_user") >= 0).select(
        "c_user", "click_id", "purchase_id"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (F.col("c_user") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
        )
    )
    expected = c.join(p, cond, "left_outer").select(
        "c_user", "click_id", "purchase_id"
    )
    assert combined.exceptAll(expected).count() == 0
    assert expected.exceptAll(combined).count() == 0
    # run 2 must have emitted something (the recovery actually flushed
    # restored state, not just re-read files)
    assert n1 < expected.count() <= all_out.count()


def test_asof_null_right_col_stays_on_matched_row(spark):
    """When the matched right row carries a NULL in one right_col, the
    asof_* values must ALL come from that one row — per-column
    first/last(ignorenulls) would pull the null column from a different
    row (ADVICE r4). Pinned for both directions."""
    from swat_mapreduce_spark.operators.asof import asof_join_forward

    df_l = spark.createDataFrame([(1, 100, 7)], "k int, t int, id int").select(
        "k", F.timestamp_seconds("t").alias("ts"), "id"
    )
    # backward: latest right at/below 100 is t=90 with v NULL; an older
    # row t=50 has v=5 which must NOT leak in.
    df_r = spark.createDataFrame(
        [(1, 50, 5), (1, 90, None)], "k int, t int, v int"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "v")
    (row,) = asof_join(df_l, df_r, on="k", right_cols=["v"]).collect()
    assert row.asof_ts.second == 30 and row.asof_ts.minute == 1  # t=90
    assert row.asof_v is None, "null must stay null — same-row guarantee"

    # forward: earliest right at/after 100 is t=110 with v NULL; a later
    # row t=200 has v=9 which must NOT leak in.
    df_r2 = spark.createDataFrame(
        [(1, 110, None), (1, 200, 9)], "k int, t int, v int"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "v")
    (row2,) = asof_join_forward(df_l, df_r2, on="k", right_cols=["v"]).collect()
    assert row2.asof_ts.second == 50  # t=110
    assert row2.asof_v is None, "null must stay null — same-row guarantee"


def test_stream_full_outer_join_emits_unmatched_from_both_sides(spark, sf_dir):
    """The full-outer capstone invariant: the drained streaming replay
    must emit unmatched rows from BOTH inputs (clicks with NULL
    purchase, purchases with NULL click) AND match the batch full join
    exactly — proving state eviction fires on both sides, not just the
    left buffer."""
    from swat_mapreduce_spark.queries.streaming_queries import (
        stream_full_outer_join,
    )

    got = stream_full_outer_join(spark, sf_dir).collect()
    unmatched_clicks = sum(
        1 for r in got if r.click_id is not None and r.purchase_id is None
    )
    unmatched_purch = sum(
        1 for r in got if r.purchase_id is not None and r.click_id is None
    )
    matched = sum(1 for r in got if r.matched)
    assert unmatched_clicks > 0, "no unmatched clicks emitted"
    assert unmatched_purch > 0, "no unmatched purchases emitted"
    assert matched > 0, "no matched pairs emitted"

    # equality with the batch full join (the oracle's shape)
    ev = read_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("cid"),
        F.col("ts").alias("cts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
    )
    cond = (
        (F.col("cu") == F.col("pu"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR"))
    )
    batch = c.join(p, cond, "full_outer")
    b_uc = batch.filter(
        F.col("cid").isNotNull() & F.col("pid").isNull()
    ).count()
    b_up = batch.filter(
        F.col("pid").isNotNull() & F.col("cid").isNull()
    ).count()
    b_m = batch.filter(F.col("cid").isNotNull() & F.col("pid").isNotNull()).count()
    assert (unmatched_clicks, unmatched_purch, matched) == (b_uc, b_up, b_m)


def test_asof_nearest_semantics(spark):
    """direction='nearest' contract: closer side wins, equidistant
    ties take the BACKWARD row (pandas convention), one-sided
    candidates still match, tolerance nulls far matches (row kept),
    and both window carries resolve in ONE Exchange (single shuffle)."""
    from swat_mapreduce_spark.operators.asof import asof_join_nearest

    df_l = spark.createDataFrame(
        [(1, 100), (1, 205), (1, 300), (2, 50), (3, 10)], "k int, t int"
    ).select("k", F.timestamp_seconds("t").alias("ts"), F.col("t").alias("id"))
    # k=1: rights at 90 and 210 → id=100 nearer 90 (backward);
    #      id=205 nearer 210 (forward); id=300 nearer 210 (backward).
    # k=2: right at 40 and 60 → EQUIDISTANT from 50 → backward (40).
    # k=3: no right rows → unmatched.
    df_r = spark.createDataFrame(
        [(1, 90, 9), (1, 210, 21), (2, 40, 4), (2, 60, 6)],
        "k int, t int, rid int",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "rid")
    out = asof_join_nearest(df_l, df_r, on="k", right_cols=["rid"])
    # plan BEFORE execution (a collected AQE plan prints the reused
    # ShuffleQueryStage AND its inner Exchange — the same node twice):
    # both frames must share one WindowExec → exactly one shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 1, (
        "backward+forward carries must share a single hash exchange"
    )
    assert plan.count("Window") == 1, "dual frames must fuse into one WindowExec"
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == 5, "left rows preserved"
    assert rows[100].asof_rid == 9 and rows[100].asof_dir == "backward"
    assert rows[205].asof_rid == 21 and rows[205].asof_dir == "forward"
    assert rows[300].asof_rid == 21 and rows[300].asof_dir == "backward"
    assert rows[50].asof_rid == 4 and rows[50].asof_dir == "backward", (
        "equidistant tie must take the backward row"
    )
    assert rows[10].asof_rid is None and rows[10].asof_dir is None

    # tolerance: id=100 is 10s from its match; 5s tolerance unmatches it
    tol = asof_join_nearest(
        df_l, df_r, on="k", right_cols=["rid"], tolerance_seconds=5
    )
    trows = {r.id: r for r in tol.collect()}
    assert len(trows) == 5, "tolerance keeps unmatched rows"
    assert trows[100].asof_rid is None and trows[100].asof_dir is None
    assert trows[205].asof_rid == 21, "5s-away match survives tolerance"


def test_stream_right_outer_join_emits_unmatched_purchases_only(spark, sf_dir):
    """Right-outer mirror invariant: the drained replay must emit
    unmatched PURCHASES (NULL click columns) and matched pairs, but
    never a click-only row (the click buffer evicts silently) — and
    match the batch right join's counts exactly."""
    from swat_mapreduce_spark.queries.streaming_queries import (
        stream_right_outer_join,
    )

    got = stream_right_outer_join(spark, sf_dir).collect()
    assert all(r.purchase_id is not None for r in got), (
        "right-outer output must always carry the purchase side"
    )
    unmatched_purch = sum(1 for r in got if r.click_id is None)
    matched = sum(1 for r in got if r.matched)
    assert unmatched_purch > 0, "no unmatched purchases emitted"
    assert matched > 0, "no matched pairs emitted"

    ev = read_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("cid"),
        F.col("ts").alias("cts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
    )
    cond = (
        (F.col("cu") == F.col("pu"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR"))
    )
    batch = c.join(p, cond, "right_outer")
    b_up = batch.filter(F.col("cid").isNull()).count()
    b_m = batch.filter(F.col("cid").isNotNull()).count()
    assert (unmatched_purch, matched) == (b_up, b_m)
