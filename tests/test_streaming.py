"""The streaming blocks must run as REAL Structured Streaming queries —
same plan incrementally, watermark-bounded state — and the rows they
emit must agree with the batch run of the identical plan (windows still
open at the watermark are the only permitted difference)."""

SF_DIR = "/root/testdata/sf0.001"


def test_event_aggregate_streaming_matches_batch(spark, tmp_path):
    from dask_geomodeling_spark.streaming.events import (EventAggregate,
                                                         EventSource)
    url = SF_DIR + "/events.parquet"

    batch = EventAggregate(EventSource(url), "1 hour", ["event_type"],
                           "value", "max")
    batch_rows = {
        (r["window_start"], r["event_type"]): r["value"]
        for r in batch.plan(spark).collect()}

    # nanos timestamps aren't readable by the streaming parquet source;
    # re-encode micros once (batch), then stream THAT
    restaged = str(tmp_path / "events")
    EventSource(url).plan(spark).write.parquet(restaged)

    stream = EventAggregate(
        EventSource(restaged, streaming=True, watermark="10 minutes"),
        "1 hour", ["event_type"], "value", "max")
    out = str(tmp_path / "out")
    q = stream.start(spark, path=out,
                     checkpoint=str(tmp_path / "ckpt"),
                     available_now=True)
    q.awaitTermination(120)

    got = spark.read.parquet(out).collect()
    assert len(got) > 0
    # every emitted (finalized) window must equal the batch result
    for r in got:
        key = (r["window_start"], r["event_type"])
        assert key in batch_rows
        assert r["value"] == batch_rows[key], key
    # only trailing windows (still open at the final watermark) may be
    # missing from the streamed output
    emitted = {(r["window_start"], r["event_type"]) for r in got}
    missing_starts = {k[0] for k in set(batch_rows) - emitted}
    if missing_starts:
        max_start = max(k[0] for k in batch_rows)
        assert all(s == max_start for s in missing_starts)


def test_sessionize_streaming_matches_batch(spark, tmp_path):
    """Session windows under availableNow emit every session the
    watermark can close; only sessions still open at the final
    watermark are held back — so the streamed output must equal the
    batch result minus those trailing per-user sessions."""
    from dask_geomodeling_spark.streaming.events import (EventSource,
                                                         SessionizeEvents)
    restaged = str(tmp_path / "events")
    EventSource(SF_DIR + "/events.parquet").plan(spark) \
        .write.parquet(restaged)
    block = SessionizeEvents(
        EventSource(restaged, streaming=True, watermark="1 hour"),
        gap="30 minutes")
    df = block.plan(spark)
    assert df.isStreaming
    out = str(tmp_path / "out")
    q = (df.writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start(out))
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    batch = SessionizeEvents(EventSource(restaged),
                             gap="30 minutes").plan(spark)
    expected = {tuple(r) for r in batch.collect()}
    assert got, "stream emitted nothing"
    assert got <= expected  # no invented sessions
    # everything held back is a trailing (latest-start) session of its
    # user — the documented append-mode bound
    held = expected - got
    last_start = {}
    for r in expected:
        u, start = r[1], r[0]
        if u not in last_start or start > last_start[u]:
            last_start[u] = start
    assert all(r[0] == last_start[r[1]] for r in held)


def test_streaming_dedup(spark, tmp_path):
    from pyspark.sql import functions as F

    from dask_geomodeling_spark.streaming.events import (EventSource,
                                                         StreamingDedup)
    restaged = str(tmp_path / "events")
    base = EventSource(SF_DIR + "/events.parquet").plan(spark)
    # duplicate every event, then dedup on event_id while streaming
    base.unionByName(base).write.parquet(restaged)
    block = StreamingDedup(
        EventSource(restaged, streaming=True, watermark="2 hours"),
        keys=["event_id"])
    df = block.plan(spark)
    assert df.isStreaming
    out = str(tmp_path / "out")
    q = (df.writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start(out))
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    n_unique = base.select("event_id").distinct().count()
    assert got.select("event_id").distinct().count() == got.count()
    # batch mode: exact dedup
    batch = StreamingDedup(EventSource(restaged), keys=["event_id"])
    assert batch.plan(spark).count() == n_unique


def test_running_aggregate_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState path must emit, across micro-batches, the
    exact per-event running totals the batch window produces — state
    carries between batches, and the decimal fold matches bit-for-bit."""
    from pyspark.sql import functions as F

    from dask_geomodeling_spark.geometry.sources import DataFrameSource
    from dask_geomodeling_spark.streaming.events import EventSource
    from dask_geomodeling_spark.streaming.stateful import RunningAggregate

    url = SF_DIR + "/events.parquet"
    base = EventSource(url).plan(spark).filter("user_id % 10 = 1")
    batch = {
        (r["user_id"], r["event_id"]): (r["running_n"], r["running_sum"])
        for r in RunningAggregate(
            DataFrameSource(base, "event_id")).plan(spark).collect()}

    # stream the same rows in TWO time-ordered files so per-key state
    # must carry across micro-batches (early half first, late half next)
    cut = base.selectExpr("percentile(unix_micros(ts), 0.5)").first()[0]
    restaged = str(tmp_path / "events")
    base.filter(F.unix_micros("ts") < cut).coalesce(1) \
        .write.mode("append").parquet(restaged)
    base.filter(F.unix_micros("ts") >= cut).coalesce(1) \
        .write.mode("append").parquet(restaged)

    stream = RunningAggregate(
        EventSource(restaged, streaming=True, watermark="1 hour"))
    df = stream.plan(spark)
    assert df.isStreaming
    out = str(tmp_path / "out")
    q = (df.writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .option("maxFilesPerTrigger", 1)
         .trigger(availableNow=True).start(out))
    q.awaitTermination(180)

    got = spark.read.parquet(out).collect()
    assert len(got) == len(batch)
    for r in got:
        assert (r["running_n"], r["running_sum"]) == \
            batch[(r["user_id"], r["event_id"])], r


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """The watermarked stream-stream interval join must emit exactly
    the batch join's pairs (watermark generous enough that nothing is
    dropped for lateness)."""
    from pyspark.sql import functions as F

    from dask_geomodeling_spark.streaming.events import (EventSource,
                                                         IntervalJoin)

    class Typed(EventSource):
        def __init__(self, url, etype, streaming=False):
            EventSource.__init__(self, url, streaming=streaming,
                                 watermark="4 hours")
            self._etype = etype

        def _build(self, ctx):
            df = EventSource._build(self, ctx)
            return (df.filter(F.col("event_type") == self._etype)
                    .select("user_id", "ts", "event_id"))

    url = SF_DIR + "/events.parquet"
    batch = IntervalJoin(Typed(url, "click"), Typed(url, "purchase"),
                         within="1 hour").plan(spark)
    expected = {(r["user_id"], r["event_id_l"], r["event_id_r"])
                for r in batch.collect()}

    restaged = str(tmp_path / "events")
    EventSource(url).plan(spark).write.parquet(restaged)
    stream = IntervalJoin(Typed(restaged, "click", streaming=True),
                          Typed(restaged, "purchase", streaming=True),
                          within="1 hour")
    df = stream.plan(spark)
    assert df.isStreaming
    out = str(tmp_path / "out")
    q = (df.writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start(out))
    q.awaitTermination(180)
    got = {(r["user_id"], r["event_id_l"], r["event_id_r"])
           for r in spark.read.parquet(out).collect()}
    assert got == expected


def test_asof_join_batch(spark):
    import datetime

    from dask_geomodeling_spark.geometry.sources import DataFrameSource
    from dask_geomodeling_spark.streaming.events import AsofJoin

    def t(m):
        return datetime.datetime(2024, 1, 1, 0, m)

    rows = [(1, t(0), 7, "click"), (2, t(5), 7, "click"),
            (3, t(5), 7, "purchase"),   # tie: click at same ts matches
            (4, t(30), 7, "purchase"),  # matches click id 2
            (5, t(10), 8, "purchase"),  # user 8 has no clicks -> dropped
            (6, t(0), 9, "click"),
            (7, t(50), 9, "purchase")]  # click too old for 30m horizon
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string")
    left = DataFrameSource(ev.filter("event_type = 'purchase'"))
    right = DataFrameSource(ev.filter("event_type = 'click'"))
    got = {r.l_id: r for r in
           AsofJoin(left, right, key="user_id",
                    horizon="30 MINUTES").plan(spark).collect()}
    assert got[3].r_id == 2 and got[3].gap_us == 0
    assert got[4].r_id == 2 and got[4].gap_us == 25 * 60 * 1000000
    assert 5 not in got and 7 not in got


def test_asof_join_stream_matches_batch(spark, tmp_path):
    """Streaming as-of (stateful last-right carry) must emit exactly
    the batch plan's matches when data arrives in one ordered batch."""
    from pyspark.sql import functions as F

    from dask_geomodeling_spark.streaming.events import (AsofJoin,
                                                         EventSource)

    class Typed(EventSource):
        def __init__(self, url, etype, streaming=False):
            EventSource.__init__(self, url, streaming=streaming,
                                 watermark="4 hours")
            self._etype = etype

        def _build(self, ctx):
            df = EventSource._build(self, ctx)
            return (df.filter(F.col("event_type") == self._etype)
                    .select("user_id", "ts", "event_id"))

    url = SF_DIR + "/events.parquet"
    batch = AsofJoin(Typed(url, "purchase"), Typed(url, "click"),
                     key="user_id", horizon="2 HOURS").plan(spark)
    expected = {(r["user_id"], r["l_id"], r["r_id"], r["gap_us"])
                for r in batch.collect()}
    assert expected  # non-trivial fixture

    restaged = str(tmp_path / "events")
    EventSource(url).plan(spark).write.parquet(restaged)
    stream = AsofJoin(Typed(restaged, "purchase", streaming=True),
                      Typed(restaged, "click", streaming=True),
                      key="user_id", horizon="2 HOURS")
    df = stream.plan(spark)
    assert df.isStreaming
    out = str(tmp_path / "out")
    q = (df.writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start(out))
    q.awaitTermination(180)
    got = {(r["user_id"], r["l_id"], r["r_id"], r["gap_us"])
           for r in spark.read.parquet(out).collect()}
    assert got == expected


def test_quality_pipeline_runs_on_stream(spark, tmp_path):
    """The stateless text passes (quality, PII) are streaming-safe as
    plain projections: the same block plan over readStream emits
    exactly the batch rows."""
    from pyspark.sql import functions as F

    from dask_geomodeling_spark.geometry.sources import DataFrameSource
    from dask_geomodeling_spark.pipeline.filter import (LinearScore,
                                                        PIIRedact)
    from dask_geomodeling_spark.pipeline.text import QualityScore

    url = str(tmp_path / "docs")
    spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").write.parquet(url)
    batch_df = spark.read.parquet(url)

    def pipeline(df):
        block = LinearScore(
            PIIRedact(QualityScore(
                DataFrameSource(df, index_column="doc_id"))),
            features=["punct_ratio", "stopword_ratio"],
            weights=[-2.0, 5.0], bias=0.1)
        return block.plan(spark).select(
            "doc_id", "quality", "n_emails",
            F.round("score", 9).alias("score"),
            F.length("text_redacted").alias("n_red"))

    expected = {tuple(r) for r in pipeline(batch_df).collect()}

    stream_df = (spark.readStream.format("parquet")
                 .schema(batch_df.schema).load(url))
    out = str(tmp_path / "out")
    q = (pipeline(stream_df).writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start(out))
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert got == expected  # stateless projections: no held-back rows


def test_sliding_window_stream_matches_batch(spark, tmp_path):
    """The 1h/30min sliding-window aggregation emits identical windows
    on readStream (availableNow) and batch."""
    from pyspark.sql import functions as F

    from dask_geomodeling_spark.config import read_nanos_parquet

    def agg(df):
        win = F.window("ts", "1 hour", "30 minutes")
        return (df.groupBy(win.alias("_w"), "event_type")
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.col("_w.start").alias("ws"),
                        "event_type", "n"))

    batch_df = read_nanos_parquet(
        spark, "/root/testdata/sf0.001/events.parquet")
    url = str(tmp_path / "events")
    batch_df.write.parquet(url)
    staged = spark.read.parquet(url)
    expected = {tuple(r) for r in agg(staged).collect()}

    stream = (spark.readStream.format("parquet")
              .schema(staged.schema).load(url)
              .withWatermark("ts", "4 hours"))
    out = str(tmp_path / "out")
    q = (agg(stream).writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start(out))
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    # every emitted window equals the batch plan's; the only permitted
    # difference is trailing windows still open at the final watermark
    assert got <= expected and got
    import datetime
    max_ts = batch_df.agg(F.max("ts")).first()[0]
    horizon = max_ts - datetime.timedelta(hours=5)  # watermark + width
    for ws, _, _ in expected - got:
        assert ws >= horizon, ws


def test_decontaminate_broadcast_stream_matches_batch(spark, tmp_path):
    """Decontaminate(broadcast_set=True) is a stream-static broadcast
    join + map-side intersect — the identical plan over readStream
    emits exactly the batch rows (on-ingest decontamination)."""
    from pyspark.sql import functions as F

    from dask_geomodeling_spark.geometry.sources import DataFrameSource
    from dask_geomodeling_spark.pipeline.filter import Decontaminate

    url = str(tmp_path / "docs")
    spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").write.parquet(url)
    batch_df = spark.read.parquet(url)
    holdout = DataFrameSource(
        batch_df.filter(F.col("doc_id") % 97 == 0),
        index_column="doc_id")

    def pipeline(df):
        train = DataFrameSource(df.filter(F.col("doc_id") % 97 != 0),
                                index_column="doc_id")
        return (Decontaminate(train, holdout, n=6, broadcast_set=True)
                .plan(spark)
                .select("doc_id", "shared_ngrams", "contaminated"))

    expected = {tuple(r) for r in pipeline(batch_df).collect()}
    assert any(r[2] for r in expected)  # some contamination exists

    stream_df = (spark.readStream.format("parquet")
                 .schema(batch_df.schema).load(url))
    out = str(tmp_path / "out")
    q = (pipeline(stream_df).writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start(out))
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert got == expected


def test_crawl_curation_runs_on_stream(spark, tmp_path):
    """The crawl-curation chain (HtmlExtract → C4Filter →
    GopherQuality without n-grams → UrlNormalize) is projection-only,
    so the identical block plan over readStream emits exactly the
    batch rows — streaming crawl ingestion needs no new operators."""
    from pyspark.sql import functions as F

    from dask_geomodeling_spark.geometry.sources import DataFrameSource
    from dask_geomodeling_spark.pipeline.curate import (C4Filter,
                                                        GopherQuality,
                                                        HtmlExtract,
                                                        UrlNormalize)

    url = str(tmp_path / "docs")
    (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
     .withColumn("html", F.concat(F.lit("<p>"), F.col("text"),
                                  F.lit(" end.</p>")))
     .withColumn("url", F.concat(F.lit("HTTPS://WWW.ex.com/p/"),
                                 F.col("doc_id")))
     .write.parquet(url))
    batch_df = spark.read.parquet(url)

    def pipeline(df):
        block = UrlNormalize(GopherQuality(C4Filter(HtmlExtract(
            DataFrameSource(df, index_column="doc_id")),
            column="text_extracted"), column="text_clean",
            ngram_metrics=False))
        return block.plan(spark).select(
            "doc_id", "url_norm", "n_lines_kept", "c4_keep",
            F.round("mean_word_len", 9).alias("mwl"), "gopher_pass")

    expected = {tuple(r) for r in pipeline(batch_df).collect()}
    stream_df = (spark.readStream.format("parquet")
                 .schema(batch_df.schema).load(url))
    out = str(tmp_path / "out")
    q = (pipeline(stream_df).writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start(out))
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert got == expected


def test_dsir_score_runs_on_stream(spark, tmp_path):
    """DSIRScore against a SAVED model is pure map-side literal-map
    lookups (the stream-safe claim): the identical block plan over
    readStream emits exactly the batch scores."""
    from pyspark.sql import functions as F

    from dask_geomodeling_spark.geometry.sources import DataFrameSource
    from dask_geomodeling_spark.pipeline.dsir import (DSIRScore,
                                                      fit_dsir_model,
                                                      save_dsir_model)

    url = str(tmp_path / "docs")
    spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").write.parquet(url)
    batch_df = spark.read.parquet(url)
    tgt = batch_df.where(F.col("source") == "src0")
    model_url = str(tmp_path / "model")
    save_dsir_model(fit_dsir_model(batch_df, tgt, num_buckets=211),
                    model_url)

    def pipeline(df):
        return (DSIRScore(DataFrameSource(df, index_column="doc_id"),
                          model_url, num_buckets=211)
                .plan(spark)
                .select("doc_id", "n_grams", "logweight"))

    expected = {tuple(r) for r in pipeline(batch_df).collect()}
    stream_df = (spark.readStream.format("parquet")
                 .schema(batch_df.schema).load(url))
    out = str(tmp_path / "out")
    q = (pipeline(stream_df).writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start(out))
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert got == expected


def test_spatial_join_runs_on_stream(spark, tmp_path):
    """SpatialJoin with a STREAMING point side and a static polygon
    side is a plain stream-static inner equi-join (the grid cell keys
    are map-side), so the identical block plan over readStream emits
    exactly the batch pairs — streaming geo-enrichment needs no new
    operators."""
    from pyspark.sql import functions as F  # noqa: F401

    from dask_geomodeling_spark.geometry.sources import DataFrameSource
    from dask_geomodeling_spark.geometry.spatial_join import SpatialJoin

    url = str(tmp_path / "pts")
    (spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
     .select("c_custkey",
             (F.col("c_custkey") % 20).cast("double").alias("x"),
             ((F.col("c_custkey") * 3) % 20).cast("double").alias("y"))
     .write.parquet(url))
    batch_df = spark.read.parquet(url)
    polys = spark.createDataFrame(
        [(1, [[[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]]),
         (2, [[[10.0, 10.0], [20.0, 10.0], [20.0, 20.0],
               [10.0, 20.0]]])],
        "zone bigint, rings array<array<array<double>>>")

    def pipeline(df):
        j = SpatialJoin(DataFrameSource(df, index_column="c_custkey"),
                        DataFrameSource(polys, index_column="zone"),
                        cell_size=10.0, right_columns=["zone"])
        return j.plan(spark).select("c_custkey", "zone")

    expected = {tuple(r) for r in pipeline(batch_df).collect()}
    assert expected  # non-degenerate
    stream_df = (spark.readStream.format("parquet")
                 .schema(batch_df.schema).load(url))
    out = str(tmp_path / "out")
    q = (pipeline(stream_df).writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start(out))
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert got == expected


def test_streaming_near_dup_matches_batch(spark, tmp_path):
    """StreamingNearDup: incoming docs LSH-join a static corpus's
    MinHash band buckets — stateless stream-static join; the streamed
    candidate SET equals the batch run's distinct set, and the exact
    duplicate planted in the corpus is always flagged."""
    from pyspark.sql import functions as F

    from dask_geomodeling_spark.geometry.sources import DataFrameSource
    from dask_geomodeling_spark.streaming.events import StreamingNearDup

    url = str(tmp_path / "docs")
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    # incoming = odd ids; corpus = even ids PLUS a verbatim copy of
    # incoming doc 1's text under corpus id -1 (a guaranteed near-dup)
    probe = docs.filter(F.col("doc_id") == 1) \
        .select(F.lit(-1).alias("doc_id"), "text")
    corpus = DataFrameSource(
        docs.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", "text").unionByName(probe),
        index_column="doc_id")
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(url)
    batch_df = spark.read.parquet(url)

    def pipeline(df):
        stream = DataFrameSource(df.select("doc_id", "text"),
                                 index_column="doc_id")
        return StreamingNearDup(stream, corpus).plan(spark)

    expected = {tuple(r) for r in pipeline(batch_df).collect()}
    assert (1, -1) in expected  # the planted exact dup collides

    stream_df = (spark.readStream.format("parquet")
                 .schema(batch_df.schema).load(url))
    out = str(tmp_path / "out")
    q = (pipeline(stream_df).writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start(out))
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert got == expected


def test_rolling_event_aggregate(spark):
    """Round 10: trailing-interval per-key aggregate — inclusive
    window ends, per-key isolation, the statistic vocabulary,
    validation."""
    import datetime

    import pytest

    from dask_geomodeling_spark.core.blocks import Block
    from dask_geomodeling_spark.streaming.events import (
        RollingEventAggregate)

    class _Src(Block):
        def __init__(self, df):
            self._df = df
            super().__init__()

        def _build(self, ctx):
            return self._df

    t0 = datetime.datetime(2024, 1, 1)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    df = spark.createDataFrame(
        [(1, at(0), 7, 10.0), (2, at(30), 7, 1.0),
         (3, at(60), 7, 2.0),          # exactly 1h after e1: INCLUDED
         (4, at(61), 7, 4.0),          # e1 now out of range
         (5, at(45), 8, 100.0)],       # other key, never mixed
        "event_id bigint, ts timestamp, user_id bigint, value double")
    src = _Src(df)
    got = {r["event_id"]: r["rolling"] for r in RollingEventAggregate(
        src, "1 hour", key="user_id").plan(spark).collect()}
    assert got == {1: 10.0, 2: 11.0, 3: 13.0, 4: 7.0, 5: 100.0}
    cnt = {r["event_id"]: r["rolling"] for r in RollingEventAggregate(
        src, "30 minutes", key="user_id",
        statistic="count").plan(spark).collect()}
    assert cnt == {1: 1.0, 2: 2.0, 3: 2.0, 4: 2.0, 5: 1.0}
    mean = {r["event_id"]: r["rolling"] for r in RollingEventAggregate(
        src, "1 hour", key="user_id",
        statistic="mean").plan(spark).collect()}
    assert mean[3] == 13.0 / 3.0
    with pytest.raises(ValueError, match="statistic"):
        RollingEventAggregate(src, "1 hour", statistic="median")
    with pytest.raises(ValueError, match="interval"):
        RollingEventAggregate(src, "soon")


def test_streaming_hll_matches_batch_and_batch_sketch(spark, tmp_path):
    """Round 12: StreamingHyperLogLog over readStream (availableNow)
    emits exactly the batch rows for every watermark-closed window,
    and its batch-mode registers agree with the ungrouped batch
    HyperLogLog on the same window's rows (shared reg_rho math)."""
    from pyspark.sql import functions as F

    from dask_geomodeling_spark.geometry.sources import DataFrameSource
    from dask_geomodeling_spark.pipeline.text import HyperLogLog
    from dask_geomodeling_spark.streaming.events import (
        EventSource, StreamingHyperLogLog)
    url = SF_DIR + "/events.parquet"
    batch = StreamingHyperLogLog(EventSource(url), "user_id",
                                 frequency="1 hour", precision=6)
    batch_rows = {r["window_start"]: (r["s_scaled"], r["v_zero"],
                                      r["n_distinct_est"])
                  for r in batch.plan(spark).collect()}
    assert batch_rows

    restaged = str(tmp_path / "events")
    EventSource(url).plan(spark).write.parquet(restaged)
    stream = StreamingHyperLogLog(
        EventSource(restaged, streaming=True, watermark="10 minutes"),
        "user_id", frequency="1 hour", precision=6)
    out = str(tmp_path / "out")
    q = stream.start(spark, path=out,
                     checkpoint=str(tmp_path / "ckpt"),
                     available_now=True)
    q.awaitTermination(120)
    got = spark.read.parquet(out).collect()
    assert got
    for r in got:
        assert batch_rows[r["window_start"]] == (
            r["s_scaled"], r["v_zero"], r["n_distinct_est"])
    emitted = {r["window_start"] for r in got}
    missing = set(batch_rows) - emitted
    if missing:
        assert missing == {max(batch_rows)}

    # cross-check one window against the batch HyperLogLog sketch
    win = sorted(batch_rows)[0]
    ev = EventSource(url).plan(spark)
    one = ev.filter(
        (ev["ts"] >= win)
        & (ev["ts"] < F.lit(win) + F.expr("INTERVAL 1 HOUR")))
    row = HyperLogLog(
        DataFrameSource(one.select("event_id", "user_id"),
                        index_column="event_id"),
        "user_id", precision=6).plan(spark).collect()[0]
    assert (row["s_scaled"], row["v_zero"], row["n_distinct_est"]) \
        == batch_rows[win]


def test_count_min_defaults_aligned():
    """Round 14 (r13 ADVICE): the stream/batch merge contract is
    plain counter SUM, so two DEFAULT-constructed sketches must agree
    on shape — the streaming default silently disagreed (3 vs 4),
    misaligning rows on merge.  Pin the defaults equal."""
    import inspect

    from dask_geomodeling_spark.pipeline.text import CountMinSketch
    from dask_geomodeling_spark.streaming.events import (
        StreamingCountMin)
    b = inspect.signature(CountMinSketch.__init__).parameters
    s = inspect.signature(StreamingCountMin.__init__).parameters
    assert b["depth"].default == s["depth"].default == 4
    assert b["width"].default == s["width"].default


def test_streaming_count_min_matches_batch_and_batch_sketch(
        spark, tmp_path):
    """Round 13: StreamingCountMin over readStream (availableNow)
    emits exactly the batch rows for every watermark-closed window,
    and each window's counters equal the batch CountMinSketch over
    that window's rows (shared Bloom position pipeline) — so windows
    merge by counter SUM into the whole-range sketch."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from dask_geomodeling_spark.geometry.sources import DataFrameSource
    from dask_geomodeling_spark.pipeline.text import CountMinSketch
    from dask_geomodeling_spark.streaming.events import (
        EventSource, StreamingCountMin)
    url = SF_DIR + "/events.parquet"
    batch = StreamingCountMin(EventSource(url), "user_id",
                              frequency="1 hour", depth=3, width=128)
    batch_rows = {(r["window_start"], r["row_idx"], r["pos_idx"]):
                  r["counter"] for r in batch.plan(spark).collect()}
    assert batch_rows

    restaged = str(tmp_path / "events")
    EventSource(url).plan(spark).write.parquet(restaged)
    stream = StreamingCountMin(
        EventSource(restaged, streaming=True, watermark="10 minutes"),
        "user_id", frequency="1 hour", depth=3, width=128)
    out = str(tmp_path / "out")
    q = stream.start(spark, path=out,
                     checkpoint=str(tmp_path / "ckpt"),
                     available_now=True)
    q.awaitTermination(120)
    got = spark.read.parquet(out).collect()
    assert got
    for r in got:
        key = (r["window_start"], r["row_idx"], r["pos_idx"])
        assert batch_rows[key] == r["counter"], key
    emitted = {r["window_start"] for r in got}
    missing = {k[0] for k in batch_rows} - emitted
    if missing:
        assert missing == {max(k[0] for k in batch_rows)}

    # windows merge by SUM into the whole-range batch sketch
    merged = defaultdict(int)
    for (w, j, p), c in batch_rows.items():
        merged[(j, p)] += c
    ev = EventSource(url).plan(spark)
    whole = {(r["row_idx"], r["pos_idx"]): r["counter"]
             for r in CountMinSketch(
                 DataFrameSource(ev.select("event_id", "user_id"),
                                 index_column="event_id"),
                 "user_id", depth=3, width=128)
             .plan(spark).collect()}
    assert dict(merged) == whole


def test_event_aggregate_calendar_streaming_matches_batch(
        spark, tmp_path):
    """Round 15 (r14 verdict #6): calendar frequencies ('M') on the
    event plane — the date-bucket grouping column is streaming-legal,
    the bin end carries the watermark, and every finalized month a
    drained availableNow stream emits equals the batch result."""
    from dask_geomodeling_spark.streaming.events import (EventAggregate,
                                                         EventSource)
    url = SF_DIR + "/events.parquet"
    # anchored weeks: the sf0.001 events span one month, which holds
    # several W-MON bins (a single 'M' bin would never finalize)
    batch = EventAggregate(EventSource(url), "W-MON", ["event_type"],
                           "value", "max")
    batch_rows = {
        (r["window_start"], r["event_type"]): r["value"]
        for r in batch.plan(spark).collect()}
    assert len({k[0] for k in batch_rows}) >= 2  # multi-week data

    restaged = str(tmp_path / "events")
    EventSource(url).plan(spark).write.parquet(restaged)
    # calendar frequencies watermark the BIN END themselves — the
    # source arrives unwatermarked (watermark=None)
    stream = EventAggregate(
        EventSource(restaged, streaming=True, watermark=None),
        "W-MON", ["event_type"], "value", "max")
    out = str(tmp_path / "out")
    q = stream.start(spark, path=out,
                     checkpoint=str(tmp_path / "ckpt"),
                     available_now=True)
    q.awaitTermination(120)

    got = spark.read.parquet(out).collect()
    assert len(got) > 0
    for r in got:
        key = (r["window_start"], r["event_type"])
        assert key in batch_rows
        assert r["value"] == batch_rows[key], key
    # only the trailing (still-open) week may be missing
    emitted = {(r["window_start"], r["event_type"]) for r in got}
    missing_starts = {k[0] for k in set(batch_rows) - emitted}
    if missing_starts:
        max_start = max(k[0] for k in batch_rows)
        assert all(s == max_start for s in missing_starts)


def test_event_aggregate_calendar_batch_bins(spark):
    """Calendar bins on the event plane agree with the raster
    temporal family's conventions: month starts as labels, anchored
    weeks on the anchor weekday, weekend instants to Friday for
    'B'."""
    import datetime

    from dask_geomodeling_spark.core.blocks import Block
    from dask_geomodeling_spark.streaming.events import EventAggregate

    class _Lit(Block):
        def __init__(self, rows):
            self._rows = rows
            super().__init__("lit-{}".format(id(rows)))

        def _build(self, ctx):
            return ctx.spark.createDataFrame(
                self._rows, "ts timestamp, event_type string, "
                            "value double")

    utc = datetime.timezone.utc
    rows = [
        (datetime.datetime(2024, 1, 15, tzinfo=utc), "a", 1.0),
        (datetime.datetime(2024, 1, 31, 23, tzinfo=utc), "a", 2.0),
        (datetime.datetime(2024, 2, 1, tzinfo=utc), "a", 4.0),
        (datetime.datetime(2024, 3, 30, tzinfo=utc), "a", 8.0),  # Sat
    ]
    got = {(r["window_start"].strftime("%Y-%m-%d"), r["value"])
           for r in EventAggregate(_Lit(rows), "M", ["event_type"],
                                   "value", "sum")
           .plan(spark).collect()}
    assert got == {("2024-01-01", 3.0), ("2024-02-01", 4.0),
                   ("2024-03-01", 8.0)}
    got = {(r["window_start"].strftime("%Y-%m-%d"), r["value"])
           for r in EventAggregate(_Lit(rows), "W-MON",
                                   ["event_type"], "value", "sum")
           .plan(spark).collect()}
    # 2024-01-15 IS a Monday; Jan 31 (Wed) and Feb 1 (Thu) share the
    # Mon Jan 29 bin
    assert ("2024-01-15", 1.0) in got and ("2024-01-29", 6.0) in got
    got = {(r["window_start"].strftime("%Y-%m-%d"), r["value"])
           for r in EventAggregate(_Lit(rows), "B", ["event_type"],
                                   "value", "sum")
           .plan(spark).collect()}
    # Saturday Mar 30 bins to Friday Mar 29
    assert ("2024-03-29", 8.0) in got
