"""Incremental index ingest via Structured Streaming (Trigger.AvailableNow)."""

import os

import pyspark.sql.functions as F

from openmatch_spark.fixtures import PAGES_SCHEMA, QUERIES_SCHEMA, gen_pages_rows
from openmatch_spark.index import build_index, load_index
from openmatch_spark.query import search
from openmatch_spark.streaming import incremental_index_available_now


def test_incremental_ingest(spark, tmp_path):
    rows = gen_pages_rows(150)
    base, extra = rows[:100], rows[100:]
    idx_dir = str(tmp_path / "idx")
    watch = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    build_index(
        spark, spark.createDataFrame(base, PAGES_SCHEMA), idx_dir,
        num_shards=2, num_term_buckets=4,
    )
    idx = load_index(spark, idx_dir)
    n_docs_before = idx.docmap.count()

    # a query matching ONLY a doc from the new batch
    marker = "zzzincremental"
    extra = [(u, ts, h, t + " " + marker, lang) for (u, ts, h, t, lang) in extra]
    spark.createDataFrame(extra, PAGES_SCHEMA).write.parquet(watch + "/batch1.parquet")

    queries = spark.createDataFrame([("qn", marker)], QUERIES_SCHEMA)
    assert search(idx, queries, k=10).count() == 0  # unseen before ingest

    n_batches = incremental_index_available_now(spark, watch, idx_dir, ckpt)
    assert n_batches >= 1

    idx2 = load_index(spark, idx_dir)
    assert idx2.docmap.count() == n_docs_before + len(extra)
    # docs are searchable by pre-existing vocabulary ...
    hit = search(idx2, spark.createDataFrame([("q", "term0000")], QUERIES_SCHEMA), k=200)
    new_urls = {u for (u, *_rest) in extra}
    assert any(r["doc_id"] in new_urls for r in hit.collect())
    # ... AND by vocabulary first seen in the ingested batch: the marker was
    # not in the base dictionary; extend_dictionary appends it (frozen-N idf)
    marker_hits = search(idx2, queries, k=100).collect()
    assert {r["doc_id"] for r in marker_hits} <= new_urls
    assert len(marker_hits) > 0

    # exactly-once: re-running the drained stream ingests nothing new
    n2 = incremental_index_available_now(spark, watch, idx_dir, ckpt)
    assert load_index(spark, idx_dir).docmap.count() == n_docs_before + len(extra)


def test_windowed_event_stats_stream_matches_batch(spark, tmp_path):
    """AvailableNow file stream through the watermarked windowed agg must
    equal the same expression run in batch over the same rows."""
    import shutil

    from openmatch_spark.streaming.events import windowed_event_stats

    src = str(tmp_path / "ev_src")
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch.write.parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = windowed_event_stats(stream, window="1 hour", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("ev_stats")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM ev_stats").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in windowed_event_stats(batch, window="1 hour").collect()
    }
    assert got == want and len(want) > 3
    shutil.rmtree(src, ignore_errors=True)


def test_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionizer: a second micro-batch arriving
    past the gap closes the first batch's sessions with reason 'gap'."""
    from datetime import datetime

    from openmatch_spark.streaming.events import sessionize

    src = str(tmp_path / "sess_src")
    schema = "user_id long, ts timestamp, value double"
    b1 = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0, 0), 1.0),
            (1, datetime(2024, 1, 1, 10, 0, 30), 2.0),
            (2, datetime(2024, 1, 1, 10, 0, 10), 5.0),
        ],
        schema,
    )
    b1.coalesce(1).write.parquet(src)
    # second file: user 1 returns after the 60s gap -> closes session 1
    b2 = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 5, 0), 3.0)], schema
    )
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sessionize(stream, gap_seconds=60)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions").collect()
    closed = {(r["user_id"], r["n_events"], r["total_value"], r["closed_by"]) for r in rows}
    # user 1's first 2-event session closed by the gap event
    assert (1, 2, 3.0, "gap") in closed


def test_sessionize_batch_matches_stream(spark, tmp_path):
    """Every session the stateful streaming sessionizer closes by 'gap'
    appears verbatim in the batch gaps-and-islands twin (sessionize_batch)
    run over the same rows — the two operators implement one gap rule."""
    from datetime import datetime

    from openmatch_spark.streaming.events import sessionize, sessionize_batch

    src = str(tmp_path / "sessb_src")
    schema = "user_id long, ts timestamp, value double"
    b1 = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0, 0), 1.0),
            (1, datetime(2024, 1, 1, 10, 0, 30), 2.0),
            (2, datetime(2024, 1, 1, 10, 0, 10), 5.0),
            (2, datetime(2024, 1, 1, 10, 0, 40), 0.5),
        ],
        schema,
    )
    b1.coalesce(1).write.parquet(src)
    # both users return past the 60s gap -> closes both first sessions
    b2 = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 5, 0), 3.0),
            (2, datetime(2024, 1, 1, 10, 9, 0), 4.0),
        ],
        schema,
    )
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize(stream, gap_seconds=60)
        .writeStream.format("memory")
        .queryName("sessions_eq")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["total_value"])
        for r in spark.sql(
            "SELECT * FROM sessions_eq WHERE closed_by = 'gap'"
        ).collect()
    }
    assert len(streamed) == 2  # one gap-closed session per user

    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["total_value"])
        for r in sessionize_batch(
            spark.read.parquet(src), gap_seconds=60
        ).collect()
    }
    assert streamed <= batch
    # batch also carries the two still-open trailing sessions
    assert len(batch) == 4


def test_incremental_second_drain_cycle(spark, tmp_path):
    """Regression: shard ids for new micro-batches come from the manifest's
    max committed shard, not frozen stats.num_shards — a SECOND drain cycle
    must append new shards, not collide with (and be skipped as) the first
    cycle's. The collision silently dropped every doc of the second drain."""
    rows = gen_pages_rows(140)
    base, e1, e2 = rows[:100], rows[100:120], rows[120:]
    idx_dir, watch, ckpt = (str(tmp_path / d) for d in ("idx", "in", "ckpt"))
    os.makedirs(watch)
    build_index(
        spark, spark.createDataFrame(base, PAGES_SCHEMA), idx_dir,
        num_shards=2, num_term_buckets=4,
    )
    m1, m2 = "zzzdrainone", "zzzdraintwo"
    e1 = [(u, ts, h, t + " " + m1, lang) for (u, ts, h, t, lang) in e1]
    e2 = [(u, ts, h, t + " " + m2, lang) for (u, ts, h, t, lang) in e2]

    spark.createDataFrame(e1, PAGES_SCHEMA).write.parquet(watch + "/b1.parquet")
    assert incremental_index_available_now(spark, watch, idx_dir, ckpt) >= 1
    spark.createDataFrame(e2, PAGES_SCHEMA).write.parquet(watch + "/b2.parquet")
    assert incremental_index_available_now(spark, watch, idx_dir, ckpt) >= 1

    idx = load_index(spark, idx_dir)
    assert idx.docmap.count() == 140  # nothing dropped
    q = spark.createDataFrame([("q1", m1), ("q2", m2)], QUERIES_SCHEMA)
    per_q = {
        r["query_id"]: r["count"]
        for r in search(idx, q, k=50).groupBy("query_id").count().collect()
    }
    assert per_q.get("q1", 0) == 20 and per_q.get("q2", 0) == 20


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a duplicate arriving in a LATER
    micro-batch is dropped by the content-hash state; distinct docs pass."""
    from openmatch_spark.streaming.events import streaming_exact_dedup

    src = str(tmp_path / "dedup_src")
    rows = gen_pages_rows(6)
    b1 = rows[:4]
    # batch 2: one exact duplicate of a batch-1 doc (new url), one new doc
    dup = ("https://dup.example/x", rows[0][1], rows[0][2], rows[0][3], rows[0][4])
    b2 = [dup, rows[4], rows[5]]
    spark.createDataFrame(b1, PAGES_SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(b2, PAGES_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_exact_dedup(stream)
    q = (
        out.select("url", "content_hash")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["url"] for r in spark.sql("SELECT * FROM dedup_out").collect()}
    assert "https://dup.example/x" not in got  # cross-batch duplicate dropped
    assert {u for (u, *_r) in rows} <= got     # all six originals survive

    # batch path: same expression, same survivors
    batch = streaming_exact_dedup(spark.createDataFrame(b1 + b2, PAGES_SCHEMA))
    assert batch.count() == 6


def test_curate_stream_gates_and_dedup(spark, tmp_path):
    """Streaming curation: lang/quality gates drop junk inside each
    micro-batch; the watermark state drops a cross-batch exact duplicate;
    the batch twin (same function on a batch frame) keeps the same rows."""
    from openmatch_spark.operators.curate import curate_stream

    good = ("https://ok.example/1",) + gen_pages_rows(1)[0][1:3] + (
        "the quick brown fox jumps over that lazy dog with energy and "
        "grace for the whole long day and that is the story of the fox",
        "en",
    )
    german = ("https://de.example/1",) + good[1:3] + (
        "der schnelle braune fuchs springt und das ist nicht mit ein "
        "problem den ganzen tag und das ist die geschichte der fuchs",
        "de",
    )
    b1 = [good, german]
    dup = ("https://dup.example/1",) + good[1:]  # same text, new url
    fresh = ("https://ok.example/2",) + good[1:3] + (
        "completely different english content about the spark engine and "
        "that big cluster with all of the executors and have fun with it",
        "en",
    )
    b2 = [dup, fresh]

    src = str(tmp_path / "cur_src")
    spark.createDataFrame(b1, PAGES_SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(b2, PAGES_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = curate_stream(stream, min_quality=0.3)
    q = (
        out.select("url", "content_hash")
        .writeStream.format("memory")
        .queryName("curate_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["url"] for r in spark.sql("SELECT * FROM curate_out").collect()}
    assert got == {"https://ok.example/1", "https://ok.example/2"}

    # batch twin: same gate verdicts and same DISTINCT CONTENT survives,
    # but the canonical copy differs by documented design — the stream
    # keeps the first-arrived row, batch keeps earliest (ts, url) (here
    # the duplicate's url sorts before the original's at an equal ts)
    batch_rows = curate_stream(
        spark.createDataFrame(b1 + b2, PAGES_SCHEMA), min_quality=0.3
    ).collect()
    assert len(batch_rows) == 2
    stream_hashes = {
        r["content_hash"]
        for r in spark.sql("SELECT * FROM curate_out").collect()
    }
    assert {r["content_hash"] for r in batch_rows} == stream_hashes


def test_maintain_index_cycle(spark, tmp_path):
    """Drain -> tiered compact -> rebaseline in one call: after the cycle
    the index holds every doc, has settled segments, and its stats reflect
    the grown corpus (not the frozen base)."""
    from openmatch_spark.index.layout import IndexPaths
    from openmatch_spark.streaming.incremental import maintain_index

    rows = gen_pages_rows(120)
    base, e1, e2 = rows[:80], rows[80:100], rows[100:]
    idx_dir, watch, ckpt = (str(tmp_path / d) for d in ("idx", "in", "ckpt"))
    os.makedirs(watch)
    build_index(
        spark, spark.createDataFrame(base, PAGES_SCHEMA), idx_dir,
        num_shards=2, num_term_buckets=4,
    )
    n_base = IndexPaths(idx_dir).read_stats()["n_docs"]
    spark.createDataFrame(e1, PAGES_SCHEMA).write.parquet(watch + "/b1.parquet")
    spark.createDataFrame(e2, PAGES_SCHEMA).write.parquet(watch + "/b2.parquet")

    res = maintain_index(
        spark, watch, idx_dir, ckpt, rebaseline=True, min_merge=2
    )
    assert res["batches"] >= 1 and res["rebaseline"] is not None

    idx = load_index(spark, idx_dir)
    assert idx.docmap.count() == 120
    assert idx.manifest.count() == 1  # settled + rebaselined into one segment
    assert idx.stats["n_docs"] == 120 and n_base == 80  # stats re-baselined
    q = spark.createDataFrame([("q1", "term0001 term0002")], QUERIES_SCHEMA)
    assert search(idx, q, k=10).count() > 0
