"""Streaming event analytics: watermarked windowed aggregation and a
custom stateful sessionizer (applyInPandasWithState).

No reference counterpart (OpenMatch is batch IR) — these are the
Structured-Streaming operators a web-scale ingest pipeline runs next to the
index: traffic/quality rollups over the event firehose, and user
sessionization for training-data curation. Both run identically from a
file-source stream (tested with Trigger.AvailableNow) or a Kafka source —
only the reader line changes.

Scale notes:
- windowed_event_stats is a streaming state-store agg keyed by
  (window, event_type): the watermark bounds state (late rows beyond it are
  dropped), partial aggregation combines map-side, output mode "update" or
  "append" both work.
- sessionize keeps ONE open session struct per user in the state store —
  O(active users) state, bounded by the processing-time timeout that
  force-closes idle sessions.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_event_stats(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """(window_start, window_end, event_type, n_events, total_value,
    n_users): tumbling-window rollup. On a streaming DF the watermark
    bounds agg state and admits late rows up to `watermark`; the SAME
    expression runs on a batch DF (watermark is a streaming-only no-op),
    which is how the test cross-checks stream output against batch truth.
    """
    # watermarks require TIMESTAMP (with tz); parquet event times often load
    # as TIMESTAMP_NTZ — cast uniformly so batch and stream plans agree
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.approx_count_distinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
            "n_users",
        )
    )


def sessionize_batch(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Batch gaps-and-islands twin of sessionize(): same gap rule
    (strictly more than gap_seconds of inactivity starts a new session,
    microsecond-exact like the stateful kernel) as pure window algebra —
    lag -> new-session flag -> running sum -> group. No Python in the plan;
    the only shuffle is the user_id hash partitioning shared by both window
    steps and the final aggregation.

    Session membership is deterministic under ts ties: tied rows have a
    zero gap to their tie-neighbour, so exactly one row of a tie group can
    open a session regardless of the tie order either engine picks.

    (user_id, session_seq, session_start, session_end, n_events,
    total_value) — one row per COMPLETED-or-open session, unlike the
    streaming twin which emits only closed ones; equivalence on closed
    sessions is pytest-checked in tests/test_streaming.py.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    src = events.select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    marked = src.withColumn(
        "new_session",
        F.when(gap_us <= F.lit(gap_seconds * 1_000_000), F.lit(0)).otherwise(F.lit(1)),
    )
    sess = marked.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("closed_by", StringType()),  # 'gap' | 'timeout'
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state: GroupState):
        user_id = int(key[0])
        out = []
        if state.hasTimedOut:
            if state.exists:
                s0, s1, n, v = state.get
                out.append((user_id, s0, s1, n, v, "timeout"))
                state.remove()
        else:
            rows = pd.concat(list(pdfs))
            rows = rows.sort_values("ts")
            # pin the epoch unit explicitly: a bare astype("int64") yields
            # whatever resolution the Arrow->pandas path delivered (ns
            # today, us under pandas-2 resolution-preserving conversion) and
            # a silent unit change would shrink every gap 1000x
            ts_us = rows["ts"].astype("datetime64[us]").astype("int64").tolist()
            vals = rows["value"].tolist()
            if state.exists:
                s0, s1, n, v = state.get
            else:
                s0 = s1 = None
            for t, val in zip(ts_us, vals):
                if s0 is None:
                    s0, s1, n, v = t, t, 1, float(val)
                elif t - s1 > gap_us:
                    out.append((user_id, s0, s1, n, v, "gap"))
                    s0, s1, n, v = t, t, 1, float(val)
                else:
                    s1 = max(s1, t)
                    n += 1
                    v += float(val)
            state.update((s0, s1, n, v))
            state.setTimeoutDuration(gap_seconds * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": pd.to_datetime([o[1] for o in out], unit="us"),
                    "session_end": pd.to_datetime([o[2] for o in out], unit="us"),
                    "n_events": [o[3] for o in out],
                    "total_value": [round(o[4], 6) for o in out],
                    "closed_by": [o[5] for o in out],
                }
            )

    return fn


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): split
    each user's event stream into sessions separated by > gap_seconds of
    inactivity. Emits a row when a session CLOSES — by a later event
    arriving past the gap, or by a processing-time timeout flushing an
    idle user. State per user is one 4-field struct.
    """
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def streaming_exact_dedup(
    pages: DataFrame,
    watermark: str = "24 hours",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    url_col: str | None = None,
) -> DataFrame:
    """Streaming twin of the batch exact-dedup stage: drop every document
    whose normalized text content was already seen, ACROSS micro-batches,
    with state bounded by the watermark (dropDuplicatesWithinWatermark keys
    the state store on the content hash and expires entries once the
    watermark passes them — unbounded dedup state is the classic way a
    streaming ingest OOMs at web scale).

    Emits the surviving rows with a `content_hash` column, ready to feed
    the incremental indexer. Survivor choice: the stream keeps the
    FIRST-ARRIVED copy (state-store semantics); the batch path keeps the
    earliest event-time copy (ties broken by url when present) — a
    DETERMINISTIC canonical, unlike bare dropDuplicates whose survivor
    depends on partitioning, so a backfill run twice indexes the same rows.

    url_col switches the dedup key from the content hash to the CANONICAL
    url (operators/transforms.py canonical_url_col): http/https, default-
    port, #fragment and tracking-param variants of one page collapse to a
    single survivor even when extraction produced byte-different text
    (banner rotation) — the key a recrawl-heavy Common-Crawl ingest wants.
    Rows whose url canonicalizes to NULL fall back to the content hash, so
    they are never all glued into one bogus state key. Both key columns
    are always emitted.
    """
    from pyspark.sql import Window

    from openmatch_spark.operators.dedup import normalized_text

    hashed = pages.withColumn(
        "content_hash", F.md5(normalized_text(F.col(text_col)))
    ).withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if url_col is not None:
        from openmatch_spark.operators.transforms import (
            canonical_url_col,
            url_dedup_key_col,
        )

        # the state key folds the http/https split (url_dedup_key_col);
        # the emitted canonical_url keeps the scheme
        hashed = hashed.withColumn(
            "canonical_url", canonical_url_col(F.col(url_col))
        ).withColumn(
            "_dedup_key",
            F.coalesce(url_dedup_key_col(F.col(url_col)), F.col("content_hash")),
        )
        key_cols = ["_dedup_key"]
    else:
        key_cols = ["content_hash"]
    if hashed.isStreaming:
        out = hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
        return out.drop("_dedup_key") if url_col is not None else out
    order = [F.col(ts_col).asc()]
    if "url" in hashed.columns:
        order.append(F.col("url").asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    out = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return out.drop("_dedup_key") if url_col is not None else out
