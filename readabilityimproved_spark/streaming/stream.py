"""Structured Streaming surfaces.

The reference is strictly batch (one URL list, one run: Extractor.java:
77-130); these are the engine's additions for continuous corpora:

  * streaming_extraction -- readStream over the same span-shaped parquet
    layout -> the SAME fused Arrow kernel (mapInPandas composes with
    streaming) -> writeStream with checkpointing. Exactly-once per
    epoch via the file-source + checkpoint contract; resume semantics
    come from the sink checkpoint instead of the batch lineage table.
  * windowed_event_metrics -- event-time tumbling windows with a
    watermark for late data.
  * sessionize_events -- custom stateful operator via
    applyInPandasWithState (session gap timeout), the pattern for any
    reference-less stateful extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import signed_scaled_int
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.extract import extract_spans

SPANS_DDL = (
    "doc_id string, base_uri string, part int, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def streaming_extraction(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """File-source streaming extraction; returns the started query."""
    stream = (
        spark.readStream.schema(SPANS_DDL)
        .option("maxFilesPerTrigger", "8")
        .parquet(input_path)
    )
    extracted = extract_spans(stream)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_metrics(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time windows with late-data watermark; works on both
    batch and streaming DataFrames (same plan, Catalyst handles both).

    The batch path keeps the event-time column's own type: window() is
    NTZ-capable, and a cast through session-timezone TIMESTAMP would
    shift wall times that fall in a DST gap on a non-UTC driver (the
    oracle compares naive timestamps). Only the streaming watermark
    needs the TIMESTAMP cast."""
    src = events
    if events.isStreaming:
        src = events.withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window_duration).alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            # exact scaled-integer sum: a double sum is summation-order-
            # dependent across engines/partitionings; micros-scaled BIGINT
            # is associative, so the result is deterministic at any
            # parallelism (same discipline as the similarity tier)
            F.sum(signed_scaled_int(F.col("value"), 1e6)).alias(
                "sum_value_micros"
            ),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_micros",
            "approx_users",
        )
    )


_SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("status", StringType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("start_ns", LongType()),
        StructField("end_ns", LongType()),
        StructField("n", LongType()),
    ]
)


_SESSION_GAP_MS = 30 * 60 * 1000


def _session_fn(key, pdfs, state: GroupState):
    """EVENT-TIME gap sessionization kernel (runs per user_id group).

    Events are split on 30-min event-time gaps WITHIN the batch (sorted,
    then boundary scan), merged with any carried-over state session;
    every completed session is emitted 'closed' immediately and the
    trailing one stays in state as 'open' (closed later by the
    processing-time idle timeout). This makes the stateful operator
    batch-parity-exact: over a single availableNow batch,
    closed + open rows == sessionize_events_batch (pinned by
    tests/test_streaming_multimodal.py).
    State timestamps are nanoseconds, so no precision is lost against
    the batch twin's raw event times.
    """
    import pandas as pd

    def row(start_ns, end_ns, n, status):
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_ns)],
                "session_end": [pd.Timestamp(end_ns)],
                "n_events": [n],
                "status": [status],
            }
        )

    if state.hasTimedOut:
        start_ns, end_ns, n = state.get
        state.remove()
        yield row(start_ns, end_ns, n, "closed")
        return

    ts_ns: list[int] = []
    for pdf in pdfs:
        if len(pdf):
            ts_ns.extend(int(v) for v in pdf["ts"].astype("int64"))
    if not ts_ns:
        return
    ts_ns.sort()

    gap_ns = _SESSION_GAP_MS * 1_000_000
    cur = list(state.get) if state.exists else None  # [start, end, n]
    for t in ts_ns:
        if cur is None:
            cur = [t, t, 1]
        elif t - cur[1] > gap_ns:
            yield row(cur[0], cur[1], cur[2], "closed")
            cur = [t, t, 1]
        else:
            cur[1] = max(cur[1], t)
            cur[2] += 1
    state.update((cur[0], cur[1], cur[2]))
    state.setTimeoutDuration(_SESSION_GAP_MS)  # idle close for the open tail
    yield row(cur[0], cur[1], cur[2], "open")


def streaming_dedup(
    stream: DataFrame,
    id_cols: tuple[str, ...] = ("doc_id",),
    event_time_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-id emission for a continuous corpus, with
    BOUNDED state: dropDuplicatesWithinWatermark keeps an id in state
    only until the watermark passes it, so state size is (arrival rate x
    delay), not (total ids ever seen) -- a plain dropDuplicates on an
    unbounded stream of 10^12 docs grows state forever and dies. On a
    batch frame the same call degrades to an ordinary dropDuplicates
    (its batch-parity twin, also the operators.dedup exact path). The
    TIMESTAMP cast happens only on the streaming branch (the watermark
    needs it); the batch path leaves the column untouched, so output
    values never depend on the driver session's timezone."""
    if stream.isStreaming:
        src = stream.withColumn(
            event_time_col, F.col(event_time_col).cast("timestamp")
        )
        return src.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
            list(id_cols)
        )
    return stream.dropDuplicates(list(id_cols))


def sessionize_events(events_stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user session tracking with
    a 30-minute gap timeout (applyInPandasWithState)."""
    return (
        events_stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=_SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def sessionize_events_batch(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Batch-parity gap sessionization: the relational statement of what
    the applyInPandasWithState operator above computes incrementally
    (same 30-min gap rule), so the stateful path has a SQL-checkable
    twin.

    lag + cumulative-sum-of-boundaries; both window functions use the
    default RANGE frame, so tied timestamps land in the same session
    regardless of intra-tie order -- the result is deterministic and
    engine-independent. Scale: two window passes over (user_id, ts),
    one shuffle on user_id which the groupBy then reuses.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    # MICROSECOND gap comparison: the stateful sessionizer compares raw
    # int64 event times (ns), and parquet timestamps carry us precision,
    # so a second-truncated comparison would sessionize an event landing
    # within 1s of the gap boundary differently across the three paths
    # (stateful / batch twin / oracle). Computed on NTZ wall time
    # (shared idiom: functions/eventtime.py) -- a unix_micros(cast as
    # TIMESTAMP) detour would shift events in a DST gap on a non-UTC
    # driver session. Only DIFFERENCES are used, so the epoch
    # convention cancels out.
    from readabilityimproved_spark.functions.eventtime import (
        ntz_epoch_micros,
    )

    micros = ntz_epoch_micros("ts")
    prev = F.lag(micros).over(w)
    gap_us = gap_minutes * 60 * 1_000_000
    new_s = F.when(prev.isNull() | ((micros - prev) > gap_us), 1).otherwise(0)
    sessions = events.withColumn("_new", new_s).withColumn(
        "session_id", F.sum("_new").over(w)
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        # exact scaled-integer sum (see windowed_event_metrics)
        F.sum(signed_scaled_int(F.col("value"), 1e6)).alias(
            "sum_value_micros"
        ),
    )
