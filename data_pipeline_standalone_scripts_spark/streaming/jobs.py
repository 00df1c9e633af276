"""Structured Streaming twins of the T-operators (SURVEY.md §2.9).

Batch forms live in operators/events.py and are oracle-checked; these
jobs run the SAME logical operations as actual streams — file source
replayed in micro-batches (maxFilesPerTrigger=1) so watermarks advance
between batches and state semantics are exercised for real. PT-tested
in tests/test_streaming.py against the batch answers.

Scale notes: in production the source is Kafka/event-hub; everything
below the source line is unchanged (that's the point of Structured
Streaming's unified model). State stores are keyed by the groupBy
key; watermarks bound state size — an unwatermarked streaming agg on
an unbounded key space is a memory leak, so every job here declares
one.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def stage_event_files(
    spark: SparkSession, sf_dir: str, out_dir: str, n_chunks: int = 4
) -> str:
    """Replay prep: split events into n time-ordered json chunk files.

    The file source lists by modification time, so chunk mtimes are
    staggered; with maxFilesPerTrigger=1 each chunk becomes one
    micro-batch, in event-time order — watermarks advance between
    chunks exactly as they would on a live stream.
    """
    from ..tables import load

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    e = (
        load(spark, sf_dir, "events")
        .orderBy("ts", "event_id")
        .withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .toPandas()
    )
    n = len(e)
    for i in range(n_chunks):
        chunk = e.iloc[i * n // n_chunks : (i + 1) * n // n_chunks]
        path = os.path.join(out_dir, f"chunk-{i:03d}.json")
        chunk.to_json(path, orient="records", lines=True, date_format="iso")
        mtime = time.time() - (n_chunks - i) * 10
        os.utime(path, (mtime, mtime))
    return out_dir


def read_event_stream(spark: SparkSession, staged_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(staged_dir)
    )


def run_stream_to_memory(stream_df: DataFrame, name: str, output_mode: str) -> None:
    """Drive a streaming query over all staged files synchronously."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# --- jobs (each returns the streaming DataFrame to hand to the sink) --------


def tumbling_counts_stream(events: DataFrame) -> DataFrame:
    """T1 twin: watermarked 1-hour tumbling count/sum per event type."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_window_stream(events: DataFrame) -> DataFrame:
    """T3 twin: native session_window with 30-minute gap — the
    streaming-side implementation of the batch gaps-and-islands."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame) -> DataFrame:
    """T4 twin: exact streaming dedup on (user_id, event_type) —
    dropDuplicates keeps one row per key across the whole stream
    (unbounded state: fine for a bounded key space like user×type).

    The bounded-state variant, dropDuplicatesWithinWatermark, only
    dedups within the watermark horizon — measured on this corpus
    (30-day replay, 10-min watermark) every key re-emits once state
    evicts. Use it when the key space is unbounded and re-emission
    beyond the horizon is acceptable; use this exact form when the
    key space is bounded. WHICH row survives within a micro-batch is
    partition-order-dependent either way — the oracle-checked batch
    form (operators/events.q_dedup_keyed) uses row_number for that
    reason."""
    return events.dropDuplicates(["user_id", "event_type"])


def dedup_within_watermark_stream(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """T4b twin: BOUNDED-state streaming dedup via
    dropDuplicatesWithinWatermark — the production form for unbounded
    key spaces. State for a key lives only until the watermark passes
    its event time; a duplicate arriving within the horizon is
    dropped, one arriving after state eviction RE-EMITS (the
    documented at-least-once-per-horizon contract, traded for O(1)
    state). The PT test pins both halves of that contract across
    checkpointed restarts; the unbounded exact form stays
    dedup_stream above."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def late_data_agg_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """T5: watermarked tumbling agg in APPEND mode — rows later than
    the watermark are dropped from their (closed) windows; the test
    injects a crafted late row and asserts it is missing."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
        )
    )


def running_counter_stream(events: DataFrame) -> DataFrame:
    """T6 twin: per-user running counters via applyInPandasWithState —
    explicit keyed state (count, value sum) surviving across
    micro-batches; emits one row per user per batch."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_so_far": [n], "value_so_far": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_so_far long, value_so_far double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_static_join(events: DataFrame, customer: DataFrame) -> DataFrame:
    """T7 twin: stream⋈static enrichment — the static dim is re-
    broadcast per micro-batch by the planner."""
    return (
        events.join(F.broadcast(customer), events.user_id == customer.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def stream_stream_funnel_join(events: DataFrame) -> DataFrame:
    """Stream-stream interval join — the streaming twin of
    q_event_funnel (operators/events.py): clicks joined to purchases
    of the same user within 1 hour, both sides watermarked so the
    join state is bounded (clicks can be dropped once no purchase
    within the hour can still arrive; purchases once they are older
    than any retained click).

    Scale: state is keyed by user_id and pruned by the watermark —
    the canonical bounded-state pattern for event-sequence detection
    on an unbounded stream.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "2 hours")
    )
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("click_ts"))
        & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("user_id", "click_ts", "p_ts")


def stream_stream_outer_join(events: DataFrame) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every click, matched to
    a same-user purchase within 1 hour when one exists, else emitted
    with NULL purchase columns ONCE the watermark proves no match can
    still arrive. The outer side is the semantics real funnels need
    ("which clicks did NOT convert?") and exercises the subtler state
    machine: unmatched rows are held until the watermark passes their
    join window, then released as null-extended output.

    Scale: same user-keyed, watermark-pruned state as the inner join —
    the null-release adds no state, only a deferred emission at
    watermark advance.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "2 hours")
    )
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("click_ts"))
        & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    ).select(
        "user_id",
        "click_ts",
        "p_ts",
        F.col("p_ts").isNotNull().alias("converted"),
    )


def running_counter_tws_stream(events: DataFrame) -> DataFrame:
    """T6 twin, modern API: the same per-user running counters through
    Spark 4's transformWithStateInPandas — a StatefulProcessor with an
    explicit ValueState, the arbitrary-stateful-processing surface that
    replaces applyInPandasWithState (typed state handles, timers,
    initial-state support). Functionally identical to
    running_counter_stream; the test asserts both agree with the batch
    cumulative totals. NOTE: the TWS Python worker needs the protobuf
    package for state serialization — in environments without it the
    query fails at runtime (the pytest importorskips accordingly);
    the applyInPandasWithState twin above carries the tested behavior.

    Scale: state is keyed by user_id in the state store (RocksDB at
    production scale) — one (count, sum) record per user, partitioned
    with the shuffle; nothing driver-side.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [StructField("n", LongType()), StructField("total", DoubleType())]
    )

    class RunningCounter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("counter", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_so_far": [n],
                    "value_so_far": [total],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningCounter(),
        outputStructType="user_id long, n_so_far long, value_so_far double",
        outputMode="Update",
        timeMode="None",
    )


def run_foreachbatch_upsert(
    stream_df: DataFrame, state_dir: str, checkpoint_dir: str
) -> None:
    """The foreachBatch keyed-upsert sink: each micro-batch collapses
    to one row per user (latest ts + running value sum partials) and
    MERGEs into a parquet state table — read current state, outer-join
    the batch partials, write back. This is the idiomatic Structured
    Streaming path to any sink without native streaming support
    (JDBC, plain parquet) while keeping per-key upsert semantics.

    Exactly-once: foreachBatch can be re-invoked with the same
    batch_id on recovery, so the state table records the last applied
    batch_id and the merge SKIPS batches it has already absorbed —
    the standard idempotent-sink recipe.

    Scale: state read+rewrite per batch is the simple form; a real
    100 TB deployment partitions state by key range and rewrites only
    partitions the batch touches (dynamic partition overwrite —
    q_dynamic_overwrite is exactly that move).
    """
    import os

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = (
            batch_df.groupBy("user_id")
            .agg(
                F.max("ts").alias("last_ts"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .withColumn("last_batch", F.lit(batch_id))
        )
        if os.path.exists(state_dir):
            cur = spark.read.parquet(state_dir)
            if cur.agg(F.max("last_batch")).collect()[0][0] >= batch_id:
                return  # already applied — idempotent replay
            merged = (
                cur.select("user_id", "last_ts", "n_events")
                .withColumnRenamed("last_ts", "c_ts")
                .withColumnRenamed("n_events", "c_n")
                .join(part.drop("last_batch"), "user_id", "full_outer")
                .select(
                    "user_id",
                    F.greatest(
                        F.coalesce("last_ts", "c_ts"),
                        F.coalesce("c_ts", "last_ts"),
                    ).alias("last_ts"),
                    (
                        F.coalesce("c_n", F.lit(0))
                        + F.coalesce("n_events", F.lit(0))
                    ).alias("n_events"),
                    F.lit(batch_id).alias("last_batch"),
                )
            )
        else:
            merged = part
        merged.cache().count()  # materialize BEFORE overwriting the input
        merged.write.mode("overwrite").parquet(state_dir)
        merged.unpersist()

    q = (
        stream_df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination returns False on timeout — a half-drained replay
    # must fail loudly, not leave a partial state table behind
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("keyed-upsert availableNow replay did not drain in 300 s")
