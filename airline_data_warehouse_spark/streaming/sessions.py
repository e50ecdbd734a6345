"""Sessionization: gap-based session windows over an event stream — the
canonical CUSTOM STATEFUL operator Spark has no builtin for.

Two implementations with identical semantics (a session = maximal run of
a key's events where consecutive gaps ≤ ``gap``):

* ``sessionize_batch`` — declarative: lag-gap flag → running sum →
  group. Fully oracle-checkable; this is also what you run for backfill.
* ``sessionize_stream`` — ``applyInPandasWithState``: per-key state
  (open session aggregates) across micro-batches, closed sessions
  emitted when the gap is exceeded or the state times out. The streaming
  path for the same query.

Scale: both shuffle once on the key. The streaming state is O(open
sessions), bounded by the timeout; the batch window is the standard
sessionization plan every warehouse runs.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:
    import pandas as pd

DEFAULT_GAP_MINUTES = 30

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("session_start", TimestampType(), True),
    StructField("session_end", TimestampType(), True),
    StructField("n_events", IntegerType(), True),
    StructField("total_value", DoubleType(), True),
])

_STATE_SCHEMA = StructType([
    StructField("start_us", LongType(), True),
    StructField("last_us", LongType(), True),
    StructField("n", LongType(), True),
    StructField("total_cents", LongType(), True),
])


def sessionize_batch(events: DataFrame, gap_minutes: int = DEFAULT_GAP_MINUTES,
                     key_col: str = "user_id", ts_col: str = "ts",
                     value_col: str = "value") -> DataFrame:
    """Batch sessionization: new-session flag where the gap to the
    previous event exceeds the threshold, running-sum the flags into a
    session sequence, then aggregate per (key, session)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    # .cast("timestamp") tolerates TIMESTAMP_NTZ inputs (session tz is
    # pinned UTC, so the cast is value-identical; no-op when already TZ)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.unix_micros(F.lag(ts_col).over(w).cast("timestamp"))
    new_flag = F.when(prev_us.isNull()
                      | (ts_us - prev_us > gap_us), 1).otherwise(0)
    flagged = events.withColumn("_new", new_flag)
    seq = F.sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # exact cents accumulation keeps total_value engine-independent
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    return (flagged.withColumn("_seq", seq)
            .groupBy(F.col(key_col), F.col("_seq"))
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count("*").cast("int").alias("n_events"),
                 (F.sum(cents).cast("double") / 100).alias("total_value"))
            .drop("_seq"))


def sessionize_stream(events: DataFrame, gap_minutes: int = DEFAULT_GAP_MINUTES):
    """Streaming sessionization with applyInPandasWithState.

    State per key: the open session's (start, last_ts, n, cents). Each
    batch folds its (sorted) events into the state, emitting every
    session closed by a too-large gap; an EVENT-TIME timeout (watermark
    passes last_event + gap) flushes the open session when the key goes
    quiet. Event-time (not processing-time) timeouts matter twice over:
    the gap is defined on event time, and processing-time timers would
    schedule empty micro-batches forever (so drains like
    ``processAllAvailable`` never return).
    """
    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60 * 1_000

    def fold(key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"],
             state: GroupState) -> Iterable["pd.DataFrame"]:
        import pandas as pd
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                s, last, n, cents = state.get
                closed.append((user_id, s, last, n, cents))
                state.remove()
        else:
            rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
            cur = list(state.get) if state.exists else None
            for ts, value in zip(rows["ts"], rows["value"]):
                us = int(ts.value // 1_000)  # pandas ns → µs
                cents = int(round(float(value) * 100))
                if cur is None:
                    cur = [us, us, 1, cents]
                elif us - cur[1] > gap_us:
                    closed.append((user_id, cur[0], cur[1], cur[2], cur[3]))
                    cur = [us, us, 1, cents]
                else:
                    cur[1] = us
                    cur[2] += 1
                    cur[3] += cents
            if cur is not None:
                state.update(tuple(cur))
                # flush when the watermark passes last_event + gap; the
                # timestamp must stay ahead of the current watermark
                timeout_ms = max(cur[1] // 1_000 + gap_ms,
                                 state.getCurrentWatermarkMs() + 1)
                state.setTimeoutTimestamp(timeout_ms)

        out = pd.DataFrame(
            [(u, pd.Timestamp(s, unit="us"), pd.Timestamp(e, unit="us"),
              int(n), c / 100.0) for u, s, e, n, c in closed],
            columns=["user_id", "session_start", "session_end",
                     "n_events", "total_value"])
        yield out

    return (events
            .withWatermark("ts", f"{gap_minutes} minutes")
            .groupBy("user_id").applyInPandasWithState(
                fold, outputStructType=SESSION_SCHEMA, stateStructType=_STATE_SCHEMA,
                outputMode="append", timeoutConf=GroupStateTimeout.EventTimeTimeout))
