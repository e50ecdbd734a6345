"""Continuous rolling features: the streaming twin of the batch
`rolling_event_features` query (plans/relational.py) — for every
arriving event, emit the trailing-24h count / exact-cents sum and the
inter-arrival gap for its key, maintained across micro-batches with
`applyInPandasWithState`.

Semantics match the batch RANGE-frame query exactly when events arrive
in event-time order across batches (intra-batch disorder is re-sorted
by the fold, same contract as the funnel and sessionization streams);
parity is pinned by tests/test_streaming_rolling.py against the batch
query over the same events.

State per key is the (ts, cents) pairs inside the trailing window plus
the last-seen timestamp — O(events in 24 h per key), the same bound the
batch frame has, trimmed on every event. This is the feature-store
shape: the same expression that backfills offline features serves them
online.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

WINDOW_US = 24 * 3600 * 1_000_000

ROLLING_SCHEMA = StructType([
    StructField("event_id", LongType(), False),
    StructField("user_id", LongType(), False),
    StructField("roll_cnt_24h", IntegerType(), False),
    StructField("roll_sum_24h", DoubleType(), False),
    StructField("micros_since_prev", LongType(), True),
])

_STATE_SCHEMA = StructType([
    StructField("ts_us", ArrayType(LongType()), True),
    StructField("cents", ArrayType(LongType()), True),
    StructField("last_us", LongType(), True),
])


def rolling_stream(events: DataFrame, window_us: int = WINDOW_US):
    """Continuous trailing-window features over a stream with columns
    (event_id, ts, user_id, value). Emits one row per event with the
    closed-frame [ts − window, ts] count and exact-cents sum plus the
    gap to the key's previous event (NULL on its first)."""

    def fold(key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"],
             state: GroupState) -> Iterable["pd.DataFrame"]:
        import pandas as pd
        (user_id,) = key
        if state.exists:
            ts_list, cents_list, last_us = state.get
            ts_list, cents_list = list(ts_list), list(cents_list)
        else:
            ts_list, cents_list, last_us = [], [], None
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out = []
        for eid, ts, value in zip(rows["event_id"], rows["ts"],
                                  rows["value"]):
            us = int(ts.value // 1_000)
            cents = int(round(float(value) * 100))
            ts_list.append(us)
            cents_list.append(cents)
            # trim everything strictly older than the closed lower bound
            lo = us - window_us
            start = 0
            while ts_list[start] < lo:
                start += 1
            if start:
                ts_list = ts_list[start:]
                cents_list = cents_list[start:]
            gap = None if last_us is None else us - last_us
            last_us = us
            out.append((int(eid), user_id, len(ts_list),
                        sum(cents_list) / 100.0, gap))
        state.update((ts_list, cents_list, last_us))
        yield pd.DataFrame(out, columns=["event_id", "user_id",
                                         "roll_cnt_24h", "roll_sum_24h",
                                         "micros_since_prev"])

    return (events.groupBy("user_id").applyInPandasWithState(
        fold, outputStructType=ROLLING_SCHEMA, stateStructType=_STATE_SCHEMA,
        outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout))
