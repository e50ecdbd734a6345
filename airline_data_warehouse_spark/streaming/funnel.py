"""Streaming funnel tracking: the continuous twin of the batch
`funnel_conversion` query (plans/relational.py) — per-user ordered
view → click → purchase progression maintained across micro-batches
with `applyInPandasWithState`, emitting one row each time a user
ADVANCES a stage.

Semantics match the batch query exactly when events arrive in event-time
order across batches (intra-batch disorder is fine — each fold re-sorts
its batch): stage 1 is the first view, stage 2 the first click strictly
after it, stage 3 the first purchase strictly after that. The
equivalence is pinned by
tests/test_streaming_funnel.py::test_funnel_stream_matches_batch.

State per user is three int64 timestamps — O(|users|), not O(events);
a funnel is a lifetime property, so there is no watermark-driven
eviction by default (the deployment can bound it with a state-store TTL
when "lifetime" means a marketing window). No timeout is registered:
emission is driven purely by arriving events.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:
    import pandas as pd

FUNNEL_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("stage_reached", IntegerType(), False),
    StructField("reached_ts", TimestampType(), False),
])

_STATE_SCHEMA = StructType([
    StructField("view_us", LongType(), True),
    StructField("click_us", LongType(), True),
    StructField("purchase_us", LongType(), True),
])


def funnel_stream(events: DataFrame):
    """Continuous ordered-funnel tracker over a stream with columns
    (event_id, ts, user_id, event_type). Emits (user_id, stage_reached,
    reached_ts) whenever a user advances: 1 on their first view, 2 on
    the first click strictly after it, 3 on the first purchase strictly
    after that. Events that do not advance the funnel update nothing
    and emit nothing."""

    def fold(key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"],
             state: GroupState) -> Iterable["pd.DataFrame"]:
        import pandas as pd
        (user_id,) = key
        v, c, p = state.get if state.exists else (None, None, None)
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        emits: list[tuple[int, int]] = []
        for ts, et in zip(rows["ts"], rows["event_type"]):
            us = int(ts.value // 1_000)  # pandas ns → µs
            if et == "view" and v is None:
                v = us
                emits.append((1, us))
            elif et == "click" and v is not None and c is None and us > v:
                c = us
                emits.append((2, us))
            elif (et == "purchase" and c is not None and p is None
                  and us > c):
                p = us
                emits.append((3, us))
        if v is not None:
            state.update((v, c, p))
        yield pd.DataFrame(
            [(user_id, stage, pd.Timestamp(us, unit="us"))
             for stage, us in emits],
            columns=["user_id", "stage_reached", "reached_ts"])

    return (events.groupBy("user_id").applyInPandasWithState(
        fold, outputStructType=FUNNEL_SCHEMA, stateStructType=_STATE_SCHEMA,
        outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout))
