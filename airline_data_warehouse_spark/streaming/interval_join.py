"""Stream-stream interval join: correlate two live event streams whose
rows match when their event times fall within a tolerance of each other
— the continuous twin of the batch `range_join_events` query
(plans/relational.py, operators/asof.py range_join_binned), e.g. error
events joined to the signup that happened within an hour, while both
sides are still arriving.

This is Spark's symmetric watermarked join, not a table lookup: BOTH
sides buffer in state until the other side's watermark passes the edge
of the tolerance window, then are evicted. The two constraints Spark
needs to bound that state — and which this module enforces rather than
trusts callers to remember — are:

* a watermark on each side's event-time column, and
* a time-RANGE join condition relating the two event times (the
  equi-key alone would force unbounded state: any future row might
  match).

State per side is O(arrival rate x (watermark delay + tolerance)),
independent of stream history — the same bound the batch twin's bin
bucketing gives per partition. At 100 TB/day the join shuffles both
streams on the equi-key exactly once per micro-batch; skewed keys salt
the same way the batch join does.

Inner-join semantics: a pair is emitted as soon as both rows have
arrived (watermarks only bound state and lateness, they do not delay
inner results), so replaying the same rows through any micro-batch
split yields exactly the batch join's pair set — pinned by
tests/test_streaming_interval.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(left: DataFrame, right: DataFrame, key: str,
                         left_ts: str, right_ts: str,
                         tolerance_seconds: int = 3600,
                         watermark: str = "2 hours",
                         how: str = "inner") -> DataFrame:
    """Join two STREAMING frames on `key` where
    |left_ts - right_ts| <= tolerance_seconds.

    `left` and `right` must not share column names other than `key`
    (rename before calling, as the batch range_join_binned requires).
    The watermark delay is how much event-time disorder each stream
    tolerates; rows later than that may be dropped from state before
    their partner arrives — the standard completeness/state trade, and
    the knob a 100 TB deployment tunes per stream lag SLO.

    how="left_outer" emits each unmatched left row (right columns
    NULL) only once the global watermark has passed the far edge of
    its tolerance window — before that a partner could still arrive.
    Consequence worth knowing at the tail of a replay: rows inside the
    final watermark horizon stay in state with their verdict pending
    until a later event advances the watermark, so a finite replay's
    unmatched tail emits nothing (the inner results still all emit).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    tol = F.expr(f"INTERVAL {int(tolerance_seconds)} SECONDS")
    cond = ((lw[key] == rw[key])
            & (rw[right_ts] >= lw[left_ts] - tol)
            & (rw[right_ts] <= lw[left_ts] + tol))
    return lw.join(rw, cond, how).drop(rw[key])


def error_signup_stream(errors: DataFrame, signups: DataFrame,
                        tolerance_seconds: int = 3600,
                        watermark: str = "2 hours",
                        how: str = "inner") -> DataFrame:
    """The named pipeline the batch `range_join_events` query runs
    continuously: (error_id, signup_id, user_id) pairs within the
    tolerance. Inputs: errors(error_id, user_id, error_ts),
    signups(signup_id, s_user_id, signup_ts). how="left_outer" adds
    the escalation rows — errors with NO signup within the tolerance —
    once the watermark proves no partner can still arrive."""
    signups = signups.withColumnRenamed("s_user_id", "user_id")
    joined = interval_join_stream(errors, signups, key="user_id",
                                  left_ts="error_ts",
                                  right_ts="signup_ts",
                                  tolerance_seconds=tolerance_seconds,
                                  watermark=watermark, how=how)
    return joined.select("error_id", "signup_id", "user_id")
