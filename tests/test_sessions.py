"""Sessionization tests: batch/stream semantic agreement on crafted
timelines, and the applyInPandasWithState path across micro-batches."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from airline_data_warehouse_spark.streaming.sessions import (
    sessionize_batch,
    sessionize_stream,
)

EVENTS = [
    # user 1: two sessions separated by a 2-hour gap
    (0, "2023-06-01 10:00:00", 1, 10.0),
    (1, "2023-06-01 10:10:00", 1, 20.0),
    (2, "2023-06-01 12:30:00", 1, 5.0),
    (3, "2023-06-01 12:40:00", 1, 5.0),
    # user 2: one session, events arriving out of order
    (4, "2023-06-01 11:05:00", 2, 1.0),
    (5, "2023-06-01 11:00:00", 2, 2.0),
]


def _events_df(spark):
    df = spark.createDataFrame(EVENTS, "event_id long, ts string, user_id long, value double")
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_batch_sessionization(spark):
    out = sessionize_batch(_events_df(spark))
    rows = sorted([(r["user_id"], str(r["session_start"]), r["n_events"], r["total_value"])
                   for r in out.collect()])
    assert rows == [
        (1, "2023-06-01 10:00:00", 2, 30.0),
        (1, "2023-06-01 12:30:00", 2, 10.0),
        (2, "2023-06-01 11:00:00", 2, 3.0),
    ]


def test_stream_sessionization(spark, tmp_path):
    # batch 1: user 1's first session + user 2; batch 2: user 1's second
    # session (the gap closes session 1 INSIDE the stateful fold)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    b1 = [e for e in EVENTS if e[0] in (0, 1, 4, 5)]
    b2 = [e for e in EVENTS if e[0] in (2, 3)]
    with open(in_dir / "b1.json", "w") as f:
        for e in b1:
            f.write(json.dumps({"event_id": e[0], "ts": e[1], "user_id": e[2],
                                "value": e[3]}) + "\n")

    src = (spark.readStream
           .schema("event_id long, ts timestamp, user_id long, value double")
           .option("maxFilesPerTrigger", 1)
           .json(str(in_dir)))
    sessions = sessionize_stream(src)
    q = (sessions.writeStream.outputMode("append")
         .format("memory").queryName("sessions_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
        # nothing closed yet: both users have open sessions in state
        assert spark.sql("SELECT * FROM sessions_out").count() == 0

        with open(in_dir / "b2.json", "w") as f:
            for e in b2:
                f.write(json.dumps({"event_id": e[0], "ts": e[1], "user_id": e[2],
                                    "value": e[3]}) + "\n")
        q.processAllAvailable()
        rows = {(r["user_id"], str(r["session_start"])): r
                for r in spark.sql("SELECT * FROM sessions_out").collect()}
        # the 2h gap closed user 1's first session; totals are exact
        assert (1, "2023-06-01 10:00:00") in rows
        closed = rows[(1, "2023-06-01 10:00:00")]
        assert closed["n_events"] == 2 and closed["total_value"] == 30.0
        assert str(closed["session_end"]) == "2023-06-01 10:10:00"
    finally:
        q.stop()
