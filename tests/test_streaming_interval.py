"""Stream/batch equivalence for the stream-stream interval join."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from airline_data_warehouse_spark.streaming.interval_join import (
    error_signup_stream,
)


def _write_chunks(in_dir, chunks, ts_col):
    import os
    import time

    import pandas as pd
    in_dir.mkdir(exist_ok=True)
    base = time.time()
    for i, chunk in enumerate(chunks):
        path = in_dir / f"b{i:03d}.json"
        with open(path, "w") as f:
            for e in chunk:
                row = dict(e)
                row[ts_col] = str(pd.Timestamp(row[ts_col], unit="us"))
                f.write(json.dumps(row) + "\n")
        # Spark's file stream source orders files by modification time;
        # sub-millisecond writes tie, making batch order (and therefore
        # watermark advancement) nondeterministic — a later-time chunk
        # consumed first drops earlier events as late. Pin strictly
        # increasing mtimes so micro-batches replay in chunk order.
        os.utime(path, (base + i, base + i))


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """sf0.001 error/signup events replayed as two independent
    micro-batched file streams (different batch boundaries per side,
    shuffled within batches) emit EXACTLY the batch range_join_events
    pair set."""
    import random

    from airline_data_warehouse_spark.plans.registry import all_queries, load

    sf = "/root/testdata/sf0.001"
    events = load(spark, sf, "events")
    errors = [r.asDict() for r in
              (events.filter(F.col("event_type") == "error")
                     .select(F.col("event_id").alias("error_id"), "user_id",
                             F.unix_micros("ts").alias("error_ts"))).collect()]
    signups = [r.asDict() for r in
               (events.filter(F.col("event_type") == "signup")
                      .select(F.col("event_id").alias("signup_id"),
                              F.col("user_id").alias("s_user_id"),
                              F.unix_micros("ts").alias("signup_ts"))
                ).collect()]
    rng = random.Random(23)

    def split(rows, n, ts_col):
        # time-ordered micro-batches (the watermark contract), shuffled
        # WITHIN each batch — intra-batch disorder is what watermarks
        # absorb; inter-batch time travel is not
        rows.sort(key=lambda e: e[ts_col])
        cuts = sorted(rng.sample(range(1, len(rows)), n - 1))
        chunks = [rows[a:b] for a, b in zip([0] + cuts, cuts + [len(rows)])]
        for c in chunks:
            rng.shuffle(c)
        return chunks

    _write_chunks(tmp_path / "errs", split(errors, 4, "error_ts"), "error_ts")
    _write_chunks(tmp_path / "sups", split(signups, 3, "signup_ts"),
                  "signup_ts")

    err_src = (spark.readStream
               .schema("error_id long, user_id long, error_ts timestamp")
               .option("maxFilesPerTrigger", 1).json(str(tmp_path / "errs")))
    sup_src = (spark.readStream
               .schema("signup_id long, s_user_id long, signup_ts timestamp")
               .option("maxFilesPerTrigger", 1).json(str(tmp_path / "sups")))
    q = (error_signup_stream(err_src, sup_src)
         .writeStream.outputMode("append").format("memory")
         .queryName("ivj")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600)

    got = {(r["error_id"], r["signup_id"], r["user_id"])
           for r in spark.sql("SELECT * FROM ivj").collect()}
    expect = {(r["error_id"], r["signup_id"], r["user_id"])
              for r in all_queries()["range_join_events"]
              .builder(spark, sf).collect()}
    assert got == expect
    assert len(got) > 0


def test_interval_join_state_evicts_with_watermark(spark, tmp_path):
    """The physical plan carries watermarks on both sides and a
    time-range condition — the two preconditions for bounded join
    state. (Spark refuses unbounded stream-stream joins in append mode
    outright, so a successful start already implies state cleanup is
    possible; this pins that we didn't regress into that error.)"""
    (tmp_path / "noop_e").mkdir()
    (tmp_path / "noop_s").mkdir()
    err_src = (spark.readStream
               .schema("error_id long, user_id long, error_ts timestamp")
               .json(str(tmp_path / "noop_e")))
    sup_src = (spark.readStream
               .schema("signup_id long, s_user_id long, signup_ts timestamp")
               .json(str(tmp_path / "noop_s")))
    df = error_signup_stream(err_src, sup_src, tolerance_seconds=60,
                             watermark="10 minutes")
    assert df.isStreaming
    # both watermark columns survive into the logical plan
    plan = df._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2


def test_interval_join_left_outer_emits_escalations(spark, tmp_path):
    """left_outer: every error with NO signup within the tolerance
    emits exactly one (error_id, NULL) escalation row once the
    watermark passes its window — proven by a far-future sentinel
    batch that advances the watermark past every real event. Matched
    pairs are identical to the inner join's."""
    import random

    from airline_data_warehouse_spark.plans.registry import all_queries, load

    sf = "/root/testdata/sf0.001"
    events = load(spark, sf, "events")
    errors = [r.asDict() for r in
              (events.filter(F.col("event_type") == "error")
                     .select(F.col("event_id").alias("error_id"), "user_id",
                             F.unix_micros("ts").alias("error_ts"))).collect()]
    signups = [r.asDict() for r in
               (events.filter(F.col("event_type") == "signup")
                      .select(F.col("event_id").alias("signup_id"),
                              F.col("user_id").alias("s_user_id"),
                              F.unix_micros("ts").alias("signup_ts"))
                ).collect()]
    rng = random.Random(31)
    errors.sort(key=lambda e: e["error_ts"])
    signups.sort(key=lambda e: e["signup_ts"])
    cut_e = rng.randrange(1, len(errors))
    cut_s = rng.randrange(1, len(signups))
    horizon = max(errors[-1]["error_ts"], signups[-1]["signup_ts"])
    far = horizon + 10 * 3600 * 1_000_000
    # sentinels on BOTH sides: the query's watermark is the MIN across
    # all event-time columns, so advancing only one stream would leave
    # every error within (delay + tolerance) of the other stream's end
    # unresolved in state
    e_sentinel = {"error_id": -1, "user_id": -1, "error_ts": far}
    s_sentinel = {"signup_id": -2, "s_user_id": -2, "signup_ts": far}
    _write_chunks(tmp_path / "errs",
                  [errors[:cut_e], errors[cut_e:], [e_sentinel]], "error_ts")
    _write_chunks(tmp_path / "sups",
                  [signups[:cut_s], signups[cut_s:], [s_sentinel]],
                  "signup_ts")

    err_src = (spark.readStream
               .schema("error_id long, user_id long, error_ts timestamp")
               .option("maxFilesPerTrigger", 1).json(str(tmp_path / "errs")))
    sup_src = (spark.readStream
               .schema("signup_id long, s_user_id long, signup_ts timestamp")
               .option("maxFilesPerTrigger", 1).json(str(tmp_path / "sups")))
    q = (error_signup_stream(err_src, sup_src, how="left_outer")
         .writeStream.outputMode("append").format("memory")
         .queryName("ivj_lo")
         .option("checkpointLocation", str(tmp_path / "ckpt_lo"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600)

    rows = [r for r in spark.sql("SELECT * FROM ivj_lo").collect()
            if r["error_id"] != -1]
    got_pairs = {(r["error_id"], r["signup_id"]) for r in rows
                 if r["signup_id"] is not None}
    got_escal = {r["error_id"] for r in rows if r["signup_id"] is None}

    batch = all_queries()["range_join_events"].builder(spark, sf).collect()
    expect_pairs = {(r["error_id"], r["signup_id"]) for r in batch}
    matched = {e for e, _ in expect_pairs}
    expect_escal = {e["error_id"] for e in errors} - matched

    assert got_pairs == expect_pairs
    assert got_escal == expect_escal
    # exactly one escalation row per unmatched error
    assert len([r for r in rows if r["signup_id"] is None]) == len(got_escal)


def test_interval_join_restart_restores_state(spark, tmp_path):
    """Kill the join after the first half of both streams, restart from
    the same checkpoint with the second halves: pairs that straddle the
    cut (error before, signup after) must still emit — the join state is
    restored from the checkpoint — and nothing already emitted repeats.
    Both sides split at one cut TIME, so every straddling pair is within
    the tolerance (1 h) of the cut and safely inside the restored
    watermark horizon (2 h)."""
    from pyspark.sql import functions as F

    from airline_data_warehouse_spark.plans.registry import all_queries, load

    sf = "/root/testdata/sf0.001"
    events = load(spark, sf, "events")
    errors = sorted((r.asDict() for r in
                     (events.filter(F.col("event_type") == "error")
                      .select(F.col("event_id").alias("error_id"), "user_id",
                              F.unix_micros("ts").alias("error_ts"))
                      ).collect()), key=lambda e: e["error_ts"])
    signups = sorted((r.asDict() for r in
                      (events.filter(F.col("event_type") == "signup")
                       .select(F.col("event_id").alias("signup_id"),
                               F.col("user_id").alias("s_user_id"),
                               F.unix_micros("ts").alias("signup_ts"))
                       ).collect()), key=lambda e: e["signup_ts"])
    # cut INSIDE a known pair's interval so at least one pair straddles
    # the restart (an arbitrary cut finds none at this sparse SF: pairs
    # within the 1 h tolerance of any given instant are rare)
    batch_pairs = [
        (r["error_id"], r["signup_id"]) for r in
        all_queries()["range_join_events"].builder(spark, sf).collect()]
    e_ts_all = {e["error_id"]: e["error_ts"] for e in errors}
    s_ts_all = {s["signup_id"]: s["signup_ts"] for s in signups}
    widest = max(batch_pairs,
                 key=lambda p: abs(e_ts_all[p[0]] - s_ts_all[p[1]]))
    assert e_ts_all[widest[0]] != s_ts_all[widest[1]], \
        "no pair with distinct timestamps to cut between"
    cut_time = (min(e_ts_all[widest[0]], s_ts_all[widest[1]])
                + abs(e_ts_all[widest[0]] - s_ts_all[widest[1]]) // 2 + 1)
    e_halves = ([e for e in errors if e["error_ts"] < cut_time],
                [e for e in errors if e["error_ts"] >= cut_time])
    s_halves = ([s for s in signups if s["signup_ts"] < cut_time],
                [s for s in signups if s["signup_ts"] >= cut_time])
    out_dir = str(tmp_path / "pairs_out")

    def run_once(i):
        _write_chunks(tmp_path / "errs", [e_halves[i]], "error_ts")
        _write_chunks(tmp_path / "sups", [s_halves[i]], "signup_ts")
        # distinct file names per run: _write_chunks numbers from 0
        import os
        for d, tag in (("errs", "e"), ("sups", "s")):
            src = tmp_path / d / "b000.json"
            src.rename(tmp_path / d / f"run{i}_{tag}.json")
        err_src = (spark.readStream
                   .schema("error_id long, user_id long, error_ts timestamp")
                   .json(str(tmp_path / "errs")))
        sup_src = (spark.readStream
                   .schema("signup_id long, s_user_id long, "
                           "signup_ts timestamp")
                   .json(str(tmp_path / "sups")))
        q = (error_signup_stream(err_src, sup_src)
             .writeStream.outputMode("append").format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", str(tmp_path / "ckpt_rs"))
             .trigger(availableNow=True).start())
        assert q.awaitTermination(600)

    run_once(0)
    run_once(1)  # restart from the same checkpoint

    got = [(r["error_id"], r["signup_id"]) for r in
           spark.read.parquet(out_dir).collect()]
    expect = {(r["error_id"], r["signup_id"]) for r in
              all_queries()["range_join_events"].builder(spark, sf).collect()}
    assert set(got) == expect
    assert len(got) == len(expect)  # exactly once: no re-emission
    straddle = {(e, s) for e, s in expect
                if (e_ts_all[e] < cut_time) != (s_ts_all[s] < cut_time)}
    assert straddle, "test vacuous: no pair straddles the cut either way"
    assert straddle <= set(got)
