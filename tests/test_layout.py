"""Z-order (Morton) layout: multi-dimensional file skipping, verified
against real parquet footer statistics — not the writer's intent but
what an engine's pruning actually consults."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from airline_data_warehouse_spark.plans.registry import load
from airline_data_warehouse_spark.sources.layout import (
    bucket_rank,
    equi_depth_boundaries,
    file_column_ranges,
    files_scanned,
    morton_key,
    write_linear,
    write_zorder,
)

SF = "/root/testdata/sf0.01"
N_FILES = 16


def _micros(dt):
    return int(dt.timestamp() * 1_000_000)


def _span(entry, col, lo, hi, to_num=float):
    fmin, fmax = entry[col]
    return (to_num(fmax) - to_num(fmin)) / (hi - lo)


def test_zorder_tiles_both_dimensions(spark, tmp_path):
    """Each z-ordered file covers a compact tile in BOTH user_id and ts
    (mean normalized span well under the full range), while the
    ts-range baseline leaves user_id unclustered (span ~1 per file)."""
    events = load(spark, SF, "events").select("event_id", "ts", "user_id",
                                              "value")
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zorder(events, zpath, ["user_id", "ts"], n_files=N_FILES, bits=6)
    write_linear(events, lpath, "ts", n_files=N_FILES)

    u_lo, u_hi, t_lo, t_hi = (events.agg(
        F.min("user_id"), F.max("user_id"),
        F.unix_micros(F.min("ts")), F.unix_micros(F.max("ts"))).collect()[0])

    def spans(path):
        ranges = file_column_ranges(path, ["user_id", "ts"])
        # block-aligned partitioning can merge adjacent blocks into one
        # file when the range sampler coalesces two block ids
        assert N_FILES - 2 <= len(ranges) <= N_FILES
        u = [_span(e, "user_id", u_lo, u_hi) for e in ranges]
        t = [_span(e, "ts", t_lo, t_hi,
                   to_num=lambda v: _micros(v)) for e in ranges]
        return sum(u) / len(u), sum(t) / len(t)

    zu, zt = spans(zpath)
    lu, lt = spans(lpath)
    # 16 aligned blocks over a 64x64 rank grid -> quarter-range tiles
    # per dim (merged boundary files can reach a half-range)
    assert zu < 0.4 and zt < 0.4, (zu, zt)
    # the single-column layout clusters ts tightly and user_id not at all
    assert lt < 0.15 and lu > 0.9, (lu, lt)


def test_zorder_prunes_predicates_on_either_column(spark, tmp_path):
    """File-skipping simulation from the real footer stats: the z-order
    layout prunes a user_id-only predicate (the ts-sorted baseline
    scans every file) while still pruning ts predicates."""
    events = load(spark, SF, "events").select("event_id", "ts", "user_id")
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zorder(events, zpath, ["user_id", "ts"], n_files=N_FILES, bits=6)
    write_linear(events, lpath, "ts", n_files=N_FILES)
    zr = file_column_ranges(zpath, ["user_id", "ts"])
    lr = file_column_ranges(lpath, ["user_id", "ts"])
    n_z = len(zr)       # block-aligned partitioning may merge a block

    # ~1/8th of the user_id range, inside one curve quartile
    user_pred = {"user_id": (80, 105)}
    z_user, l_user = files_scanned(zr, user_pred), files_scanned(lr, user_pred)
    assert l_user == N_FILES          # single-column sort cannot skip
    assert z_user <= n_z // 2, z_user

    # a 4-day window, no user predicate: both layouts skip, linear best
    utc = datetime.timezone.utc       # pyarrow stats are tz-aware UTC
    ts_pred = {"ts": (datetime.datetime(2024, 1, 10, tzinfo=utc),
                      datetime.datetime(2024, 1, 14, tzinfo=utc))}
    z_ts, l_ts = files_scanned(zr, ts_pred), files_scanned(lr, ts_pred)
    assert l_ts <= 4
    assert z_ts <= n_z // 2, z_ts

    # the 2-D box prunes at least as well as its weakest 1-D side
    both = {**user_pred, **ts_pred}
    assert files_scanned(zr, both) <= min(z_user, z_ts)


def test_zorder_write_is_lossless_and_key_free(spark, tmp_path):
    """Round trip: same rows, same schema, no _zkey helper column."""
    events = load(spark, SF, "events")
    zpath = str(tmp_path / "z")
    write_zorder(events, zpath, ["user_id", "ts"], n_files=N_FILES)
    back = spark.read.parquet(zpath)
    assert set(back.columns) == set(events.columns)
    assert back.count() == events.count()
    assert back.select(F.sum(F.hash(*sorted(back.columns)))).collect()[0][0] \
        == events.select(F.sum(F.hash(*sorted(events.columns)))).collect()[0][0]


def test_bucket_rank_equi_depth_and_null_low(spark):
    """Ranks are equi-depth within the sketch tolerance and NULL lands
    in bucket 0 (clustered, not scattered)."""
    df = spark.range(0, 4096).select(
        F.when(F.col("id") % 512 == 0, None)
         .otherwise(F.col("id")).alias("v").cast("double"))
    bounds = equi_depth_boundaries(df, "v", 16)
    ranked = df.select(F.col("v"), bucket_rank(df, "v", bounds).alias("r"))
    counts = {r["r"]: r["n"] for r in
              ranked.groupBy("r").agg(F.count("*").alias("n")).collect()}
    assert ranked.filter(F.col("v").isNull())\
                 .filter(F.col("r") != 0).count() == 0
    assert set(counts) == set(range(16))
    sizes = [counts[i] for i in range(1, 16)]    # bucket 0 also holds nulls
    assert max(sizes) <= 2 * min(sizes), counts


def test_qdigest_boundaries_deterministic_and_near_exact(spark):
    """qdigest_boundaries (the certified counterpart of approxQuantile
    boundaries): repeat calls are BIT-IDENTICAL (the reproducibility
    approxQuantile's GK summary can't give), each boundary is within
    the q-digest rank bound of the exact equi-depth rank, and
    boundaries are non-decreasing."""
    import random

    from airline_data_warehouse_spark.sources.layout import (
        qdigest_boundaries,
    )

    rng = random.Random(53)
    vals = [rng.randrange(0, 1 << 20) for _ in range(6000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    b1 = qdigest_boundaries(df, "v", 8)
    b2 = qdigest_boundaries(df, "v", 8)
    assert b1 == b2 and len(b1) == 7
    assert b1 == sorted(b1)
    svals = sorted(vals)
    n, thr = len(vals), max(1, len(vals) // 256)
    from airline_data_warehouse_spark.operators.sketches import QD_LEVELS
    for i, b in enumerate(b1, start=1):
        rnk = (n * i + 7) // 8
        assert svals[rnk - 1] <= b \
            <= svals[min(rnk - 1 + QD_LEVELS * thr, n - 1)]


def test_morton_key_interleaves_bits(spark):
    """Spot-check the Z-curve: key(a, b) interleaves a's bits at even
    and b's at odd positions."""
    df = spark.createDataFrame([(a, b) for a in range(8) for b in range(8)],
                               "a int, b int")
    z = df.select("a", "b",
                  morton_key([F.col("a"), F.col("b")], 3).alias("z")).collect()

    def expect(a, b):
        out = 0
        for i in range(3):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    for r in z:
        assert r["z"] == expect(r["a"], r["b"]), (r["a"], r["b"], r["z"])


def test_qdigest_boundaries_general_integer_domain(spark):
    """qdigest_boundaries is un-gated for arbitrary integer domains
    (auto offset + levels): date_key-magnitude values (> 2^20, which
    the fixed universe used to reject) produce reproducible, ordered,
    in-domain boundaries within the auto-planned rank-error bound."""
    from airline_data_warehouse_spark.sources.layout import (
        qdigest_boundaries,
    )

    n = 4000
    # deterministic, non-uniform, >2^20 domain (yyyyMMdd-ish)
    df = spark.createDataFrame(
        [(19_920_101 + (i * i) % 60_000,) for i in range(n)], "v long")
    b1 = qdigest_boundaries(df, "v", 8)
    b2 = qdigest_boundaries(df, "v", 8)
    assert b1 == b2, "pure function of the multiset"
    assert b1 == sorted(b1) and len(b1) == 7
    assert all(19_920_101 <= v < 19_920_101 + 60_000 for v in b1)
    # rank-error bound: each boundary's TRUE rank is within
    # levels*thr of its target (levels=4 for this span, thr=n//256)
    sv = sorted(r["v"] for r in df.collect())
    thr = max(1, n // 256)
    for i, bv in enumerate(b1, start=1):
        target = (n * i + 7) // 8
        true_rank = sum(1 for x in sv if x <= bv)
        assert target <= true_rank <= target + 4 * thr


def test_write_zorder_deterministic_layout(spark, tmp_path):
    """write_zorder(deterministic=True): integer-column boundaries come
    from the q-digest, so two runs over the same data produce the SAME
    per-file min/max layout — the reproducible-layout contract
    approxQuantile (merge-order-dependent) cannot make. The layout
    still prunes: each output file covers a compact tile."""
    import os

    from airline_data_warehouse_spark.sources.layout import write_zorder

    df = spark.createDataFrame(
        [(i, (i * 7919) % 1000, (i * 104729) % 1000)
         for i in range(4000)],
        "id long, x long, y long")

    def footprint(path):
        out = []
        for name in sorted(os.listdir(path)):
            if not name.endswith(".parquet"):
                continue
            part = spark.read.parquet(os.path.join(path, name))
            row = part.agg({"x": "min"}).collect()[0][0], \
                part.agg({"x": "max"}).collect()[0][0]
            out.append(row)
        return out

    p1, p2 = str(tmp_path / "z1"), str(tmp_path / "z2")
    write_zorder(df, p1, ["x", "y"], n_files=8, bits=4,
                 deterministic=True)
    write_zorder(df, p2, ["x", "y"], n_files=8, bits=4,
                 deterministic=True)
    f1, f2 = footprint(p1), footprint(p2)
    assert f1 == f2, "deterministic layout must reproduce run-to-run"
    assert spark.read.parquet(p1).count() == 4000
    # pruning still works: a narrow x predicate skips most files
    spans = [(lo, hi) for lo, hi in f1]
    hit = sum(1 for lo, hi in spans if lo <= 100 and hi >= 50)
    assert hit < len(spans), "min/max stats must exclude some files"


def test_write_zorder_deterministic_date_and_timestamp(spark, tmp_path):
    """deterministic=True routes DATE (epoch days) and TIMESTAMP
    (epoch micros) columns through the q-digest boundary path — they
    used to fall silently back to merge-order-dependent approxQuantile
    (ADVICE r14-low). Two runs over the same data reproduce the same
    per-file min/max layout, with no fallback warning."""
    import os
    import warnings

    from airline_data_warehouse_spark.sources.layout import write_zorder

    df = spark.createDataFrame(
        [(i, (i * 7919) % 1000) for i in range(4000)],
        "id long, x long").selectExpr(
            "x",
            "date_add(date'2024-01-01', cast((id * 104729) % 700 as int))"
            " as d",
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,"
            "(id * 7907) % 86400) as ts")
    assert dict(df.dtypes)["d"] == "date"
    assert dict(df.dtypes)["ts"] == "timestamp"

    def footprint(path, col):
        out = []
        for name in sorted(os.listdir(path)):
            if not name.endswith(".parquet"):
                continue
            part = spark.read.parquet(os.path.join(path, name))
            out.append((part.agg({col: "min"}).collect()[0][0],
                        part.agg({col: "max"}).collect()[0][0]))
        return out

    p1, p2 = str(tmp_path / "z1"), str(tmp_path / "z2")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        write_zorder(df, p1, ["d", "ts"], n_files=8, bits=4,
                     deterministic=True)
        write_zorder(df, p2, ["d", "ts"], n_files=8, bits=4,
                     deterministic=True)
    assert not [w for w in rec if "approxQuantile" in str(w.message)], \
        "date/timestamp must ride the deterministic path, not fall back"
    assert footprint(p1, "d") == footprint(p2, "d")
    assert footprint(p1, "ts") == footprint(p2, "ts")
    assert spark.read.parquet(p1).count() == 4000
    # the layout still prunes on the date axis
    spans = footprint(p1, "d")
    import datetime as _dt
    probe_lo, probe_hi = (_dt.date(2024, 3, 1), _dt.date(2024, 3, 15))
    hit = sum(1 for lo, hi in spans if lo <= probe_hi and hi >= probe_lo)
    assert hit < len(spans), "min/max stats must exclude some files"


def test_write_zorder_deterministic_double_column_warns(spark, tmp_path):
    """deterministic=True over a column with no integer encoding
    (double) falls back to approxQuantile — but LOUDLY, naming the
    column, instead of the silent partial determinism ADVICE r14
    flagged."""
    import warnings

    from airline_data_warehouse_spark.sources.layout import write_zorder

    df = spark.createDataFrame(
        [(i, float((i * 7919) % 1000) / 7.0) for i in range(1000)],
        "x long, f double")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        write_zorder(df, str(tmp_path / "z"), ["x", "f"], n_files=4,
                     bits=3, deterministic=True)
    msgs = [str(w.message) for w in rec if "approxQuantile" in str(w.message)]
    assert len(msgs) == 1 and "'f'" in msgs[0], msgs
    assert spark.read.parquet(str(tmp_path / "z")).count() == 1000
