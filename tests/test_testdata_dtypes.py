"""Tripwire: driver testdata regenerations have silently changed parquet
physical types across rounds (TIMESTAMP(NANOS) → TIMESTAMP(MICROS,UTC) →
TIMESTAMP(MICROS, naive/NTZ)), which broke analysis of unix_micros() call
sites mid-bench in round 4. This test pins what ``load()`` must deliver to
every consumer so the NEXT regeneration fails here with a one-line dtype
diff instead of killing bench.py at runtime.
"""
from __future__ import annotations

import pytest

from airline_data_warehouse_spark.plans.registry import load

# Contract after load(): every time-like column is a tz-aware TIMESTAMP
# (never TIMESTAMP_NTZ, never raw nanos longs), keys are bigint, money is
# double. Only columns whose type we depend on are pinned — extra columns
# or widened varchars don't trip this.
EXPECTED: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_regionkey": "int"},
    "customer": {"c_custkey": "bigint", "c_acctbal": "double"},
    "supplier": {"s_suppkey": "bigint", "s_acctbal": "double"},
    "part": {"p_partkey": "bigint", "p_retailprice": "double"},
    "orders": {"o_orderkey": "bigint", "o_custkey": "bigint",
               "o_totalprice": "double", "o_orderdate": "timestamp"},
    "lineitem": {"l_orderkey": "bigint", "l_partkey": "bigint",
                 "l_quantity": "double", "l_extendedprice": "double",
                 "l_discount": "double", "l_shipdate": "timestamp"},
    "events": {"event_id": "bigint", "ts": "timestamp",
               "user_id": "bigint", "value": "double", "props": "string"},
    "documents": {"doc_id": "bigint", "text": "string", "lang": "string",
                  "source": "string", "n_chars": "bigint"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>",
                   "label": "int"},
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_load_delivers_pinned_dtypes(spark, sf_dir, table):
    got = dict(load(spark, sf_dir, table).dtypes)
    diffs = [f"{col}: expected {want}, got {got.get(col)!r}"
             for col, want in EXPECTED[table].items()
             if got.get(col) != want]
    assert not diffs, f"{table}: " + "; ".join(diffs)


def test_no_ntz_or_raw_nanos_survives_load(spark, sf_dir):
    """No consumer should ever see TIMESTAMP_NTZ or bigint-nanos after
    load() — that is the round-4 regression class, pinned forever."""
    for table in EXPECTED:
        for col, dtype in load(spark, sf_dir, table).dtypes:
            assert dtype != "timestamp_ntz", f"{table}.{col} is NTZ"
