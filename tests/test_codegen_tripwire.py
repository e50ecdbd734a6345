"""Codegen-fallback tripwire (VERDICT r02 #3).

Spark's whole-stage codegen catches Janino compile errors ("Code grows
beyond 64 KB") and silently falls back to interpreted execution — every
green signal (oracle, pytest, bench) stays green while the plan runs an
order of magnitude slower. r02 shipped exactly that bug in
`string_similarity_join`.

This test makes the fallback loud: with ``spark.sql.codegen.fallback=false``
a compile failure raises instead of degrading, so any headline query whose
generated code stops compiling fails CI here rather than rotting quietly.
"""

from __future__ import annotations

import pytest

from airline_data_warehouse_spark.operators.dedup import release_caches
from airline_data_warehouse_spark.plans.registry import all_queries

import bench


@pytest.fixture(scope="module")
def strict_codegen(spark):
    prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    yield spark
    spark.conf.set("spark.sql.codegen.fallback", prev)


@pytest.mark.parametrize("name", bench.HEADLINE)
def test_headline_query_compiles(strict_codegen, sf_dir, name):
    registry = all_queries()
    df = registry[name].builder(strict_codegen, sf_dir)
    try:
        df.write.format("noop").mode("overwrite").save()
    finally:
        release_caches()
