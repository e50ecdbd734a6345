"""JVM-literal construction of small constant DataFrames.

``spark.createDataFrame(rows, schema)`` under
``spark.sql.execution.arrow.pyspark.enabled=true`` (this engine's
session default, needed by the Arrow operators) does NOT build a JVM
LocalRelation: it keeps the rows as Arrow batches on the Python side
and plans a Python-RDD-backed scan, so the frame's FIRST action routes
through a Python runner — measured 3–8 s of per-fresh-frame overhead
on the bench box for a ONE-ROW plan sidecar (r15, guide §4: every
JVM↔Python crossing costs; this one bought nothing). Every operator
that manufactures a tiny constant frame inside a timed query path —
plan sidecars, scalar broadcast frames, driver-selected result rows —
paid it once per run.

``jvm_local_frame`` builds the same rows as a pure JVM plan instead:
``spark.range(1).select(inline(array(struct(lit...))))`` — scalar
literals cast to the exact schema types, zero Python at execution.
Semantics match ``createDataFrame`` for plain scalar values (int /
float / str / bool / Decimal / date / datetime / None), which is all
any call site passes; callers with non-scalar cells or big row lists
should stay on ``createDataFrame`` (and eat the boundary knowingly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# beyond this the literal expression tree costs more to analyze than
# the Python boundary costs to cross — callers this large are not the
# "tiny constant frame" case this module exists for
_MAX_LITERAL_ROWS = 512


def jvm_local_frame(spark: SparkSession, rows: list[tuple],
                    schema: str | StructType) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for small scalar-valued
    row lists, as a pure JVM literal plan (no Python-runner execution —
    see module docstring). Falls back to ``createDataFrame`` for empty
    input (nothing to execute there) and raises on oversized lists so
    a growing call site fails loudly instead of quietly planting a
    megabyte expression tree."""
    st = (schema if isinstance(schema, StructType)
          else StructType.fromDDL(schema))
    if not rows:
        return spark.createDataFrame([], st)
    if len(rows) > _MAX_LITERAL_ROWS:
        raise ValueError(
            f"jvm_local_frame: {len(rows)} rows > {_MAX_LITERAL_ROWS} — "
            "this helper is for tiny constant frames; use "
            "spark.createDataFrame for bulk data")
    structs = [
        F.struct(*[
            (F.lit(None) if v is None else F.lit(v))
            .cast(f.dataType).alias(f.name)
            for v, f in zip(r, st.fields)])
        for r in rows
    ]
    return spark.range(1).select(F.inline(F.array(*structs)))
