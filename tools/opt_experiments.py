"""r15 optimization experiments: candidate rewrites measured side by side
with the registered implementations before any repo code changes.
Each experiment: build old + new plans at sf0.1, assert IDENTICAL
results (collect + multiset compare), then time both (median of N noop
sinks, the bench protocol). Usage:

    python tools/opt_experiments.py triangles
    python tools/opt_experiments.py covariance
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))


def _spark():
    from airline_data_warehouse_spark.session import get_spark
    s = get_spark(app_name="opt-experiments")
    s.sparkContext.setLogLevel("ERROR")
    return s


def _time(df_builder, label: str, runs: int = RUNS) -> float:
    from airline_data_warehouse_spark.operators.dedup import release_caches
    samples = []
    for _ in range(runs):
        t0 = time.time()
        df_builder().write.format("noop").mode("overwrite").save()
        samples.append(time.time() - t0)
        release_caches()
    med = statistics.median(samples)
    print(f"{label}: median {med:.3f}s  samples={[round(s, 3) for s in samples]}")
    return med


def _same(a: DataFrame, b: DataFrame) -> None:
    ra = sorted(map(str, a.collect()))
    rb = sorted(map(str, b.collect()))
    assert ra == rb, (
        f"MISMATCH rows {len(ra)} vs {len(rb)}; "
        f"first diff: {next(((x, y) for x, y in zip(ra, rb) if x != y), None)}")
    print(f"identical: {len(ra)} rows")


# --------------------------------------------------------------------------
# triangles: oriented-adjacency intersection instead of wedge-row shuffle
# --------------------------------------------------------------------------

def triangle_counts_v2(edges: DataFrame, id_col: str = "node_id") -> DataFrame:
    """Same contract as operators.graph.triangle_counts, same
    Suri-Vassilvitskii orientation, but the wedge enumeration + closing
    semi-join is replaced by an in-row sorted-adjacency intersection:
    for every ORIENTED edge (u, v), the common oriented out-neighbors
    N+(u) ∩ N+(v) are exactly the triangle apices w with u→v, u→w, v→w,
    so each triangle is found once (on its apex→middle edge) and only
    true triangles are ever materialized (the wedge join materializes
    every wedge — E^1.5 rows — and shuffles them into a semi-join; here
    the E^1.5 work stays inside one codegen stage as array intersects
    of O(sqrt E)-bounded lists, and only matches explode)."""
    from airline_data_warehouse_spark.operators.dedup import _persist

    und = (edges.select(F.least("src", "dst").cast("long").alias("a"),
                        F.greatest("src", "dst").cast("long").alias("b"))
           .filter(F.col("a") != F.col("b"))
           .distinct())
    und = _persist(und)
    deg = (und.select(F.col("a").alias(id_col))
           .unionByName(und.select(F.col("b").alias(id_col)))
           .groupBy(id_col).agg(F.count(F.lit(1)).alias("degree")))
    deg = _persist(deg)
    da = deg.select(F.col(id_col).alias("a"), F.col("degree").alias("_da"))
    db = deg.select(F.col(id_col).alias("b"), F.col("degree").alias("_db"))
    lower_first = ((F.col("_da") < F.col("_db"))
                   | ((F.col("_da") == F.col("_db"))
                      & (F.col("a") < F.col("b"))))
    oriented = (und.join(da, "a").join(db, "b")
                .select(F.when(lower_first, F.col("a"))
                         .otherwise(F.col("b")).alias("u"),
                        F.when(lower_first, F.col("b"))
                         .otherwise(F.col("a")).alias("v")))
    oriented = _persist(oriented)
    adj = (oriented.groupBy(F.col("u"))
           .agg(F.collect_list("v").alias("nbrs")))
    e_u = adj.select(F.col("u"), F.col("nbrs").alias("_nu"))
    e_v = adj.select(F.col("u").alias("v"), F.col("nbrs").alias("_nv"))
    tri_edges = (oriented.join(e_u, "u").join(e_v, "v")
                 .select("u", "v",
                         F.array_intersect("_nu", "_nv").alias("_ws"))
                 .filter(F.size("_ws") > 0))
    tri_edges = _persist(tri_edges)
    uv_counts = (tri_edges.select(F.explode(F.array("u", "v"))
                                  .alias(id_col),
                                  F.size("_ws").alias("_c"))
                 .groupBy(id_col).agg(F.sum("_c").alias("triangles")))
    w_counts = (tri_edges.select(F.explode("_ws").alias(id_col))
                .groupBy(id_col).agg(F.count(F.lit(1)).alias("triangles")))
    per_node = (uv_counts.unionByName(w_counts)
                .groupBy(id_col).agg(F.sum("triangles").alias("triangles")))
    two_t = (F.coalesce(F.col("triangles"), F.lit(0)).cast("decimal(38,0)")
             * F.lit(2 * 10 ** 12).cast("decimal(38,0)"))
    dd1 = (F.col("degree") * (F.col("degree") - 1)).cast("decimal(38,0)")
    num = F.lit(2).cast("decimal(38,0)") * two_t + dd1
    den = F.lit(2).cast("decimal(38,0)") * dd1
    cc_micro = F.when(F.col("degree") < 2, F.lit(0).cast("long")) \
        .otherwise(((num - num % den) / den).cast("long"))
    return (deg.join(per_node, id_col, "left")
            .select(id_col, "degree",
                    F.coalesce("triangles", F.lit(0)).cast("long")
                     .alias("triangles"),
                    cc_micro.alias("clustering_micro"),
                    (cc_micro / F.lit(1e12)).alias("clustering")))


def exp_triangles() -> None:
    from airline_data_warehouse_spark.operators.graph import triangle_counts
    from airline_data_warehouse_spark.plans.registry import load
    spark = _spark()

    def edges():
        li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
        a = li.select(F.col("l_orderkey").alias("k"),
                      F.col("l_suppkey").alias("src"))
        b = li.select(F.col("l_orderkey").alias("k"),
                      F.col("l_suppkey").alias("dst"))
        return (a.join(b, "k").filter(F.col("src") != F.col("dst"))
                .select("src", "dst"))

    from airline_data_warehouse_spark.operators.dedup import release_caches
    _same(triangle_counts(edges()), triangle_counts_v2(edges()))
    release_caches()
    _time(lambda: triangle_counts(edges()), "triangles OLD")
    _time(lambda: triangle_counts_v2(edges()), "triangles NEW")


# --------------------------------------------------------------------------
# covariance: Arrow integer-exact accumulation vs exploded decimal cells
# --------------------------------------------------------------------------

def _cov_cells_v2(centered: DataFrame, dims: int,
                  round_dp: int = 6) -> DataFrame:
    """Bit-identical replacement for similarity._cov_cells: the centered
    values are 6-dp-rounded doubles, so c_i*c_j cast to DECIMAL(38,12)
    is exactly the 12-dp integer product (the existing exactness
    argument); that product in 1e-12 integer units is rint(c_i*1e6) *
    rint(c_j*1e6), accumulated here as exact Python ints per task via
    numpy int64 partials (chunked well under int64 range), then summed
    to the global exact decimal in Spark. Same final rounding
    expression, same (i, j, cov) output."""
    import pyarrow as pa

    spark = centered.sparkSession
    n_pairs = dims * (dims + 1) // 2
    iu = [i for i in range(dims) for _ in range(i, dims)]
    ju = [j for i in range(dims) for j in range(i, dims)]

    out_schema = ("i int, j int, psum decimal(38,12), pcnt long")

    def partial(batches):
        import numpy as np
        acc = [0] * n_pairs
        cnt = 0
        iu_a = np.array(iu, dtype=np.int64)
        ju_a = np.array(ju, dtype=np.int64)
        for batch in batches:
            col = batch.column(0)
            arr = np.asarray(col.flatten(), dtype=np.float64).reshape(-1, dims)
            ci = np.rint(arr * 1e6).astype(np.int64)
            # chunk so per-chunk int64 accumulation cannot overflow:
            # |c| <= 2e6 units -> |product| <= 4e12; 1e6 rows/chunk
            # keeps |partial| <= 4e18 < 2^63
            for lo in range(0, ci.shape[0], 1_000_000):
                ch = ci[lo:lo + 1_000_000]
                m = ch.T @ ch                      # int64 exact
                tri = m[iu_a, ju_a]
                for p in range(n_pairs):
                    acc[p] += int(tri[p])
                cnt += ch.shape[0]
        yield pa.RecordBatch.from_arrays(
            [pa.array(iu, type=pa.int32()),
             pa.array(ju, type=pa.int32()),
             pa.array([__import__("decimal").Decimal(a).scaleb(-12)
                       for a in acc],
                      type=pa.decimal128(38, 12)),
             pa.array([cnt] * n_pairs, type=pa.int64())],
            names=["i", "j", "psum", "pcnt"])

    partials = centered.select(F.col("c")).mapInArrow(partial, out_schema)
    return (partials.groupBy("i", "j")
            .agg(F.sum("psum").alias("_s"), F.sum("pcnt").alias("_n"))
            .select("i", "j",
                    (F.round(F.col("_s").cast("double")
                             / (F.col("_n") - 1), round_dp) + 0.0)
                    .alias("cov")))


def exp_covariance() -> None:
    import airline_data_warehouse_spark.operators.similarity as sim
    from airline_data_warehouse_spark.plans.registry import load
    spark = _spark()

    def corpus():
        return load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")

    def old():
        return sim.embedding_covariance(corpus())

    def new():
        c = corpus().filter(sim._finite_ok(F.col("embedding")))
        v = F.col("embedding").cast("array<double>")
        per_dim = sim._per_dim_mu(c, "embedding")
        mu = (per_dim.agg(F.array_sort(F.collect_list(F.struct("dim", "mu")))
                          .alias("p"))
              .select(F.transform("p", lambda s: s["mu"]).alias("mu")))
        centered = (c.crossJoin(F.broadcast(mu))
                    .select(F.zip_with(v, F.col("mu"),
                                       lambda a, b: F.round(a - b, 6))
                            .alias("c")))
        return _cov_cells_v2(centered, 64)

    from airline_data_warehouse_spark.operators.dedup import release_caches
    _same(old(), new())
    release_caches()
    _time(old, "covariance OLD")
    _time(new, "covariance NEW")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "triangles"
    {"triangles": exp_triangles, "covariance": exp_covariance}[which]()
