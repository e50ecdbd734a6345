"""Deterministic sampling for large-scale corpus curation.

`df.sample()` / `rand()` are partition-order-dependent: rerunning the
same job after a repartition, a spec change, or on a different cluster
yields a different sample, which poisons dataset reproducibility and
ablation comparisons. Every sampler here derives its decision from a
content hash (md5 → 31-bit, operators/hashing.py), so the same row
always makes the same decision — on any engine, at any parallelism,
at any scale. That also makes the samples DuckDB-oracle-checkable.

The hash is salted so independent samples of the same table don't
correlate (sampling 10% twice with different salts gives ~1% overlap,
not the same 10%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from airline_data_warehouse_spark.operators.hashing import MERSENNE_P, base_hash


def _keyed_hash(key_col: str, salt: str):
    return base_hash(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))


def hash_sample(df: DataFrame, fraction: float, key_col: str,
                salt: str = "adw-sample") -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose salted key hash
    falls below fraction·(2³¹−1). Pure narrow filter — no shuffle, fully
    pushdown-friendly, and the sampled set is stable under reruns and
    repartitioning (unlike df.sample, which seeds per partition index).
    """
    return df.filter(_keyed_hash(key_col, salt) < int(fraction * MERSENNE_P))


def stratified_quota(df: DataFrame, group_col: str, n_per_group: int,
                     key_col: str, salt: str = "adw-strata") -> DataFrame:
    """Exactly min(n, group size) rows per group, chosen deterministically:
    rank rows within each group by (salted hash, key) and keep the first
    n — the quota/domain-mixing sampler of a training-data pipeline
    ("cap every source at N documents", "balance languages").

    One shuffle keyed on the group column; skewed groups are bounded by
    the rank cutoff itself (only n rows survive per group, and AQE
    handles the pre-filter skew). The (hash, key) order is total, so the
    selection is unique regardless of input order.
    """
    h = _keyed_hash(key_col, salt)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (df.withColumn("_rk", F.row_number().over(w))
              .filter(F.col("_rk") <= n_per_group)
              .drop("_rk"))


def split_train_holdout(df: DataFrame, holdout_fraction: float, key_col: str,
                        salt: str = "adw-split") -> tuple[DataFrame, DataFrame]:
    """(train, holdout) disjoint split on the salted key hash — the same
    document can never leak across the boundary between reruns, which is
    the property eval-set contamination audits need. Both sides are
    filters over one scan; no shuffle."""
    cut = int(holdout_fraction * MERSENNE_P)
    h = _keyed_hash(key_col, salt)
    return df.filter(h >= cut), df.filter(h < cut)


def grouped_kfold(df: DataFrame, k: int, group_col: str,
                  salt: str = "adw-kfold") -> DataFrame:
    """Group-aware k-fold assignment: ``fold = hash(group) mod k``, so
    every row of a group lands in the SAME fold and entity leakage
    across folds is structurally impossible (the grouped k-fold of
    evaluation methodology, e.g. "no user appears in both train and
    validation"). One narrow column expression — no shuffle, stable
    under reruns/repartitioning, and folds are disjoint by construction
    rather than by bookkeeping."""
    return df.withColumn(
        "fold", F.pmod(_keyed_hash(group_col, salt), F.lit(k)).cast("int"))


def deterministic_shuffle(df: DataFrame, key_col: str, n_shards: int = 64,
                          salt: str = "adw-shuffle") -> DataFrame:
    """Global training-order shuffle without a global sort: every row gets
    a (shard, pos) address — shard = salted key hash mod n_shards, pos =
    its rank within the shard by (hash, key). Reading shards round-robin
    (or shard-per-data-loader) replays one fixed uniform-random
    permutation of the corpus: rerun-stable, repartition-stable, and
    resumable from any (shard, pos) checkpoint, none of which
    ``df.orderBy(rand())`` gives.

    The plan is ONE shuffle on the shard key plus a per-shard window
    rank — a global orderBy would serialize the corpus through a single
    range-partitioned sort, while this scales with n_shards (each shard
    sorts ~corpus/n_shards rows independently). The (hash, key) order is
    total, so pos is unique and deterministic.
    """
    h = _keyed_hash(key_col, salt)
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col(key_col).asc())
    return (df.withColumn("_h", h)
              .withColumn("shard", (F.col("_h") % n_shards).cast("int"))
              .withColumn("pos", (F.row_number().over(w) - 1).cast("int"))
              .drop("_h"))


def source_mixing_plan(df: DataFrame, source_col: str, token_col: str,
                       budget_docs: int) -> DataFrame:
    """Temperature-based source mixing (the DoReMi/multilingual-sampling
    family with T=2, i.e. weight ∝ sqrt(n)): per source, document/token
    tallies, a normalized mixing weight, and an integer document quota
    that sums exactly to ``budget_docs`` via largest-remainder rounding
    (deterministic tie-break on fractional part desc, source asc).

    sqrt is the one power function IEEE guarantees correctly rounded, so
    the weights are bit-identical on any engine; the normalizing sum and
    the remainder ranking run as exact DECIMAL arithmetic (a float sum is
    order-dependent and would break cross-engine determinism).

    Quotas are computed from the UNROUNDED weight: rounding to 6dp first
    (as displayed in ``mix_weight``) would let sum(floor(quota)) drift
    from the budget by up to ~budget·n·5e-7 — visible from ~2e5-doc
    budgets. With exact-double quotas the drift is a few ulps, and the
    remainder distribution below is the generalized largest-remainder
    form (base share ``floor(leftover/n)`` to every source, +1 to the
    ``leftover mod n`` largest fractions) which sums exactly to the
    budget for ANY leftover sign or magnitude, not just 0 ≤ leftover < n.

    Scale shape: one aggregation keyed on source collapses the corpus to
    |sources| rows; every window after that runs over that tiny frame,
    not corpus rows, so the un-partitioned windows are safe by
    construction.
    """
    per_src = (df.groupBy(source_col)
                 .agg(F.count("*").alias("n_docs"),
                      F.sum(F.col(token_col)).alias("n_tokens")))
    w = F.round(F.sqrt(F.col("n_docs").cast("double")), 6).cast("decimal(18,6)")
    scored = per_src.withColumn("_w", w)
    tot = Window.partitionBy()
    # divide as doubles (correctly rounded) over exact decimal operands —
    # decimal/decimal division scale rules differ across engines
    weight = F.col("_w").cast("double") / F.sum("_w").over(tot).cast("double")
    quota_real = weight * budget_docs
    with_quota = (scored
                  .withColumn("mix_weight", F.round(weight, 6))
                  .withColumn("_floor", F.floor(quota_real).cast("long"))
                  .withColumn("_frac", quota_real - F.floor(quota_real)))
    rank_w = Window.partitionBy().orderBy(F.col("_frac").desc(),
                                          F.col(source_col).asc())
    leftover = budget_docs - F.sum("_floor").over(tot)
    n_src = F.count("*").over(tot)
    base = F.floor(leftover.cast("double") / n_src).cast("long")
    residue = leftover - base * n_src
    return (with_quota
            .withColumn("_rk", F.row_number().over(rank_w))
            .select(F.col(source_col).alias("source"),
                    F.col("n_docs").cast("int").alias("n_docs"),
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.col("mix_weight"),
                    (F.col("_floor") + base
                     + F.when(F.col("_rk") <= residue, 1).otherwise(0))
                    .cast("int").alias("quota_docs")))


def token_budget_sample(df: DataFrame, source_col: str, token_col: str,
                        key_col: str, budget_tokens: int,
                        salt: str = "adw-budget") -> DataFrame:
    """Per-source token-budget selection: walk each source's documents in
    deterministic (salted hash, key) order and keep rows while the
    running token total stays within ``budget_tokens`` — the "cap every
    source at N tokens" step of corpus mixing, where quotas are token
    counts, not document counts (stratified_quota's unit).

    One shuffle keyed on source + a per-source window cumsum; the keep
    rule is cumulative-including-current <= budget, so the selection is a
    prefix of the per-source order and rerun/repartition-stable.
    """
    h = _keyed_hash(key_col, salt)
    w = (Window.partitionBy(source_col)
               .orderBy(F.col("_h").asc(), F.col(key_col).asc())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.withColumn("_h", h)
              .withColumn("cum_tokens",
                          F.sum(F.col(token_col)).over(w).cast("long"))
              .filter(F.col("cum_tokens") <= budget_tokens)
              .drop("_h"))


def sequence_packing_plan(df: DataFrame, token_col: str, key_col: str,
                          context_len: int = 4096, n_shards: int = 64,
                          salt: str = "adw-pack") -> DataFrame:
    """Assign each document a (shard, bin, offset) slot for fixed-window
    sequence packing — the concat-then-chunk layout LLM training jobs
    use to fill context windows without padding waste.

    Documents are sharded by salted key hash (n_shards independent
    streams), then laid out head-to-tail in deterministic (hash, key)
    order within their shard; bin = which context window the document
    starts in, offset = its first token's position in that window.

    The running total is a window cumsum PARTITIONED BY SHARD — never a
    global orderBy-without-partitionBy, which would serialize the whole
    corpus through one task. Shards are packed independently (standard
    practice: each trainer data-loader consumes its own shard), so the
    plan is one shuffle on the shard key and scales with n_shards.
    Documents longer than the context simply span bins, as concat-then-
    chunk dictates.
    """
    h = _keyed_hash(key_col, salt)
    shard = (h % n_shards).alias("shard")
    w = (Window.partitionBy("shard")
               .orderBy(F.col("_h").asc(), F.col(key_col).asc())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.sum(F.col(token_col)).over(w) - F.col(token_col))
    return (df.select(F.col(key_col), F.col(token_col), h.alias("_h"), shard)
              .withColumn("_start", start)
              .select(F.col(key_col), F.col("shard").cast("int").alias("shard"),
                      (F.col("_start") / context_len).cast("int").alias("bin"),
                      (F.col("_start") % context_len).cast("int").alias("offset")))


def curriculum_order(scored: DataFrame, score_col: str = "quality_prob",
                     id_col: str = "doc_id", n_buckets: int = 10) -> DataFrame:
    """Quality-curriculum training order: a single global position per
    document, high-quality buckets first, hash-shuffled within a bucket
    (so each difficulty stage is still i.i.d. for the data loader) —
    WITHOUT a global sort.

    Two-phase position assignment (the vocab_table / exact-median
    pattern): documents land in ``n_buckets`` score deciles; bucket
    offsets come from an exclusive prefix-sum over the ≤n_buckets-row
    per-bucket count frame (the only unpartitioned window — bounded by
    construction, allowlisted with that bound); the within-bucket rank
    is a row_number PARTITIONED by bucket ordered by (md5(id), id). No
    task ever sorts more than one bucket, and position = offset + rank
    reproduces exactly the order ORDER BY (bucket DESC, hash, id) would
    give — asserted against the single-window oracle.

    Returns (id, bucket, position) with position 0-based and contiguous.
    """
    from pyspark.sql import Window
    bucket = (F.least(F.lit(n_buckets - 1),
                      F.floor(F.col(score_col) * n_buckets))
              .cast("int").alias("bucket"))
    b = scored.select(F.col(id_col), bucket,
                      F.md5(F.col(id_col).cast("string")).alias("_h"))
    woff = (Window.orderBy(F.col("bucket").desc())
                  .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (b.groupBy("bucket").agg(F.count(F.lit(1)).alias("_bcnt"))
                .withColumn("_off", F.coalesce(F.sum("_bcnt").over(woff),
                                               F.lit(0)))
                .drop("_bcnt"))
    wr = Window.partitionBy("bucket").orderBy(F.col("_h").asc(),
                                              F.col(id_col).asc())
    return (b.join(F.broadcast(offsets), "bucket")
             .select(F.col(id_col), F.col("bucket"),
                     (F.col("_off") + F.row_number().over(wr) - 1)
                      .cast("long").alias("position")))


def per_source_cap(df: DataFrame, cap: int, source_col: str = "source",
                   id_col: str = "doc_id", salt: str = "cap-v1") -> DataFrame:
    """Hard per-source ceiling — the C4-style "at most N documents per
    host" downsampling that stops a single dominant source from
    swamping the mixture (the quota-driven companion is
    source_mixing_plan; a cap is a ceiling, not a target).

    Deterministic at any parallelism: survivors are the ``cap``
    lowest-(md5(salt‖id), id) documents of each source, so reruns and
    backfills select identical sets. One source-partitioned rank — no
    global sort; a source with ≤cap docs passes through whole.
    """
    from pyspark.sql import Window
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(id_col).asc())
    return (df.withColumn("_rk", F.row_number().over(w))
              .filter(F.col("_rk") <= cap)
              .drop("_rk"))


def weighted_sample_topk(df: DataFrame, n: int, weight_col: str,
                         key_col: str = "doc_id",
                         salt: str = "adw-wsample") -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    each row draws u ∈ (0,1] from its salted key hash and ranks by
    ln(u)/weight descending; the global top-n is a weight-proportional
    sample — the importance-weighted data-selection step (sample by
    quality score, length, dedup-cluster mass…) that plain Bernoulli
    hashing can't express.

    Deterministic end to end: u is exact rational arithmetic on the
    md5-mod-p hash, the only transcendental is one ln rounded to 6 dp
    (the model_quality_score contract), and the top-n is a TakeOrdered
    with the id tie-break — no global sort, stable under reruns and
    repartitioning. Rows with non-positive weight are excluded (they
    have zero selection probability in A-ES).
    """
    h = _keyed_hash(key_col, salt)
    u = (h + 1).cast("double") / float(MERSENNE_P + 1)
    w = F.col(weight_col).cast("double")
    score = F.round(F.log(u) / w, 6)
    return (df.filter(w > 0)
              .withColumn("es_score", score)
              .orderBy(F.col("es_score").desc(), F.col(key_col).asc())
              .limit(n))


def cluster_safe_split(df: DataFrame, clusters: DataFrame,
                       holdout_fraction: float, id_col: str = "doc_id",
                       salt: str = "adw-cluster-split"
                       ) -> tuple[DataFrame, DataFrame]:
    """(train, holdout) split that can never put two NEAR-DUPLICATES on
    opposite sides: the unit of assignment is the near-dup CLUSTER
    (``clusters``: (id, cluster_id), e.g. connected components over the
    verified Jaccard pair graph — dedup.connected_components), and a
    whole cluster goes to one side by its salted cluster-id hash. This
    is split_train_holdout's contamination guarantee STRENGTHENED from
    exact-duplicate leakage to near-duplicate leakage — a paraphrase of
    a holdout document in the training side is exactly the eval
    contamination a doc-id hash split cannot prevent (the Lee et al.
    2022 dedup-before-split finding).

    A document absent from ``clusters`` is treated as its own SINGLETON
    cluster (cluster_id = its own id via a LEFT join + coalesce) rather
    than silently dropped from both sides — a caller passing a clusters
    frame covering only graph ENDPOINTS (connected_components over the
    pair list without the full vertex set) must not lose every isolated
    document from the split (ADVICE r10-low). This matches
    connected_components' own convention, where an isolated vertex's
    component id IS its id.

    Shape: one id-keyed join to attach cluster ids (AQE-planned; the
    cluster table is corpus-cardinality, never broadcast-hinted), then
    two narrow filters on the hash — deterministic under reruns and
    repartitioning, folds disjoint by construction."""
    cut = int(holdout_fraction * MERSENNE_P)
    labeled = (df.join(clusters, id_col, "left")
               .withColumn("cluster_id",
                           F.coalesce("cluster_id", F.col(id_col))))
    h = _keyed_hash("cluster_id", salt)
    return labeled.filter(h >= cut), labeled.filter(h < cut)
