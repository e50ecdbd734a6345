"""Portable hashing primitives shared by the dedup/similarity operators.

Algorithms are the published classics: MinHash resemblance sketching
(Broder, "On the resemblance and containment of documents", 1997) with
banded LSH (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch.3),
SimHash (Charikar, "Similarity estimation techniques from rounding
algorithms", 2002), and random-hyperplane LSH for cosine (same paper).

Everything here is engine-independent integer arithmetic: a shingle's
base hash is the first 15 hex chars of its md5 (60 bits, fits bigint)
reduced mod p = 2^31-1, and the MinHash family is the classic universal
(a*h + b) mod p. The same arithmetic is emitted as DuckDB SQL by
plans/llmops.py, so approximate operators are still bit-exactly
oracle-checkable.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647  # 2^31 - 1

# Fixed universal-hash parameters (a, b) — arbitrary but pinned; changing
# them changes every signature, so treat as part of the operator contract.
# 16 permutations in 4 bands of 4 rows: P(collide | s) = 1-(1-s^4)^4 —
# 98.6% recall at s=0.9 while 0.2-similar noise pairs collide at ~0.6%,
# which is what keeps candidate volume sub-quadratic on vocabulary-dense
# corpora at 100 TB.
MINHASH_PARAMS: tuple[tuple[int, int], ...] = (
    (1_000_003, 17), (1_299_709, 4_242), (15_485_863, 7), (32_452_843, 911),
    (49_979_687, 131_071), (67_867_967, 524_287), (86_028_121, 8_191),
    (104_395_301, 127), (122_949_823, 99_991), (141_650_939, 3),
    (160_481_183, 65_537), (179_424_673, 29), (198_491_317, 777_777),
    (217_645_177, 1_009), (236_887_691, 42), (256_203_161, 604_171),
)
N_HASHES = len(MINHASH_PARAMS)
LSH_BANDS = 4
BAND_ROWS = N_HASHES // LSH_BANDS  # 4

SIMHASH_BITS = 60  # md5-prefix width: 15 hex chars = 60 independent bits


def base_hash(s: Column) -> Column:
    """60-bit md5 prefix as bigint, reduced mod 2^31-1 (portable)."""
    return (F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % MERSENNE_P)


DEFAULT_SHINGLE_K = 9  # char 9-grams: distinctive even on small vocabularies


def char_shingles(text: Column, k: int = DEFAULT_SHINGLE_K) -> Column:
    """Character k-grams of a string, in order, possibly with repeats
    (empty array when len < k). Set semantics are applied downstream on
    the hashed form — deduplicating ints is far cheaper than strings."""
    n = F.length(text) - (k - 1)
    return F.when(n >= 1,
                  F.transform(F.sequence(F.lit(1), n), lambda i: text.substr(i, F.lit(k)))
                  ).otherwise(F.array().cast("array<string>"))


def hashed_shingle_set(text: Column, k: int = DEFAULT_SHINGLE_K) -> Column:
    """Distinct 31-bit shingle hashes — the ONE representation every
    downstream family shares (16 MinHash perms, 16 SimHash bits, Jaccard
    set intersection). md5 runs once per shingle; distinct runs on ints.
    31-bit collisions shift a Jaccard size by ±1 with P≈n²/2³² per doc —
    negligible, and the SQL oracle replays identical arithmetic anyway."""
    return F.array_distinct(F.transform(char_shingles(text, k), base_hash))


def minhash_signature(hashed: Column | str) -> list[Column]:
    """One min-hash per (a,b) param over a pre-hashed shingle array.

    Pass the COLUMN NAME for the fast construction path (each permutation
    generated as one parsed SQL expression instead of a Python-HOF lambda
    costing ~12 ms of py4j round trips). Both paths build the same
    expression tree: the base hash is BIGINT (base_hash casts to long),
    so the L-suffixed literals match the Column path's int-lit-promoted-
    to-long arithmetic exactly."""
    if isinstance(hashed, str):
        return [F.expr(f"array_min(transform(`{hashed}`, "
                       f"h -> ({a}L * h + {b}L) % {MERSENNE_P}L))")
                for a, b in MINHASH_PARAMS]
    sig = []
    for a, b in MINHASH_PARAMS:
        def perm(h, a=a, b=b):  # plain expression closure, not a Spark HOF lambda
            return (F.lit(a) * h + F.lit(b)) % MERSENNE_P
        sig.append(F.array_min(F.transform(hashed, lambda h: perm(h))))
    return sig


def rehash60(h: Column) -> Column:
    """Full-width 60-bit rehash of a 31-bit shingle hash (md5 of its
    decimal string form, same conv cascade as base_hash but without the
    mod-p reduction): SimHash needs one independent bit per signature
    position, and the 31-bit base hash can only feed 31 of them."""
    return F.conv(F.substring(F.md5(h.cast("string")), 1, 15), 16, 10).cast("long")




def hyperplane_weights(n_planes: int = 8, dims: int = 64,
                       seed: str = "adw-plane") -> list[list[float]]:
    """Deterministic ±1 (Rademacher) weights derived from md5 — computed
    driver-side once and inlined as literals, so the Spark plan and the
    SQL oracle share the exact same planes. ``seed`` namespaces
    independent plane families so two operators never silently share
    hyperplanes.

    CORRECT USE: Johnson–Lindenstrauss random PROJECTION (Achlioptas
    2001: ±1 entries preserve pairwise distances in expectation and stay
    exactly representable in both engines).

    DO NOT use for sign-quantized LSH banding: every ±1 plane restricted
    to a 2-D coordinate subspace has its decision boundary on a ±45°
    diagonal, so sign-LSH over low-rank / axis-aligned / sparse inputs
    collapses to at most 4 distinguishable cells per 2-D subspace and
    adding bands only adds identically-quantized planes — recall cannot
    recover (blind spot diagnosed in round 7; production-dense
    embeddings hide it, quantized or structured ones do not). Sign-LSH
    paths use :func:`gaussian_plane_weights` instead, whose continuous
    entries place boundaries at arbitrary angles in every subspace."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dims):
            digest = hashlib.md5(f"{seed}:{j}:{i}".encode()).digest()
            row.append(1.0 if digest[0] % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def gaussian_plane_weights(n_planes: int = 8, dims: int = 64,
                           seed: str = "adw-gplane") -> list[list[float]]:
    """Deterministic N(0,1) hyperplane weights for sign-quantized cosine
    LSH (Charikar 2002 SimHash planes: for Gaussian planes
    P[sign collision] = 1 - θ/π exactly, in EVERY 2-D subspace — the
    rotation-invariance that ±1 Rademacher planes lack; see the blind
    spot documented on :func:`hyperplane_weights`).

    Entries are Box–Muller transforms of two md5-derived uniforms,
    rounded to 6 dp so the decimal literal inlined into the Spark
    expression and the DuckDB oracle SQL is short, round-trips exactly,
    and both engines parse the identical double — keeping sign-LSH band
    keys bit-identical across engines (the repo-wide parity
    convention)."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dims):
            d1 = hashlib.md5(f"{seed}:{j}:{i}:u1".encode()).digest()
            d2 = hashlib.md5(f"{seed}:{j}:{i}:u2".encode()).digest()
            u1 = (int.from_bytes(d1[:8], "big") + 0.5) / 2.0 ** 64
            u2 = int.from_bytes(d2[:8], "big") / 2.0 ** 64
            z = math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.pi * u2)
            row.append(round(z, 6))
        planes.append(row)
    return planes
