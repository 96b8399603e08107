"""Similarity search over an embedding column (array<float>).

Two paths, per the usual scale ladder:

* `cosine_topk` — brute-force exact top-k: broadcast the (small) query set
  against the corpus, cosine via zip_with/aggregate (pure JVM), top-k via a
  per-query window. Exact baseline; O(|Q|·|corpus|) — fine for |Q| in the
  thousands, the oracle for the approximate path.

* `lsh_cosine_topk` — random-hyperplane LSH (Charikar sign-random-projection):
  P deterministic hyperplanes (seeded numpy, inlined as plan literals) give a
  P-bit signature; signatures are banded and candidates come from band
  equi-joins, then exact cosine re-ranks within candidates. Recall is
  tunable via bands/planes; candidates shuffle only (id, signature), the
  corpus is never cross-joined.

The same machinery gives embedding-cosine near-duplicate pairs
(`cosine_near_dup_pairs`): bucket-join candidates, exact-cosine verify.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, cos, rank).

    Self-matches (same id) are excluded. Ties broken by neighbor id for
    determinism."""
    # compute in double precision (float32 sums drift vs any double oracle)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _hyperplanes(dim: int, planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((planes, dim)).round(6).tolist()


def signature_bits(vec: Column, planes: list[list[float]]) -> Column:
    """P-bit sign-random-projection signature as a long."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(dot(vec, plane) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def _banded(df: DataFrame, sig: Column, bands: int, planes: int) -> DataFrame:
    width = planes // bands
    chunk_vals = F.array(
        *[
            F.shiftrightunsigned(sig, c * width).bitwiseAND(F.lit((1 << width) - 1))
            for c in range(bands)
        ]
    )
    return df.select("*", F.posexplode(chunk_vals).alias("band_idx", "band_val"))


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share at least one signature band with
    the query; exact cosine re-ranks candidates. Returns
    (query_id, neighbor_id, cos, rank) — rank ≤ k within the candidate set."""
    hp = _hyperplanes(dim, planes, seed)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    c = _banded(c, signature_bits(F.col("cvec"), hp), bands, planes)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    q = _banded(q, signature_bits(F.col("qvec"), hp), bands, planes)
    cand = (
        c.join(F.broadcast(q), ["band_idx", "band_val"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def cosine_near_dup_pairs(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a, id_b, cos ≥ threshold).
    LSH-banded candidates, exact-cosine verification — the embedding leg of
    the dedup family (minhash/simhash cover the lexical legs)."""
    hp = _hyperplanes(dim, planes, seed)
    base = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    banded = _banded(base, signature_bits(F.col("vec"), hp), bands, planes)
    a = banded.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), "band_idx", "band_val")
    b = banded.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), "band_idx", "band_val")
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    out = cand.select(
        "id_a", "id_b", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cos")
    )
    return out.where(F.col("cos") >= threshold)
