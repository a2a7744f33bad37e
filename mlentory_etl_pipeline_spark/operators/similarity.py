"""Similarity search over embedding columns (``array<float>``).

Covers the reference's cosine top-k section matching (SURVEY §2.8 N5 —
``QAMatchingEngine.py:154-237``) and the beyond-reference ANN layer:

- :func:`brute_force_topk` — exact cosine top-k per query. The query
  side is small (questions / probe set) → broadcast cross join; scoring
  stays JVM-side via higher-order functions; top-k per group is a
  bounded window.
- :func:`lsh_bucket_topk` — the scale path: sign-random-projection
  buckets (deterministic hyperplanes) shrink each query's search set;
  same scoring inside buckets. Recall is tunable via number of planes /
  probes. At 100 TB the bucketed table is written partitioned by bucket
  so a query touches a handful of partitions (partition pruning).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mlentory_etl_pipeline_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Returns (query_id, neighbor_id, score, rank). Scores are rounded
    (default 4 dp) so results are stable across engines' float
    summation orders; ranking ties break on neighbor id.
    """
    # Precompute norms once per side — the cross join then evaluates a
    # single dot product per pair instead of re-deriving both norms.
    c = corpus.select(
        F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("_cn")
    )
    q = queries.select(
        F.col(query_id_col), F.col(query_vec_col), l2_norm(F.col(query_vec_col)).alias("_qn")
    )
    joined = F.broadcast(q).crossJoin(c)
    score = dot_product(F.col(query_vec_col), F.col(vec_col)) / (
        F.col("_qn") * F.col("_cn")
    )
    if round_digits is not None:
        score = F.round(score, round_digits)
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        score.alias("score"),
    ).where(F.col(query_id_col) != F.col("neighbor_id"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, num_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (no RNG dependency:
    a fixed multiplicative-hash sequence, reproducible anywhere)."""
    planes = []
    state = seed
    for _ in range(num_planes):
        v = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            # map to (-1, 1)
            v.append((state / float(1 << 64)) * 2.0 - 1.0)
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def rp_bucket(df: DataFrame, vec_col: str, dim: int, num_planes: int = 8, seed: int = 7) -> DataFrame:
    """Attach a sign-random-projection bucket id: bit i = sign of the
    dot product with hyperplane i. Deterministic, engine-portable."""
    planes = _hyperplanes(dim, num_planes, seed)
    bucket = None
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot_product(F.col(vec_col), lit_plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.withColumn("bucket", bucket.cast("int"))


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's
    bucket (single-probe). Equi-join on bucket replaces the cross join —
    the candidate set shrinks ~2^planes-fold."""
    c = rp_bucket(corpus, vec_col, dim, num_planes)
    q = rp_bucket(queries, query_vec_col, dim, num_planes)
    joined = q.join(c, "bucket")
    score = F.round(cosine_similarity(F.col(query_vec_col), F.col(vec_col)), 4)
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        score.alias("score"),
    ).where(F.col(query_id_col) != F.col("neighbor_id"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
