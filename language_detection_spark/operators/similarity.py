"""Similarity search over an embedding column (array<float>).

Two paths, same semantics (cosine top-k):

* brute_force_topk — exact: broadcast the (small) query set against the
  embedding table; dot/norms via JVM higher-order functions (zip_with +
  aggregate, whole-stage codegen), rank with a per-query window.
  At 100 TB the scan side streams; only k rows per query survive the
  window.  This is the correctness baseline.
* lsh_topk — random-hyperplane LSH (Charikar 2002): sign-bit bucket from
  H deterministic hyperplanes (numpy matmul in one Arrow crossing,
  planes broadcast), candidates = bucket collisions across probe tables,
  exact cosine re-rank inside buckets.  Scale path: the join is on a
  short bucket key instead of a cross product.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType
from pyspark.sql.window import Window


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns, JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query.  ``queries`` is broadcast."""
    q = F.broadcast(queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qv"),
    ))
    base = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    scored = q.crossJoin(base).withColumn(
        "sim", cosine_sim(F.col("qv").cast("array<double>"), F.col("v").cast("array<double>"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=seed))
    return rng.standard_normal((dim, n_planes))


def hyperplane_bucket_udf(dim: int, n_planes: int = 12, seed: int = 7):
    planes = _planes(dim, n_planes, seed)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(LongType())
    def _bucket(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        signs = (M @ planes) > 0  # (n, H)
        return pd.Series((signs @ weights).astype(np.int64))

    return _bucket


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate cosine top-k: same-bucket candidates, exact re-rank.
    Recall grows with fewer planes / more probes; here single-probe."""
    bucket = hyperplane_bucket_udf(dim, n_planes, seed)
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    ).withColumn("bucket", bucket(F.col("v")))
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
        ).withColumn("bucket", bucket(F.col("qv")))
    )
    scored = q.join(base, "bucket").withColumn(
        "sim",
        cosine_sim(F.col("qv").cast("array<double>"), F.col("v").cast("array<double>")),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 10,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via bucketed self-join +
    exact cosine verification."""
    bucket = hyperplane_bucket_udf(dim, n_planes, seed)
    base = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("bucket", bucket(F.col("v")))
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .withColumn(
            "sim",
            cosine_sim(
                F.col("a.v").cast("array<double>"), F.col("b.v").cast("array<double>")
            ),
        )
        .filter(F.col("sim") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "sim")
    )
