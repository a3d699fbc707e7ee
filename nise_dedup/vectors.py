"""Embedding-similarity operators for training-data pipelines.

- brute-force cosine top-k (exact baseline): JVM-side dot products via
  zip_with/aggregate over array<float> columns — no Python, no UDF.
- random-hyperplane LSH bucketing (the scale path): hash each vector to an
  m-bit sign code with a seeded projection matrix (vectorized pandas UDF),
  bucket-join candidates, exact re-rank inside buckets. At 100 TB the
  cross-join in the brute-force path is infeasible; the LSH path shuffles
  only (code, id) pairs and re-ranks within buckets.
- embedding-cosine near-duplicate pairs: all pairs above a cosine threshold,
  restricted to LSH-bucket candidates.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0),
                            lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0),
                            lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


def cosine_topk_bruteforce(embeddings: DataFrame, n_queries: int = 10,
                           k: int = 5, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors for the first ``n_queries`` ids (broadcast the
    query side — it is small by construction; the big side streams)."""
    q = embeddings.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = embeddings.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("nv"))
    scored = (F.broadcast(q).crossJoin(c)
              .where(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine", _cosine(F.col("qv"), F.col("nv"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("cosine", 6).alias("cosine_r")))


def _code_mapper(dim: int, n_bits: int, seed: int, vec_col: str):
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, n_bits))
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (vecs @ planes) > 0                       # (n, n_bits)
            code = np.zeros(len(pdf), dtype=np.int64)
            for j in range(n_bits):
                code |= bits[:, j].astype(np.int64) << j
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(),
                                "code": code})
    return compute


def lsh_codes(embeddings: DataFrame, n_bits: int = 8, seed: int = 42,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane sign codes (Charikar) — DF[vec_id, code]."""
    dim = len(embeddings.select(vec_col).first()[0])
    df = embeddings.select(F.col(id_col).alias("vec_id"), vec_col)
    return df.mapInPandas(_code_mapper(dim, n_bits, seed, vec_col),
                          schema="vec_id long, code long")


def cosine_neardup_pairs(embeddings: DataFrame, threshold: float = 0.9,
                         n_bits: int = 8, seed: int = 42,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs above ``threshold``, restricted to
    same-LSH-bucket candidates (recall < 1 by design; the exact variant is
    the brute-force path). Bucket join shuffles only (code, id)."""
    codes = lsh_codes(embeddings, n_bits, seed, id_col, vec_col)
    vecs = embeddings.select(F.col(id_col).alias("vec_id"),
                             F.col(vec_col).alias("v"))
    with_code = codes.join(vecs, on="vec_id")
    a = with_code.select(F.col("code"), F.col("vec_id").alias("a"),
                         F.col("v").alias("va"))
    b = with_code.select(F.col("code"), F.col("vec_id").alias("b"),
                         F.col("v").alias("vb"))
    return (a.join(b, on="code")
            .where(F.col("a") < F.col("b"))
            .withColumn("cosine", _cosine(F.col("va"), F.col("vb")))
            .where(F.col("cosine") >= threshold)
            .select("a", "b", F.round("cosine", 6).alias("cosine_r"))
            .dropDuplicates(["a", "b"]))
