"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exactness baseline, and a bucketed (IVF-style)
variant as the scale path: search only within a coarse partition instead of the
full corpus. Dot products run JVM-side via F.aggregate/F.zip_with (whole-stage
codegen) — no Python in the hot loop.

At 100 TB scale: brute force is O(Q·N) — only for small Q against a broadcast
query set; the IVF path shuffles once on the coarse key and bounds each task's
candidate set to one bucket. Scores are rounded to 6 dp and ties broken by
neighbor id so results are deterministic and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast queries × corpus scan.

    Output: (query_id, neighbor_id, cosine, rank).
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    e = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qvec"), F.col("nvec"))
                / (_norm(F.col("qvec")) * _norm(F.col("nvec"))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    max_bucket: int = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b) within coarse buckets.

    The scale path for embedding dedup: one shuffle on the bucket key bounds the
    pair space to within-bucket; cross-bucket near-dups are by construction
    below the quantizer's resolution (standard IVF dedup trade-off).

    Buckets larger than `max_bucket` are dropped before the self-join — one hot
    bucket (a degenerate quantizer cell) would otherwise go O(b²) and dominate
    the job at corpus scale; mirror of the minhash-LSH cap (dedup.py
    minhash_lsh_pairs). Degenerate cells are exact-dedup territory anyway.
    """
    sized = embeddings.withColumn(
        "_bsize", F.count(F.lit(1)).over(Window.partitionBy(bucket_col))
    ).filter(F.col("_bsize") <= max_bucket)
    a = sized.select(
        F.col(id_col).alias("doc_a"),
        F.col(vec_col).alias("avec"),
        F.col(bucket_col).alias("bucket"),
    )
    b = sized.select(
        F.col(id_col).alias("doc_b"),
        F.col(vec_col).alias("bvec"),
        F.col(bucket_col).alias("bucket"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                _dot(F.col("avec"), F.col("bvec"))
                / (_norm(F.col("avec")) * _norm(F.col("bvec"))),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cosine_topk_bucketed(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    bucket_col: str = "label",
) -> DataFrame:
    """IVF-style top-k: candidates restricted to the query's coarse bucket.

    Here the coarse quantizer is the precomputed `label` column (in production:
    a k-means assignment or LSH bucket). One shuffle on the bucket key; each
    task scans a single bucket — the 100 TB path.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col(bucket_col).alias("bucket"),
    )
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        F.col(bucket_col).alias("bucket"),
    )
    scored = (
        e.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qvec"), F.col("nvec"))
                / (_norm(F.col("qvec")) * _norm(F.col("nvec"))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
