"""Similarity search over embedding columns (array<float>).

Two paths:
- brute-force cosine top-k — exact, O(Q x N); the right baseline
  when Q is small (broadcast the query side, scan the corpus once).
- random-hyperplane LSH buckets — the scale path: both sides bucket
  by sign-pattern, candidates come from an equi-join on the bucket
  key, exact cosine only inside buckets. Multi-probe (flip one bit)
  trades recall for cost.

All dot products are built-in higher-order functions (zip_with +
aggregate) over double-cast arrays — JVM-side, no Python.
Determinism: hyperplanes derive from a fixed-seed hash of the
dimension index, not an RNG at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right dot product (stable order => stable
    floats, comparable across engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (self-matches
    excluded). Broadcast the (small) query side; the corpus is
    scanned exactly once. Ties break on neighbor id ascending.

    Returns (query_id, neighbor_id, cosine, rank).
    """
    q = queries.select(
        F.col(query_id).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def hyperplane_bucket(vec: Column, n_planes: int = 16, dim: int = 64, table: int = 0) -> Column:
    """Sign-pattern bucket id from deterministic pseudo-random
    hyperplanes: plane p's weight for dimension d is a fixed hash
    h(table, p, d) mapped to [-1, 1]. No runtime RNG -> reproducible;
    ``table`` selects an independent plane set (LSH amplification)."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        weights = F.array(
            *[
                (F.xxhash64(F.lit(table * 1000003 + p * 100003 + d)) % 2001 - 1000)
                / 1000.0
                for d in range(dim)
            ]
        )
        proj = dot(vec, weights)
        bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(F.shiftleft(bit, p))
    return bucket


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: bucket both sides by hyperplane signs,
    equi-join on bucket (plus one-bit-flip multi-probe), exact
    cosine within candidates. At 100 TB the bucket join replaces the
    full cross product; recall is tunable via n_planes/probes."""
    q = queries.select(
        F.col(query_id).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", hyperplane_bucket(F.col("qv"), n_planes, dim))
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", hyperplane_bucket(F.col("cv"), n_planes, dim))

    # multi-probe: original bucket + each one-bit flip
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
    )
    q_probed = q.select("query_id", "qv", F.explode(probes).alias("bucket"))

    scored = (
        q_probed.join(c, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH buckets + exact
    verify. ``n_tables`` independent plane sets amplify recall
    (a high-cosine pair crossing one hyperplane still collides in
    another table); candidates are the union over tables, verified
    once. Returns (id_a, id_b, cosine >= threshold)."""
    v = df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    tables = F.array(
        *[
            hyperplane_bucket(F.col("v"), n_planes, dim, table=t).bitwiseXOR(
                F.lit(t).cast("long") * F.lit(1 << n_planes).cast("long")
            )
            for t in range(n_tables)
        ]
    )
    bucketed = v.select("id", "v", F.explode(tables).alias("bucket"))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
