"""Similarity search over embedding columns (engine extension;
SURVEY.md §7 Phase 4 / BASELINE.json north star).

Brute-force cosine top-k is the correctness baseline (and is already
the right plan when the query set is small: broadcast queries × scan
corpus, per-partition top-k via TakeOrdered — no shuffle of the
corpus). The scale path is IVF-style pruning: cluster the corpus once,
route each query to its ``nprobe`` nearest centroids, and search only
those partitions — at 100 TB the centroid assignment is the partition
key, so a probe touches ~nprobe/k of the data.

All vector math is sequential-fold array expressions (deterministic,
JVM codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(c: Column) -> Column:
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    Queries are broadcast (the small side); the corpus is scanned once
    with no shuffle; the per-query top-k window shuffles only
    |queries|×|corpus-partition-topk| rows after AQE.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", l2_norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", l2_norm(F.col("cv")))
    sim = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sim.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cosine"), "rnk")
    )


def sign_lsh_bucket(vec: Column, bits: int = 8) -> Column:
    """Sign-bit LSH bucket id from the first ``bits`` dimensions —
    deterministic, hyperplane-free (axis-aligned) hashing."""
    out = F.lit(0)
    for i in range(bits):
        out = out + F.when(F.element_at(vec, i + 1) >= 0, F.lit(2**i)).otherwise(0)
    return out


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: search only the query's LSH bucket.

    The bucket id becomes the equi-join key, so Spark prunes
    |corpus|/2^bits of the work per query; recall trades off with
    ``bits``. The 100 TB variant writes the corpus bucketed
    (``bucketBy(2^bits, 'bucket')``) so probes are single-bucket scans.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", l2_norm(F.col("qv"))).withColumn("bkt", sign_lsh_bucket(F.col("qv"), bits))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", l2_norm(F.col("cv"))).withColumn("bkt", sign_lsh_bucket(F.col("cv"), bits))
    sim = (
        c.join(F.broadcast(q), "bkt")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sim.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cosine"), "rnk")
    )


def label_centroids(corpus: DataFrame, label_col: str = "label", vec_col: str = "embedding") -> DataFrame:
    """Element-wise mean vector per label — the IVF coarse-quantizer
    building block (posexplode → per-(label, dim) mean)."""
    v = _as_double(F.col(vec_col))
    ex = corpus.select(F.col(label_col).alias("label"), F.posexplode(v).alias("dim0", "x"))
    # `+ 0.0` canonicalizes IEEE -0.0 to +0.0 so value hashes agree
    # across engines when a mean rounds to zero from below.
    return (
        ex.groupBy("label", (F.col("dim0") + 1).alias("dim"))
        .agg((F.round(F.avg("x"), 4) + F.lit(0.0)).alias("centroid"))
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF-style ANN using the label column as the coarse partition
    (in production the assignment comes from k-means; the fixture's
    ``label`` plays that role): route each query to its ``nprobe``
    closest centroids, search only those partitions."""
    cents = (
        label_centroids(corpus, label_col, vec_col)
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "centroid"))).alias("pairs"))
        .select("label", F.transform("pairs", lambda p: p["centroid"]).alias("cv"))
    )
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv"))
    routed = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("sim_c", cosine(F.col("qv"), F.col("cv")))
        .withColumn(
            "rc",
            F.row_number().over(Window.partitionBy("query_id").orderBy(F.desc("sim_c"), F.asc("label"))),
        )
        .filter(F.col("rc") <= nprobe)
        .select("query_id", "qv", "label")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("label"),
        _as_double(F.col(vec_col)).alias("cv"),
    )
    sim = (
        c.join(F.broadcast(routed), "label")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sim.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cosine"), "rnk")
    )
