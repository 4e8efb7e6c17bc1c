"""Similarity search over an embedding column (array<float>).

Two paths, as the north star prescribes:
- brute-force cosine top-k — the exact baseline. All arithmetic is
  JVM-side (`aggregate`/`zip_with` higher-order functions — no Python,
  no UDF): a broadcast of the (small) query set against a full scan of
  the corpus, then a per-query top-k window. At 100 TB this is the
  right plan when |queries| is small: one corpus scan, no shuffle of
  the corpus itself (the window partitions by query id, and the rows
  entering the shuffle are already filtered to candidate scores).
- LSH-bucketed (random hyperplane signs → band buckets) — the scale
  path when |queries| is large: candidate pairs come from an equi-join
  on signature bands instead of a cross join. Recall is tunable via
  (n_planes, n_bands); tests pin recall ≥ threshold vs brute force.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, strictly left-to-right (so the
    summation order — and therefore the float result — is reproducible
    in any engine that folds sequentially)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine, rank) — excludes self.
    Ties broken by neighbor_id so the k-set is deterministic.
    """
    queries = embeddings.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    if query_ids is not None:
        queries = queries.filter(F.col("query_id").isin(query_ids))
    corpus = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        corpus.join(F.broadcast(queries), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qvec"), F.col("cvec"))
                / (_norm(F.col("qvec")) * _norm(F.col("cvec"))),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-free hyperplane normals (driver-side constant,
    broadcast with the plan — tiny)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 16,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via random-hyperplane LSH.

    Signature = sign bits of ⟨v, plane_j⟩; split into ``n_bands`` bands;
    candidates = pairs agreeing on ≥1 full band (equi-join on
    (band, band_value) — the only shuffle, and it's key-partitioned).
    Exact cosine is then computed only for candidates.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    bits_per_band = n_planes // n_bands

    def signature(vec: Column) -> Column:
        bits = [
            F.when(
                _dot(vec, F.array(*[F.lit(p) for p in plane])) >= 0, F.lit(1)
            ).otherwise(F.lit(0))
            for plane in planes
        ]
        return F.array(*bits)

    sig = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"), signature(F.col(vec_col)).alias("sig")
    )
    bands = sig.select(
        "vid",
        "vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.concat_ws(
                            "",
                            *[
                                F.element_at(F.col("sig"), band * bits_per_band + j + 1)
                                for j in range(bits_per_band)
                            ],
                        ).alias("value"),
                    )
                    for band in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select("vid", "vec", "bv.band", "bv.value")

    q = bands.alias("q")
    if query_ids is not None:
        q = bands.filter(F.col("vid").isin(query_ids)).alias("q")
    c = bands.alias("c")
    candidates = (
        q.join(
            c,
            (F.col("q.band") == F.col("c.band"))
            & (F.col("q.value") == F.col("c.value"))
            & (F.col("q.vid") != F.col("c.vid")),
        )
        .select(
            F.col("q.vid").alias("query_id"),
            F.col("c.vid").alias("neighbor_id"),
            F.col("q.vec").alias("qvec"),
            F.col("c.vec").alias("cvec"),
        )
        .distinct()
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("qvec"), F.col("cvec")) / (_norm(F.col("qvec")) * _norm(F.col("cvec"))),
            6,
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def cosine_topk_ivf(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via IVF (inverted file index):
    k-means coarse quantizer → every vector assigned to its nearest
    centroid list → each query probes only its ``n_probe`` nearest
    lists → exact cosine re-rank inside the probed lists.

    The scale shape: the corpus is scanned once to build assignments
    (in production the assignment is persisted, bucketed by list id);
    a query then touches n_probe/n_lists of the data — recall is
    tunable with n_probe, and tests pin it against brute force.
    KMeans is seeded → the index, and therefore the result set, is
    deterministic.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    with_vec = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias(
            "features"
        ),
    )
    km = KMeans(k=n_lists, seed=seed, featuresCol="features", predictionCol="list_id")
    model = km.fit(with_vec)
    assigned = model.transform(with_vec).select("vid", "vec", "list_id")

    # centroid table is tiny: broadcast as a literal-free DataFrame
    spark = embeddings.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "list_id INT, centroid ARRAY<DOUBLE>",
    )

    queries = assigned.select(F.col("vid").alias("query_id"), F.col("vec").alias("qvec"))
    if query_ids is not None:
        queries = queries.filter(F.col("query_id").isin(query_ids))
    # rank centroid lists per query, keep n_probe nearest (by cosine)
    q_lists = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "qvec",
            "list_id",
            (
                _dot(F.col("qvec"), F.col("centroid"))
                / (_norm(F.col("qvec")) * _norm(F.col("centroid")))
            ).alias("c_sim"),
        )
        .withColumn(
            "c_rank",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.col("c_sim").desc(), "list_id")
            ),
        )
        .filter(F.col("c_rank") <= n_probe)
        .select("query_id", "qvec", "list_id")
    )
    # probe: equi-join on list_id — only n_probe lists of the corpus per
    # query. Explicit repartition before scoring: candidate rows are tiny
    # in bytes but heavy in per-row compute, and AQE's byte-based
    # coalescing would otherwise squeeze them onto one task.
    scored = (
        q_lists.join(assigned.select("vid", "vec", "list_id"), "list_id")
        .filter(F.col("query_id") != F.col("vid"))
        .repartition(64, "query_id")
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            F.round(
                _dot(F.col("qvec"), F.col("vec"))
                / (_norm(F.col("qvec")) * _norm(F.col("vec"))),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
