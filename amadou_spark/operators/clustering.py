"""Distributed embedding clustering and dimensionality reduction.

Two operators a 100 TB curation pipeline runs over its embedding
columns:

- :func:`kmeans` — fixed-round Lloyd's k-means in the Spark-MLlib
  execution shape: the k centroids (k x dim scalars) live on the
  DRIVER and ride into each round's assignment expression as
  literals, so assignment is a pure per-row JVM expression — no join,
  no shuffle, no UDF. Only the centroid UPDATE shuffles, and what it
  shuffles is (cluster, dim_index, partial-sum) scalar triples with
  map-side combine — never the vectors themselves. Per round that is
  ONE exchange of k*dim*n_partitions partial rows; the per-round
  k x dim collect (8 x 64 doubles at defaults) is control-plane, the
  same contract as BPE's per-round argmax (text.py) and the BFS
  source pick (graph.py).

- :func:`random_projection` — Johnson-Lindenstrauss sign-matrix
  projection (Achlioptas 2003 database-friendly variant, +-1
  entries). The matrix is DERIVED, not stored: entry (i, j) is the
  parity of the first hex char of md5("i:j"), so any engine — and
  the DuckDB oracle — reconstructs it bit-identically with no
  side-channel. The projection compiles to a per-row expression
  tree (out_dim zip_with/aggregate folds over literal sign rows):
  zero shuffle, zero Python, scales embarrassingly.

Determinism contract (what makes the DuckDB oracle hash-match):
centroids are ROUNDED to 6 decimals after every mean update and
distances to 6 decimals before the argmin, so the 1e-12 float-sum
association noise between engines can never flip an assignment;
ties on the rounded distance break toward the lowest cluster id.
Initial centroids are the k lowest-id vectors (deterministic,
reshard-stable — no seeded sample whose membership drifts with
partitioning).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _double_sql(x: float) -> str:
    """Exact double literal for SQL text: Python ``repr`` emits the
    shortest decimal that round-trips to the same IEEE double, and
    Spark's parser reads the ``D`` suffix through Double.parseDouble —
    bit-identical to the ``F.lit(float(x))`` it replaces.

    Non-finite doubles have no ``D``-suffix literal form (``nanD``
    would lex as an identifier and crash the parse, a regression vs
    the F.lit path, which built valid NaN/Infinity literals — e.g. a
    single corrupt embedding makes a round-1 centroid mean NaN); they
    are emitted as the CAST form both engines parse."""
    x = float(x)
    if x != x:  # NaN
        return "CAST('NaN' AS DOUBLE)"
    if x == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if x == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return repr(x) + "D"


def _centroid_array_sql(vec: list[float]) -> str:
    return "array(" + ",".join(_double_sql(x) for x in vec) + ")"


def _rounded_distance_sql(vec_col: str, centroid: list[float]) -> str:
    """Euclidean distance to a literal centroid, rounded to 6 decimals
    (both engines sum the squared diffs left-to-right; rounding kills
    the residual association noise). Emitted as SQL TEXT, not a Column
    tree: the k*dim literal expression is parsed JVM-side in one call —
    building it from k*dim ``F.lit`` Columns plus lambda conversions
    cost ~0.7 s of driver py4j round-trips PER assignment pass
    (measured r10), which dominated the whole query."""
    return (
        f"round(sqrt(aggregate(zip_with(`{vec_col}`, "
        f"{_centroid_array_sql(centroid)}, (a, b) -> (a - b) * (a - b)), "
        f"0.0D, (acc, x) -> acc + x)), 6)"
    )


def assign_to_centroids(
    df: DataFrame,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
) -> DataFrame:
    """Append (cluster, dist) for the nearest centroid. Pure per-row
    expression: an array_min over k (rounded_dist, cid) structs — the
    struct ordering IS the tie-break (lowest cid wins on equal rounded
    distance)."""
    best = F.expr(
        "array_min(array("
        + ",".join(
            f"struct({_rounded_distance_sql(vec_col, c)} AS dist, "
            f"CAST({int(cid)} AS INT) AS cluster)"
            for cid, c in centroids
        )
        + "))"
    )
    return df.withColumn("_best", best).withColumn(
        "cluster", F.col("_best.cluster")
    ).withColumn("dist", F.col("_best.dist")).drop("_best")


def kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    rounds: int = 2,
) -> DataFrame:
    """Fixed-round Lloyd's k-means; returns (id_col, cluster, dist).

    ``rounds`` centroid updates run after the initial assignment, then
    a final assignment against the last centroids is returned — i.e.
    rounds+1 assignment passes total, each a shuffle-free map. A
    cluster that loses all members simply drops out of the centroid
    table (both the Spark side and an unrolled-SQL oracle lose it the
    same way, because assignments are bit-identical).

    At 100 TB: each update pass exchanges only (cluster, dim, partial
    sum/count) triples — k*dim*partitions rows of scalars, independent
    of n — and each assignment pass is whole-stage-codegen map work.
    The driver holds k*dim doubles. This is the standard Spark-MLlib
    KMeans dataflow, restated declaratively.
    """
    base = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    init = base.orderBy("_id").limit(k).collect()
    centroids = [
        (i, [float(x) for x in r._v]) for i, r in enumerate(init)
    ]
    for _ in range(rounds):
        assigned = assign_to_centroids(base, "_v", centroids)
        # centroid update: positionwise mean, rounded — the ONLY
        # shuffle, carrying (cluster, dim, x) scalars with map-side
        # partial aggregation; k*dim rows come back to the driver.
        rows = (
            assigned.select("cluster", F.posexplode("_v").alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(F.round(F.avg("x"), 6).alias("ax"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(r.cluster, {})[r.i] = r.ax
        centroids = [
            (cid, [by_cid[cid][i] for i in range(len(by_cid[cid]))])
            for cid in sorted(by_cid)
        ]
    return assign_to_centroids(base, "_v", centroids).select(
        F.col("_id").alias(id_col), "cluster", "dist"
    )


def jl_sign(i: int, j: int) -> int:
    """The (i, j) entry of the derived sign matrix: +1 iff the first
    hex char of md5("i:j") has an even ASCII code. Mirrors the SQL
    spelling ``ascii(substr(md5(i || ':' || j), 1, 1)) % 2 = 0``."""
    h = hashlib.md5(f"{i}:{j}".encode()).hexdigest()
    return 1 if ord(h[0]) % 2 == 0 else -1


def random_projection(
    vec_col: str, out_dim: int, in_dim: int
) -> Column:
    """JL sign-matrix projection as ONE array expression: element i is
    round(sum_j sign(i,j) * v[j] / sqrt(in_dim), 6). No shuffle, no
    UDF — out_dim aggregate-folds over literal sign rows, all inside
    whole-stage codegen. Takes the vector COLUMN NAME: the expression
    is emitted as SQL text parsed JVM-side in one call (out_dim*in_dim
    ``F.lit`` Columns plus per-element lambda conversion cost ~1 s of
    driver py4j round-trips — see ``_rounded_distance_sql``)."""
    scale = _double_sql(float(in_dim) ** 0.5)
    elems = ",".join(
        f"round(aggregate(zip_with(`{vec_col}`, "
        + "array("
        + ",".join(_double_sql(jl_sign(i, j)) for j in range(in_dim))
        + "), (a, b) -> a * b), 0.0D, (acc, x) -> acc + x) / {s}, 6)".format(
            s=scale
        )
        for i in range(out_dim)
    )
    return F.expr(f"array({elems})")
