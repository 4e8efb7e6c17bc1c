"""Scale posture helpers (SURVEY §7 M7): skew-aware joins, bucketing.

AQE (`spark.sql.adaptive.skewJoin`) is the first line of defense and is
on by default in our sessions. These helpers cover what AQE can't:
- salting for aggregations and for joins where one side must be
  replicated (AQE skew-join only splits sort-merge partitions);
- bucketed table writes so repeated joins on the same key skip the
  shuffle entirely (the 100 TB answer for fact-fact joins that run
  daily: pay the shuffle once at write time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def materialize_shared(df: DataFrame) -> DataFrame:
    """Eagerly materialize a DataFrame that multiple consumers will
    read (shared subtrees in one plan, or rounds of an iterative loop),
    returning a lineage-cut frame backed by the materialized blocks.

    Uses a RELIABLE ``checkpoint()`` when the session has a checkpoint
    dir configured (the cluster posture: blocks on the checkpoint
    filesystem survive executor loss), else an eager
    ``localCheckpoint()`` (single-node / test posture: executor-local
    blocks, cheapest). Both truncate lineage — essential in iterative
    loops, where persist alone leaves each round's analyzed plan
    embedding the previous round's and plan-building grows
    exponentially with rounds.
    """
    sc = df.sparkSession.sparkContext
    has_dir = sc._jsc.sc().checkpointDir().isDefined()
    return df.checkpoint(eager=True) if has_dir else df.localCheckpoint()


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `skewed` has hot keys: append a random salt to
    the skewed side's key and replicate `other` across all salt values,
    so one hot key spreads over ``n_salts`` shuffle partitions instead
    of one straggler task.

    Replication is an explode of a literal range — `other`'s scan is
    NOT repeated n times; rows fan out after the scan. Cost: `other`'s
    shuffle volume × n_salts, the price of unsticking the hot key.

    Only join types where an unmatched `other` row produces no output
    are allowed: under 'right'/'full' every unmatched replicated right
    row would be emitted n_salts times (duplicate rows)."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}, not {how!r}: replicating "
            "the right side duplicates its unmatched rows under right/full joins"
        )
    salted_l = skewed.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salted_r = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_l.join(salted_r, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: group on
    (keys + salt) first (spreads the hot key), then re-aggregate the
    partials. Only works for decomposable aggregates — the caller
    passes (partial_agg, final_agg) pairs as
    [(F.sum, F.sum), (F.count, F.sum), ...] applied to one column each:
    aggs = [(col, partial_fn, final_fn, out_name), ...]."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[pf(c).alias(f"_p_{name}") for c, pf, _, name in aggs]
    )
    final = partial.groupBy(*keys).agg(
        *[ff(f"_p_{name}").alias(name) for _, _, ff, name in aggs]
    )
    return final


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    fmt: str = "parquet",
) -> None:
    """Persist hash-bucketed (and optionally sorted) by the join key:
    later equi-joins/aggregations on ``bucket_col`` between tables
    bucketed the same way need NO shuffle (and no sort, if sorted).
    Buckets land in the session catalog (saveAsTable — bucketing
    metadata lives in the metastore, not plain files)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table_name}`")
    # A PREVIOUS session's table leaves its warehouse directory behind
    # with no catalog entry in the new session; saveAsTable then fails
    # with LOCATION_ALREADY_EXISTS even under mode=overwrite. Remove the
    # orphaned location via the Hadoop FS API (portable to any FS).
    try:
        jvm = spark._jvm
        wh = spark.conf.get("spark.sql.warehouse.dir")
        path = jvm.org.apache.hadoop.fs.Path(wh.rstrip("/") + "/" + table_name)
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(path):
            fs.delete(path, True)
    except Exception:
        pass  # best-effort; saveAsTable raises a clear error if blocked
    writer = df.write.format(fmt).mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bloom_prune(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 8192,
    n_hashes: int = 3,
) -> DataFrame:
    """Pre-filter ``fact`` with a Bloom filter built over ``dim_keys``
    BEFORE a shuffle join — the runtime-filter pattern Spark's
    optimizer injects for itself (`bloom_filter_agg`/`might_contain`
    are optimizer-internal, not SQL-callable), rebuilt portably from
    DataFrame primitives so any join can opt in explicitly.

    Construction (all distributed, one tiny collect-free broadcast):
    each dim key sets ``n_hashes`` md5-derived bit positions; positions
    roll up into 64-bit words via ``bit_or`` (map-side combined) and
    the <= n_bits/64-entry (word_idx -> word) map crosses to the fact
    side as a broadcast single row. The fact filter is pure JVM:
    ``element_at(map, pos/64) & (1 << pos%64)`` per hash — O(1) per
    probe, no Python, no shuffle.

    Semantics: strictly a superset filter (Bloom false positives
    remain), so the downstream exact join is unchanged — results are
    bit-identical with or without pruning. The win at 100 TB: the
    fact rows that would die in the join are dropped BEFORE the
    exchange, cutting shuffle volume by the dim selectivity (the same
    reason Spark's own runtime row-group filtering exists).
    """
    pos_cols = []
    key_str = F.col(dim_key).cast("string")
    for i in range(n_hashes):
        hv = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), key_str)), 1, 15),
            16,
            10,
        ).cast("bigint")
        pos_cols.append(F.pmod(hv, F.lit(n_bits)))
    positions = dim_keys.select(
        F.explode(F.array(*pos_cols)).alias("pos")
    )
    words = (
        positions.select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("w", "word"))
            ).alias("bloom")
        )
    )
    fkey_str = F.col(fact_key).cast("string")
    probed = fact.crossJoin(F.broadcast(words))
    pcols = []
    for i in range(n_hashes):
        hv = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), fkey_str)), 1, 15),
            16,
            10,
        ).cast("bigint")
        pcol = f"_bloom_pos_{i}"
        probed = probed.withColumn(pcol, F.pmod(hv, F.lit(n_bits)))
        pcols.append(pcol)
    cond = None
    for pcol in pcols:
        hit = F.expr(
            f"coalesce(element_at(bloom, CAST({pcol} / 64 AS INT)), 0L)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST({pcol} % 64 AS INT)) != 0"
        )
        cond = hit if cond is None else (cond & hit)
    return probed.filter(cond).drop("bloom", *pcols)
