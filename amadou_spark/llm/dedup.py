"""Deduplication operators: exact, n-gram Jaccard, SimHash, MinHash-LSH.

Scale design (100 TB corpus):
- exact dedup groups on a 256-bit content hash → shuffle carries 32-byte
  keys instead of documents;
- near-dup candidate generation NEVER does an O(n²) cross join: pairs
  come from an inverted-index self-join on shingles (n-gram Jaccard),
  LSH band buckets (MinHash), or signature buckets (SimHash), each of
  which is an equi-join Catalyst can shuffle-partition;
- frequent-shingle capping bounds the worst-case join fan-out (a shingle
  appearing in f docs contributes f² candidate pairs — a stop-shingle
  list is the skew guard, same role as salting a hot key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from amadou_spark.llm.text import portable_token_hash, tokens


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via sha2-256 grouping: one row per distinct content,
    keeping the smallest doc_id as canonical. Output: (content_hash,
    keep_id, n_copies)."""
    return (
        docs.select(F.sha2(F.col(text_col), 256).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a document.

    Documents shorter than n tokens fall back to a single whole-text
    shingle: (a) short docs stay comparable (by exact text), and (b) no
    row ever carries an empty shingle set — MinHashLSH rejects all-zero
    vectors, and a filter is not a reliable guard because Spark may
    evaluate UDF projections before filters within a collapsed stage.
    Also note Spark's sequence(0, -k) counts DOWN, so the n-token guard
    is required for correctness, not just hygiene."""
    toks = tokens(text)
    made = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
        )
    )
    return F.when(F.size(toks) >= n, made).otherwise(F.array(text))


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_jaccard: float = 0.05,
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """Near-dup candidate pairs by n-gram Jaccard similarity.

    Inverted-index plan: doc→shingles (explode) → self equi-join on
    shingle (id_a < id_b) → count common shingles per pair → join per-doc
    shingle counts → jaccard = common / (|A| + |B| - common).

    ``max_shingle_freq`` drops shingles shared by more than that many
    docs (stop-shingles): they add candidate pairs quadratically while
    carrying almost no signal — this is the skew guard that keeps the
    self-join bounded at corpus scale.
    """
    sh = docs.select(
        F.col("doc_id"), F.explode(shingles(F.col(text_col), n)).alias("shingle")
    )
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") > max_shingle_freq)
        .select("shingle")
    )
    sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    ca = counts.select(F.col("doc_id").alias("id_a"), F.col("n_shingles").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        common.join(F.broadcast(ca), "id_a")
        .join(F.broadcast(cb), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


SIMHASH_BITS = 32


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """32-bit SimHash over whitespace tokens with term-frequency weights.

    Classic construction: per token hash h, each bit b votes +1 if set
    else -1; the signature sets bit b when the vote sum is positive.
    Implemented as explode → 32 conditional SUM aggregates → bit
    recombination, all JVM-side. Uses the portable md5-based hash so the
    signature is bit-for-bit reproducible in any engine (oracle-checked).
    """
    toks = docs.select("doc_id", F.explode(tokens(F.col(text_col))).alias("tok"))
    h = portable_token_hash(F.col("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    sig = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{b}") > 0, F.lit(2**b).cast("bigint")).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return toks.groupBy("doc_id").agg(*votes).select("doc_id", sig.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded for scale:
    split the 32-bit signature into 4 bytes; by pigeonhole, any pair
    within Hamming ≤3 agrees on at least one byte → equi-join on
    (band_index, band_value) buckets, then verify exact distance via
    bit_count(xor). No cross join anywhere."""
    sigs = simhash(docs, text_col)
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), 8 * i)
                        .bitwiseAND(F.lit(255))
                        .alias("value"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "simhash", "bv.band", "bv.value")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.value") == F.col("b.value"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    max_distance: float = 0.6,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via MinHash LSH (pyspark.ml.feature.MinHashLSH):
    shingle set → sparse binary vector (HashingTF) → MinHash signatures
    → approxSimilarityJoin (band-bucketed, never O(n²)). Returns
    (id_a, id_b, jaccard_dist). Not SQL-expressible → rows-only check;
    correctness is pinned by tests against exact Jaccard on planted
    near-duplicates."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    with_shingles = docs.select("doc_id", shingles(F.col(text_col), n).alias("sh"))
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=1 << 18, binary=True)
    feats = tf.transform(with_shingles)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hashes, seed=seed)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, max_distance, distCol="jaccard_dist")
    return (
        joined.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )
