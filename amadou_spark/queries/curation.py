"""Corpus-curation round 2: the operations a PRODUCTION training-data
pipeline runs between crawls — incremental dedup against yesterday's
corpus, temperature-balanced multilingual sampling, BPE merge-candidate
mining, and snapshot reconciliation — plus the GROUP BY ALL sugar.

Scale notes per query:

- llm_dedup_incremental: the historical side is a 32-byte hash INDEX,
  never the documents; at 100 TB the daily batch anti-joins against a
  bucketed hash table and only the batch shuffles.
- llm_sample_temperature: the per-language statistics are a ~|langs|-row
  aggregate broadcast back onto the corpus — one scan, one broadcast
  join, membership decided by a portable content hash (reshard-stable,
  no seeded sample() whose membership drifts with partitioning).
- llm_bpe_pair_counts: adjacent-pair mining is explode + partial-agg
  count (map-side combine collapses the fan-out before the shuffle) and
  a TakeOrdered top-k — the first step of BPE vocabulary induction.
- q73_snapshot_diff: full-outer join on the key with row-hash compare —
  at scale both snapshots arrive bucketed by the key and the join is
  co-located (scale.write_bucketed); the output is one row per key
  CLASS, never a row per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amadou_spark.catalog import register_tables
from amadou_spark.queries import query

# Portable uniform-in-[0,1) from doc_id: 6-decimal granularity so the
# Spark and DuckDB spellings are bit-identical rationals. A function,
# not a module constant: Column construction needs an active
# SparkContext, and this module imports at registry-load time, which
# can precede session creation (e.g. a driver calling queries() first).
def _spark_u():
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 1_000_000
    ) / 1_000_000.0


_DUCK_U = (
    "(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    " % 1000000) / 1000000.0"
)


@query(
    "llm_dedup_incremental",
    oracle="""
        WITH hist AS (
            SELECT DISTINCT sha256(text) AS content_hash
            FROM documents
            WHERE (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 1000000) / 1000000.0 < 0.8
        ), batch AS (
            SELECT doc_id, lang, sha256(text) AS content_hash
            FROM documents
            WHERE (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 1000000) / 1000000.0 >= 0.8
        )
        SELECT b.doc_id, b.lang, b.content_hash
        FROM batch b
        WHERE NOT EXISTS (SELECT 1 FROM hist h
                          WHERE h.content_hash = b.content_hash)
        ORDER BY doc_id
    """,
    description="incremental (cross-snapshot) dedup: today's batch keeps "
    "only docs whose sha2-256 content hash is absent from the historical "
    "hash index — the between-crawls production pattern. The history side "
    "is 32-byte hashes, never documents; only the daily batch shuffles "
    "(left_anti join), and at scale the hash index lives bucketed on "
    "content_hash so the probe is co-located",
    tags=("llm", "dedup", "incremental"),
)
def llm_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    hist = (
        docs.filter(_spark_u() < 0.8)
        .select(F.sha2("text", 256).alias("content_hash"))
        .distinct()
    )
    batch = docs.filter(_spark_u() >= 0.8).select(
        "doc_id", "lang", F.sha2("text", 256).alias("content_hash")
    )
    return batch.join(hist, "content_hash", "left_anti").select(
        "doc_id", "lang", "content_hash"
    ).orderBy("doc_id")


_ALPHA = 0.3  # temperature exponent (mT5/CC-style language balancing)
_BUDGET_FRAC = 0.4  # sample budget as a fraction of the corpus


@query(
    "llm_sample_temperature",
    oracle=f"""
        WITH stats AS (
            SELECT lang, count(*) AS c FROM documents GROUP BY lang
        ), probs AS (
            SELECT lang, c,
                   POW(c * 1.0 / (SELECT sum(c) FROM stats), {_ALPHA})
                   / (SELECT sum(POW(c * 1.0 / (SELECT sum(c) FROM stats),
                                     {_ALPHA})) FROM stats) AS q
            FROM stats
        ), keyed AS (
            SELECT d.doc_id, d.lang,
                   ROUND(LEAST(1.0,
                       {_BUDGET_FRAC} * (SELECT sum(c) FROM stats) * p.q / p.c
                   ), 6) AS keep_prob,
                   {_DUCK_U} AS u
            FROM documents d JOIN probs p USING (lang)
        )
        SELECT doc_id, lang, keep_prob
        FROM keyed WHERE u < keep_prob
        ORDER BY doc_id
    """,
    description="temperature-balanced multilingual sampling (alpha=0.3): "
    "per-language mass p_l is flattened to p_l^alpha (renormalized) so "
    "low-resource languages are upsampled relative to their share, then "
    "each doc keeps with prob budget*q_l/c_l decided by a portable "
    "content hash — deterministic, reshard-stable membership; the "
    "language stats are a |langs|-row broadcast, the corpus is scanned "
    "once",
    tags=("llm", "sampling"),
)
def llm_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amadou_spark.scale import materialize_shared

    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    # per-language stats checkpointed (|langs| rows — free): the chain
    # tot -> w -> z -> probs references it four times and column
    # pruning forks un-checkpointed copies (r7 dup audit: 8 documents
    # scans), so without the cut the corpus lang column re-scans per
    # consumer. One corpus scan for the stats + one for the sample.
    stats = materialize_shared(
        docs.groupBy("lang").agg(F.count("*").alias("c"))
    )
    tot = stats.agg(F.sum("c").alias("total"))
    w = stats.crossJoin(F.broadcast(tot)).withColumn(
        "w", F.pow(F.col("c") / F.col("total"), F.lit(_ALPHA))
    )
    z = w.agg(F.sum("w").alias("z"))
    probs = w.crossJoin(F.broadcast(z)).select(
        "lang",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(_BUDGET_FRAC)
                * F.col("total")
                * (F.col("w") / F.col("z"))
                / F.col("c"),
            ),
            6,
        ).alias("keep_prob"),
    )
    return (
        docs.join(F.broadcast(probs), "lang")
        .select("doc_id", "lang", "keep_prob")
        .filter(_spark_u() < F.col("keep_prob"))
        .orderBy("doc_id")
    )


@query(
    "llm_bpe_pair_counts",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
            FROM documents
        ), pairs AS (
            SELECT tok || ' ' || lead(tok, 1) OVER (
                       PARTITION BY doc_id ORDER BY pos) AS pair
            FROM toks
            QUALIFY lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos)
                    IS NOT NULL
        )
        SELECT pair, count(*) AS n
        FROM pairs GROUP BY pair
        ORDER BY n DESC, pair
        LIMIT 50
    """,
    description="BPE merge-candidate mining: adjacent token-pair "
    "frequencies over the corpus — the inner statistic of byte-pair-"
    "encoding vocabulary induction. Spark side builds pairs with "
    "zip_with over two array slices (zero windows, zero shuffles before "
    "the count), the count partial-aggregates map-side, and top-50 is a "
    "TakeOrdered, not a global sort",
    tags=("llm", "tokenizer"),
)
def llm_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    return (
        t["documents"]
        .select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(50)
    )


_BPE_MERGES = 6


def _bpe_oracle(num_merges: int, final: str = "merges") -> str:
    """Unrolled DuckDB mirror of ``bpe_learn_merges``: each round is a
    (pair-count, argmax, replace) CTE block over the previous round's
    word-frequency vocab. ``final`` picks the projection: the learned
    rule table (``merges``) or the encoded distinct-word table
    (``encode``, mirroring ``bpe_encode``). ``replace`` in both
    engines is one
    left-to-right non-overlapping pass, so the corpora stay
    bit-identical round to round; SUM(cnt) is cast back to BIGINT
    (DuckDB sums BIGINT into HUGEINT, which the driver hash rejects)."""
    # AS MATERIALIZED per round: DuckDB inlines plain CTEs and each
    # round references v{r-1} twice (directly and via the argmax), so
    # inlining duplicates the base scan ~2^rounds times.
    blocks = [
        """
        WITH words AS (
            SELECT word, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS word
                  FROM documents)
            WHERE word <> '' GROUP BY word
        ), v0 AS MATERIALIZED (
            SELECT word, cnt,
                   '\u00b7' || regexp_replace(word, '(.)', '\\1\u00b7', 'g')
                       AS repr
            FROM words
        )"""
    ]
    for r in range(1, num_merges + 1):
        blocks.append(
            f""", p{r} AS MATERIALIZED (
            SELECT s.sym AS s1,
                   lead(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos)
                       AS s2,
                   s.cnt
            FROM (
                SELECT word, cnt,
                       unnest(list_filter(string_split(repr, '\u00b7'),
                                          x -> x <> '')) AS sym,
                       generate_subscripts(
                           list_filter(string_split(repr, '\u00b7'),
                                       x -> x <> ''), 1) AS pos
                FROM v{r - 1}
            ) s
        ), a{r} AS MATERIALIZED (
            SELECT s1, s2, CAST(SUM(cnt) AS BIGINT) AS n
            FROM p{r} WHERE s2 IS NOT NULL
            GROUP BY s1, s2 ORDER BY n DESC, s1, s2 LIMIT 1
        ), v{r} AS MATERIALIZED (
            SELECT v.word, v.cnt,
                   replace(v.repr,
                           '\u00b7' || a.s1 || '\u00b7' || a.s2 || '\u00b7',
                           '\u00b7' || a.s1 || a.s2 || '\u00b7') AS repr
            FROM v{r - 1} v, a{r} a
        )"""
        )
    if final == "encode":
        blocks.append(
            f"""
        SELECT word, cnt,
               CAST(len(list_filter(string_split(repr, '·'),
                                    x -> x <> '')) AS BIGINT) AS n_tokens,
               array_to_string(list_filter(string_split(repr, '·'),
                                           x -> x <> ''), ' ') AS encoded
        FROM v{num_merges} ORDER BY word"""
        )
        return "".join(blocks)
    if final == "fertility":
        blocks.append(
            f"""
        , enc AS (
            SELECT word,
                   CAST(len(list_filter(string_split(repr, '·'),
                                        x -> x <> '')) AS BIGINT)
                       AS n_tokens,
                   CAST(len(word) AS BIGINT) AS n_chars
            FROM v{num_merges}
        ), corpus AS (
            SELECT d.lang,
                   unnest(string_split(d.text, ' ')) AS word
            FROM documents d
        )
        SELECT c.lang,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(SUM(e.n_tokens) AS BIGINT) AS n_tokens,
               ROUND(SUM(e.n_tokens) / CAST(count(*) AS DOUBLE), 4)
                   AS fertility,
               ROUND(SUM(e.n_chars) / CAST(SUM(e.n_tokens) AS DOUBLE), 4)
                   AS chars_per_token
        FROM corpus c JOIN enc e USING (word)
        WHERE c.word <> ''
        GROUP BY c.lang ORDER BY c.lang"""
        )
        return "".join(blocks)
    union = "\n            UNION ALL\n".join(
        f"""            SELECT {r} AS merge_rank, s1 AS left_sym,
                   s2 AS right_sym, s1 || s2 AS merged, n AS pair_count
            FROM a{r}"""
        for r in range(1, num_merges + 1)
    )
    blocks.append(
        f"""
        SELECT * FROM (
{union}
        ) ORDER BY merge_rank"""
    )
    return "".join(blocks)


@query(
    "llm_token_pmi",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        ), uni AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT unnest(ts) AS tok FROM toks) GROUP BY tok
        ), tot AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni
        ), seq AS (
            SELECT doc_id, unnest(ts) AS tok,
                   generate_subscripts(ts, 1) AS pos
            FROM toks
        ), pairs AS (
            SELECT a, b, CAST(count(*) AS BIGINT) AS cab
            FROM (
                SELECT tok AS a,
                       lead(tok) OVER (PARTITION BY doc_id ORDER BY pos)
                           AS b
                FROM seq
            )
            WHERE b IS NOT NULL
            GROUP BY a, b
        )
        SELECT a, b, cab AS pair_count,
               ROUND(ln(CAST(tot.n AS DOUBLE) * cab
                        / (CAST(ua.c AS DOUBLE) * ub.c)), 6) AS pmi
        FROM pairs
        JOIN uni ua ON ua.tok = pairs.a
        JOIN uni ub ON ub.tok = pairs.b
        CROSS JOIN tot
        WHERE cab >= 5
        ORDER BY pmi DESC, a, b
        LIMIT 30
    """,
    description="PMI collocation mining: pointwise mutual information "
    "ln(N*c(a,b)/(c(a)*c(b))) over adjacent token pairs, min support "
    "5, top-30 on the ROUNDED score. All counts are exact BIGINTs from "
    "two map-side-combined aggregations off one explode; the only "
    "float op is the final single-expression log — hash-stable under "
    "any partitioning. The unigram table joins back by token "
    "(broadcast while the vocab is small, shuffle when it is not)",
    tags=("llm", "text"),
)
def llm_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    docs = t["documents"]
    uni = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    tot = uni.agg(F.sum("c").alias("n"))
    n_pairs = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = (
        docs.select(
            F.explode(
                F.zip_with(
                    F.slice(toks, 1, n_pairs),
                    F.slice(toks, 2, n_pairs),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p")
        )
        .groupBy("p.a", "p.b")
        .agg(F.count("*").alias("cab"))
        .filter(F.col("cab") >= 5)
    )
    ua = uni.select(F.col("tok").alias("a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("tok").alias("b"), F.col("c").alias("cb"))
    return (
        pairs.join(ua, "a")
        .join(ub, "b")
        .join(F.broadcast(tot))
        .select(
            "a",
            "b",
            F.col("cab").alias("pair_count"),
            F.round(
                F.log(
                    F.col("n").cast("double")
                    * F.col("cab")
                    / (F.col("ca").cast("double") * F.col("cb"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "a", "b")
        .limit(30)
    )


@query(
    "llm_bpe_learn_merges",
    oracle=_bpe_oracle(_BPE_MERGES),
    description="full BPE vocabulary induction loop (Sennrich 2016): "
    "corpus collapses to a word-frequency table once, then each round "
    "counts adjacent symbol pairs (slice+zip_with, map-side combine), "
    "takes a deterministic global argmax, and applies the merge with "
    "one literal replace; lineage is cut per round. The argmax is the "
    "only driver action (1 row/round) — at 100 TB the rounds iterate "
    "over the distinct-word table, not the corpus",
    tags=("llm", "tokenizer", "iterative"),
)
def llm_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amadou_spark.llm.text import bpe_learn_merges

    t = register_tables(spark, sf_dir)
    return bpe_learn_merges(t["documents"], num_merges=_BPE_MERGES)


@query(
    "llm_bpe_encode",
    oracle=_bpe_oracle(_BPE_MERGES, final="encode"),
    description="BPE tokenizer APPLICATION (the other half of Sennrich "
    "2016): the corpus's distinct words encoded with the merge table "
    "the induction loop just learned — one row per word with its "
    "symbol sequence and token count. This is the table production "
    "tokenizers materialize: corpus re-tokenization becomes a join of "
    "the token stream against it, so encode cost is O(distinct "
    "words), never O(corpus tokens). Merge application reuses the "
    "learn loop's replace semantics rule-by-rule in rank order, so "
    "learn-then-encode round-trips bit-identically (concatenating a "
    "word's symbols reconstructs the word — pinned by pytest)",
    tags=("llm", "tokenizer", "iterative"),
)
def llm_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amadou_spark.llm.text import bpe_encode

    t = register_tables(spark, sf_dir)
    return bpe_encode(t["documents"], num_merges=_BPE_MERGES).orderBy("word")


@query(
    "q72_group_by_all",
    oracle="""
        SELECT o_orderpriority,
               CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
               count(*) AS n_orders,
               ROUND(sum(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY ALL
        ORDER BY o_orderpriority, order_year
    """,
    description="GROUP BY ALL (Spark 4 + DuckDB dialect sugar): every "
    "non-aggregate select item becomes a grouping key — same physical "
    "plan as the explicit list (partial agg + one shuffle)",
    tags=("sql", "aggregate"),
)
def q72_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(year(o_orderdate) AS INT) AS order_year,
               count(*) AS n_orders,
               ROUND(sum(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY ALL
        ORDER BY o_orderpriority, order_year
        """
    )


@query(
    "q73_snapshot_diff",
    oracle="""
        WITH old AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % 7 != 0
        ), new AS (
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % 3 = 0
                        THEN ROUND(o_totalprice * 1.1, 2)
                        ELSE o_totalprice END AS o_totalprice
            FROM orders WHERE o_orderkey % 5 != 0
        ), classified AS (
            SELECT CASE
                     WHEN o.o_orderkey IS NULL THEN 'added'
                     WHEN n.o_orderkey IS NULL THEN 'removed'
                     WHEN o.o_orderstatus != n.o_orderstatus
                          OR o.o_totalprice != n.o_totalprice THEN 'changed'
                     ELSE 'unchanged'
                   END AS status,
                   COALESCE(o.o_orderkey, n.o_orderkey) AS key
            FROM old o FULL OUTER JOIN new n USING (o_orderkey)
        )
        SELECT status, count(*) AS n_keys,
               min(key) AS min_key, max(key) AS max_key
        FROM classified GROUP BY status
        ORDER BY status
    """,
    description="snapshot reconciliation (CDC audit): two keyed snapshots "
    "full-outer-joined on the key, each row classified "
    "added/removed/changed/unchanged by column compare, aggregated to one "
    "row per class. At 100 TB both snapshots arrive bucketed on the key "
    "(scale.write_bucketed) so the join is co-located with no shuffle; "
    "the 'changed' compare extends to a sha2 over all non-key columns",
    tags=("sql", "cdc", "reconciliation"),
)
def q73_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    orders = t["orders"]
    old = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.round(F.col("o_totalprice") * 1.1, 2)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full")
    status = (
        F.when(F.col("o.o_orderkey").isNull(), "added")
        .when(F.col("n.o_orderkey").isNull(), "removed")
        .when(
            (F.col("o.o_orderstatus") != F.col("n.o_orderstatus"))
            | (F.col("o.o_totalprice") != F.col("n.o_totalprice")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        joined.select(
            status.alias("status"),
            F.coalesce(F.col("o.o_orderkey"), F.col("n.o_orderkey")).alias("key"),
        )
        .groupBy("status")
        .agg(
            F.count("*").alias("n_keys"),
            F.min("key").alias("min_key"),
            F.max("key").alias("max_key"),
        )
        .orderBy("status")
    )


@query(
    "llm_sample_weighted",
    oracle=f"""
        SELECT doc_id, lang, n_chars
        FROM (
            SELECT doc_id, lang, n_chars,
                   ROW_NUMBER() OVER (
                       ORDER BY POW({_DUCK_U} + 0.0000005, 1.0 / n_chars) DESC,
                                doc_id
                   ) AS rn
            FROM documents
        )
        WHERE rn <= 100
        ORDER BY doc_id
    """,
    description="weighted sampling without replacement (Efraimidis-"
    "Spirakis A-Res): each doc draws key u^(1/w) from a portable-hash "
    "uniform u and weight w = n_chars; the global top-100 keys ARE a "
    "w-weighted sample. One pass, no rejection loop, reshard-stable, "
    "and the top-k is a TakeOrdered (per-partition heaps, no global "
    "sort) — the scale-correct way to draw a weighted subset of 100 TB",
    tags=("llm", "sampling"),
)
def llm_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    # + 0.0000005 keeps u strictly positive (u=0 would collapse the key
    # for every weight); identical constant on both engines.
    key = F.pow(_spark_u() + F.lit(0.0000005), F.lit(1.0) / F.col("n_chars"))
    from pyspark.sql import Window as W

    ranked = t["documents"].select(
        "doc_id",
        "lang",
        "n_chars",
        F.row_number()
        .over(W.orderBy(key.desc(), "doc_id"))
        .alias("rn"),
    )
    return ranked.filter(F.col("rn") <= 100).select(
        "doc_id", "lang", "n_chars"
    ).orderBy("doc_id")


@query(
    "llm_quality_c4_gates",
    oracle="""
        WITH scored AS (
            SELECT doc_id, lang,
                   len(string_split(text, ' ')) AS n_tokens,
                   n_chars,
                   length(text) - length(replace(text, 'the ', ''))
                       AS the_bytes
            FROM documents
        )
        SELECT doc_id, lang,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               (n_tokens >= 20) AS gate_min_tokens,
               (n_chars >= 100 AND n_chars <= 50000) AS gate_chars,
               (n_chars * 1.0 / n_tokens >= 3.0) AS gate_avg_word_len,
               (the_bytes / 4 >= 1) AS gate_stopword,
               (n_tokens >= 20 AND n_chars >= 100 AND n_chars <= 50000
                AND n_chars * 1.0 / n_tokens >= 3.0 AND the_bytes / 4 >= 1)
                   AS keep
        FROM scored
        ORDER BY doc_id
    """,
    description="C4-style quality gates: minimum token count, char-"
    "length band, mean word length, and a stopword-presence check, "
    "composed into a keep flag — one scan, zero shuffles, every gate a "
    "JVM string expression; the production pre-filter that runs BEFORE "
    "any expensive dedup/scoring pass so downstream operators see only "
    "plausible documents",
    tags=("llm", "quality"),
)
def llm_quality_c4_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    n_tokens = F.size(F.split(F.col("text"), " "))
    the_count = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("the "), F.lit(""))))
        / 4
    ).cast("bigint")
    gate_min_tokens = n_tokens >= 20
    gate_chars = (F.col("n_chars") >= 100) & (F.col("n_chars") <= 50000)
    gate_awl = (F.col("n_chars") / n_tokens) >= 3.0
    gate_stop = the_count >= 1
    return (
        t["documents"]
        .select(
            "doc_id",
            "lang",
            n_tokens.cast("bigint").alias("n_tokens"),
            gate_min_tokens.alias("gate_min_tokens"),
            gate_chars.alias("gate_chars"),
            gate_awl.alias("gate_avg_word_len"),
            gate_stop.alias("gate_stopword"),
            (gate_min_tokens & gate_chars & gate_awl & gate_stop).alias("keep"),
        )
        .orderBy("doc_id")
    )


@query(
    "llm_vocab_oov",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ), counts AS (
            SELECT tok, count(*) AS c FROM toks GROUP BY tok
        ), vocab AS (
            SELECT tok FROM counts
            QUALIFY row_number() OVER (ORDER BY c DESC, tok) <= 1000
        ), per AS (
            SELECT t.doc_id,
                   count(*) AS n_tokens,
                   SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
            FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
            GROUP BY t.doc_id
        )
        SELECT doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_oov AS BIGINT) AS n_oov,
               ROUND(CAST(n_oov AS DOUBLE) / n_tokens, 6) AS oov_rate
        FROM per ORDER BY doc_id
    """,
    description="vocabulary coverage / OOV-rate scoring (the tokenizer-"
    "fit diagnostic run before committing a vocab): corpus top-1000 "
    "tokens by frequency (deterministic (count DESC, token) cutoff — "
    "TakeOrderedAndProject, never a global sort of the corpus), then "
    "per-doc out-of-vocabulary fraction via ONE left join against the "
    "structurally-bounded 1000-row broadcast vocab. At 100 TB the token "
    "explode partial-aggregates map-side and only (token, count) pairs "
    "and (doc_id, counters) ever shuffle",
    tags=("llm", "text"),
)
def llm_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    toks = t["documents"].select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(1000)
        .select("tok", F.lit(1).alias("_in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("n_oov").cast("bigint").alias("n_oov"),
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
        .orderBy("doc_id")
    )


@query(
    "llm_mixture_weights",
    oracle="""
        WITH per AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
            FROM documents GROUP BY source
        ), tot AS (
            SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS k
            FROM per
        )
        SELECT source, n_docs, n_tokens,
               ROUND(CAST(n_tokens AS DOUBLE) / total, 6) AS token_share,
               ROUND(CAST(total AS DOUBLE) / (k * n_tokens), 6)
                   AS sample_weight
        FROM per CROSS JOIN tot
        ORDER BY source
    """,
    description="domain-mixture weighting (the static DoReMi-style "
    "re-balancing step): per-source document/token counts from one "
    "map-side-combined scan, then the per-source sampling weight that "
    "equalizes token share across sources (weight = total/(k*tokens); "
    "a source's docs are repeated/downsampled by it at training time). "
    "The totals are a |sources|-row aggregate broadcast back — output "
    "is one row per source regardless of corpus size",
    tags=("llm", "curation"),
)
def llm_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    per = (
        t["documents"]
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), " ")))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )
    tot = per.agg(
        F.sum("n_tokens").cast("bigint").alias("_total"),
        F.count("*").cast("bigint").alias("_k"),
    )
    return (
        per.join(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(
                F.col("n_tokens").cast("double") / F.col("_total"), 6
            ).alias("token_share"),
            F.round(
                F.col("_total").cast("double")
                / (F.col("_k") * F.col("n_tokens")),
                6,
            ).alias("sample_weight"),
        )
        .orderBy("source")
    )


@query(
    "llm_quality_mad",
    oracle="""
        WITH lens AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ), med AS (
            SELECT CAST(quantile_cont(n_tokens, 0.5) AS DOUBLE) AS med
            FROM lens
        ), mad AS (
            SELECT CAST(quantile_cont(abs(n_tokens - med), 0.5) AS DOUBLE)
                       AS mad
            FROM lens CROSS JOIN med
        ), scored AS (
            SELECT doc_id, n_tokens,
                   ROUND((0.6745 * (n_tokens - med)) / mad, 4) AS robust_z,
                   ROUND(abs((0.6745 * (n_tokens - med)) / mad), 4) AS az
            FROM lens CROSS JOIN med CROSS JOIN mad
            WHERE mad > 0
        )
        SELECT doc_id, n_tokens, robust_z
        FROM scored
        ORDER BY az DESC, doc_id
        LIMIT 20
    """,
    description="robust (MAD-based) length-outlier detection — the "
    "quality gate that survives heavy-tailed corpora where mean/stddev "
    "z-scores are dragged by the outliers themselves: median and median-"
    "absolute-deviation via two exact interpolated-percentile "
    "aggregations (each a 1-row broadcast back onto the scan), robust "
    "z = 0.6745*(n-med)/mad, top-20 most extreme on the ROUNDED |z| so "
    "the cutoff is ulp-stable. mad=0 (constant corpus) yields an empty "
    "frame on both engines rather than a divide-by-zero",
    tags=("llm", "quality"),
)
def llm_quality_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    lens = t["documents"].select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    med = lens.agg(
        F.expr("percentile(n_tokens, 0.5)").cast("double").alias("_med")
    )
    with_med = lens.join(F.broadcast(med))
    mad = with_med.agg(
        F.expr("percentile(abs(n_tokens - _med), 0.5)")
        .cast("double")
        .alias("_mad")
    )
    z = (0.6745 * (F.col("n_tokens") - F.col("_med"))) / F.col("_mad")
    return (
        with_med.join(F.broadcast(mad))
        .filter(F.col("_mad") > 0)
        .select(
            "doc_id",
            "n_tokens",
            F.round(z, 4).alias("robust_z"),
            F.round(F.abs(z), 4).alias("_az"),
        )
        .orderBy(F.col("_az").desc(), "doc_id")
        .limit(20)
        .select("doc_id", "n_tokens", "robust_z")
    )


@query(
    "llm_ngram_novelty",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
            FROM documents
        ), g AS (
            SELECT doc_id,
                   tok || ' ' || lead(tok, 1) OVER w || ' '
                       || lead(tok, 2) OVER w AS gram
            FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
            QUALIFY lead(tok, 2) OVER w IS NOT NULL
        ), dg AS (
            SELECT DISTINCT doc_id, gram FROM g
        ), firsts AS (
            SELECT gram, min(doc_id) AS first_doc FROM dg GROUP BY gram
        )
        SELECT dg.doc_id,
               CAST(count(*) AS BIGINT) AS n_distinct_grams,
               CAST(SUM(CASE WHEN f.first_doc = dg.doc_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
               ROUND(CAST(SUM(CASE WHEN f.first_doc = dg.doc_id
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*), 6) AS novelty_rate
        FROM dg JOIN firsts f ON dg.gram = f.gram
        GROUP BY dg.doc_id ORDER BY dg.doc_id
    """,
    description="n-gram novelty scoring (the incremental-crawl "
    "freshness / near-decontamination diagnostic): a doc's distinct "
    "3-grams are 'novel' when no lower-doc_id document contains them "
    "(min-doc_id-per-gram = first occurrence under the stable corpus "
    "order). Shape at 100 TB: shingle explode -> distinct -> min-agg "
    "on the gram key, and the firsts join reuses the SAME gram "
    "partitioning Catalyst already produced for the aggregation — one "
    "logical shuffle of (gram, doc_id) pairs, per-doc counters after",
    tags=("llm", "text"),
)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n3 = F.greatest(F.size(toks) - 2, F.lit(0))
    grams = t["documents"].select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.zip_with(
                    F.slice(toks, 1, n3),
                    F.slice(toks, 2, n3),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
                F.slice(toks, 3, n3),
                lambda ab, c: F.concat_ws(" ", ab, c),
            )
        ).alias("gram"),
    )
    dg = grams.distinct()
    firsts = dg.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        dg.join(firsts, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_distinct_grams"),
            F.sum(novel).cast("bigint").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_distinct_grams",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_distinct_grams"),
                6,
            ).alias("novelty_rate"),
        )
        .orderBy("doc_id")
    )


@query(
    "llm_dsir_weights",
    oracle="""
        WITH raw_toks AS (
            SELECT doc_id, lang,
                   unnest(string_split(text, ' ')) AS tok
            FROM documents
        ), toks AS (
            SELECT doc_id, lang,
                   CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT)
                       % 256 AS b
            FROM raw_toks
        ), tgt AS (
            SELECT b, count(*) AS ct FROM toks WHERE lang = 'en' GROUP BY b
        ), raw AS (
            SELECT b, count(*) AS cr FROM toks GROUP BY b
        ), tots AS (
            SELECT (SELECT SUM(ct) FROM tgt) AS nt,
                   (SELECT SUM(cr) FROM raw) AS nr
        ), ratio AS (
            SELECT raw.b,
                   LN((COALESCE(tgt.ct, 0) + 1.0) / (tots.nt + 256))
                 - LN((raw.cr + 1.0) / (tots.nr + 256)) AS lr
            FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tots
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               ROUND(AVG(lr), 4) + 0.0 AS dsir_logweight
        FROM toks JOIN ratio ON toks.b = ratio.b
        GROUP BY doc_id ORDER BY doc_id
    """,
    description="DSIR importance weights (Xie et al. 2023, Data "
    "Selection via Importance Resampling): hashed-unigram features "
    "(portable md5 -> 256 buckets), add-1-smoothed bucket "
    "distributions for the target slice (lang='en') and the raw "
    "corpus, per-doc weight = mean log p_target/p_raw over its "
    "tokens — the importance-resampling score used to subsample raw "
    "crawl toward a target domain. The feature space is FIXED at 256 "
    "buckets, so both distribution tables partial-aggregate map-side "
    "to <=256 rows and the scoring join is a structurally-bounded "
    "broadcast; only (doc_id, bucket) pairs ever shuffle",
    tags=("llm", "curation"),
)
def llm_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    toks = (
        t["documents"]
        .select(
            "doc_id",
            "lang",
            F.explode(F.split(F.col("text"), " ")).alias("tok"),
        )
        .select(
            "doc_id",
            "lang",
            (
                F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast(
                    "bigint"
                )
                % 256
            ).alias("b"),
        )
    )
    # Target and raw bucket counts from ONE pass over the token stream
    # (a conditional aggregate, not two scans): the corpus is exploded
    # exactly twice overall — once for the distributions, once for the
    # scoring join below — the minimum without caching the explode.
    dist = toks.groupBy("b").agg(
        F.count("*").alias("cr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("ct"),
    )
    tots = dist.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    ratio = (
        dist.crossJoin(F.broadcast(tots))
        .select(
            "b",
            (
                F.log((F.col("ct") + 1.0) / (F.col("nt") + 256))
                - F.log((F.col("cr") + 1.0) / (F.col("nr") + 256))
            ).alias("lr"),
        )
    )
    return (
        toks.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            # + 0.0 normalizes a rounded -0.0 to +0.0 (IEEE: -0.0 + 0.0
            # = +0.0) on BOTH engines — the driver hash distinguishes
            # signed zeros even though == does not (caught at sf0.1)
            (F.round(F.avg("lr"), 4) + F.lit(0.0)).alias("dsir_logweight"),
        )
        .orderBy("doc_id")
    )


@query(
    "llm_semantic_dedup",
    oracle="""
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ), pos AS (
            SELECT label, generate_subscripts(v, 1) AS i, unnest(v) AS x
            FROM e
        ), cen AS (
            SELECT label, list(ax ORDER BY i) AS c
            FROM (SELECT label, i, avg(x) AS ax FROM pos GROUP BY label, i)
            GROUP BY label
        ), scored AS (
            SELECT e.vec_id, e.label,
                   ROUND(list_cosine_similarity(e.v, cen.c), 6) AS cos_r
            FROM e JOIN cen USING (label)
        ), ranked AS (
            SELECT vec_id, label, cos_r,
                   row_number() OVER (
                       PARTITION BY label, (cos_r >= 0.30)
                       ORDER BY cos_r DESC, vec_id) AS rn
            FROM scored
        )
        SELECT label, vec_id, cos_r AS cos_centroid,
               CAST(CASE WHEN cos_r < 0.30 OR rn = 1
                         THEN 1 ELSE 0 END AS INT) AS kept
        FROM ranked ORDER BY label, vec_id
    """,
    description="semantic dedup (SemDeDup, Abbas et al. 2023, centroid-"
    "screen form): per-cluster centroid = positionwise mean embedding, "
    "cosine of every member to its centroid, and the tau-ball "
    "(cos >= 0.30) around each centroid collapses to ONE canonical "
    "member (highest cosine, vec_id tiebreak; members outside the ball "
    "are all kept as diverse). Kept/dropped decided on the ROUNDED "
    "cosine so both engines agree bitwise. Scale shape: centroids are "
    "a |clusters|-row broadcast; the quadratic pairwise form is never "
    "materialized — one posexplode agg + one broadcast join, vectors "
    "cross no shuffle boundary except grouped by their own cluster",
    tags=("llm", "dedup", "embeddings"),
)
def llm_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    e = t["embeddings"].select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cen = (
        e.select("label", F.posexplode("v").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.avg("x").alias("ax"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "ax"))),
                lambda s: s.ax,
            ).alias("c")
        )
    )
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("c"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    scored = (
        e.join(F.broadcast(cen), "label")
        .select(
            "vec_id",
            "label",
            F.round(dot / (norm(F.col("v")) * norm(F.col("c"))), 6).alias(
                "cos_r"
            ),
        )
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("label", F.col("cos_r") >= 0.30).orderBy(
            F.col("cos_r").desc(), "vec_id"
        )
    )
    return (
        scored.select(
            "label",
            "vec_id",
            F.col("cos_r").alias("cos_centroid"),
            F.when((F.col("cos_r") < 0.30) | (rn == 1), 1)
            .otherwise(0)
            .cast("int")
            .alias("kept"),
        )
        .orderBy("label", "vec_id")
    )


@query(
    "llm_token_entropy",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ), tf AS (
            SELECT doc_id, tok, count(*) AS c
            FROM toks GROUP BY doc_id, tok
        ), dl AS (
            SELECT doc_id, SUM(c) AS n FROM tf GROUP BY doc_id
        )
        SELECT tf.doc_id,
               CAST(dl.n AS BIGINT) AS n_tokens,
               ROUND(-SUM((tf.c / CAST(dl.n AS DOUBLE))
                          * LN(tf.c / CAST(dl.n AS DOUBLE))) / LN(2), 4)
                   AS token_entropy
        FROM tf JOIN dl USING (doc_id)
        GROUP BY tf.doc_id, dl.n ORDER BY tf.doc_id
    """,
    description="per-document unigram Shannon entropy (bits): the "
    "within-doc token distribution's H = -sum p log2 p — low entropy "
    "flags template/boilerplate/repetition, complementing the corpus-"
    "LM logprob score (which flags out-of-distribution text). One "
    "(doc_id, tok) partial-agg then a per-doc fold; nothing but "
    "counter pairs ever shuffles",
    tags=("llm", "quality"),
)
def llm_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    from pyspark.sql import Window as W

    tf = (
        t["documents"]
        .select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    # Doc total as a window over the tf table (one shuffle on doc_id)
    # instead of an agg + self-join (which shuffles tf twice more).
    dl = tf.withColumn("n", F.sum("c").over(W.partitionBy("doc_id")))
    p = F.col("c") / F.col("n").cast("double")
    return (
        dl.groupBy("doc_id", "n")
        .agg(
            F.round(-F.sum(p * F.log(p)) / F.log(F.lit(2.0)), 4).alias(
                "token_entropy"
            )
        )
        .select(
            "doc_id",
            F.col("n").cast("bigint").alias("n_tokens"),
            "token_entropy",
        )
        .orderBy("doc_id")
    )


@query(
    "llm_quality_gopher",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ), per AS (
            SELECT doc_id,
                   count(*) AS n,
                   AVG(CAST(len(tok) AS DOUBLE)) AS mwl,
                   SUM(CASE WHEN tok IN ('a', 'the', 'to', 'of', 'and',
                                         'in', 'is', 'it')
                            THEN 1 ELSE 0 END) AS stop_hits,
                   SUM(CASE WHEN len(tok) <= 2 THEN 1 ELSE 0 END)
                       AS short_words,
                   SUM(CASE WHEN regexp_matches(tok, '^[a-zA-Z]+$')
                            THEN 1 ELSE 0 END) AS alpha_words
            FROM toks GROUP BY doc_id
        )
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_tokens,
               ROUND(mwl, 4) AS mean_word_len,
               ROUND(CAST(stop_hits AS DOUBLE) / n, 6) AS stopword_frac,
               ROUND(CAST(short_words AS DOUBLE) / n, 6) AS short_word_frac,
               ROUND(CAST(alpha_words AS DOUBLE) / n, 6) AS alpha_word_frac,
               CAST(CASE WHEN n BETWEEN 50 AND 100000
                              AND mwl BETWEEN 3 AND 10
                              AND stop_hits >= 2
                         THEN 1 ELSE 0 END AS INT) AS gopher_pass
        FROM per ORDER BY doc_id
    """,
    description="Gopher quality rules (Rae et al. 2021, Appendix A): "
    "per-doc mean word length, stop-word fraction (their 'contains >=2 "
    "of 8 common English words' rule), short-word and alphabetic-word "
    "fractions, and the combined pass flag (50<=tokens<=100k, "
    "3<=mean word len<=10, >=2 stop-word hits). One explode + one "
    "map-side-combined aggregation per document — every rule rides "
    "the same scan; at 100 TB only per-doc counters shuffle",
    tags=("llm", "quality"),
)
def llm_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    stop = ("a", "the", "to", "of", "and", "in", "is", "it")
    toks = t["documents"].select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    per = toks.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        F.avg(F.length("tok").cast("double")).alias("mwl"),
        F.sum(F.when(F.col("tok").isin(*stop), 1).otherwise(0)).alias(
            "stop_hits"
        ),
        F.sum(F.when(F.length("tok") <= 2, 1).otherwise(0)).alias(
            "short_words"
        ),
        F.sum(
            F.when(F.col("tok").rlike("^[a-zA-Z]+$"), 1).otherwise(0)
        ).alias("alpha_words"),
    )
    return per.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.round("mwl", 4).alias("mean_word_len"),
        F.round(F.col("stop_hits").cast("double") / F.col("n"), 6).alias(
            "stopword_frac"
        ),
        F.round(F.col("short_words").cast("double") / F.col("n"), 6).alias(
            "short_word_frac"
        ),
        F.round(F.col("alpha_words").cast("double") / F.col("n"), 6).alias(
            "alpha_word_frac"
        ),
        F.when(
            F.col("n").between(50, 100000)
            & F.col("mwl").between(3, 10)
            & (F.col("stop_hits") >= 2),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("gopher_pass"),
    ).orderBy("doc_id")


@query(
    "llm_curriculum_order",
    oracle="""
        WITH lens AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ), bucketed AS (
            SELECT doc_id, source, n_tokens,
                   ntile(10) OVER (ORDER BY n_tokens, doc_id) AS difficulty
            FROM lens
        )
        SELECT CAST(row_number() OVER (
                   ORDER BY difficulty,
                            CAST(('0x' || substring(md5(CAST(doc_id AS
                                VARCHAR)), 1, 8)) AS BIGINT) % 997,
                            doc_id) AS BIGINT) AS position,
               doc_id, difficulty, n_tokens
        FROM bucketed ORDER BY position
    """,
    description="curriculum ordering: docs are bucketed into 10 "
    "difficulty deciles (token count as the cheap difficulty proxy, "
    "deterministic tie-break) and emitted easy-to-hard, SHUFFLED "
    "within each decile by a portable content hash — the standard "
    "length-curriculum with reshard-stable intra-bucket order (no "
    "seeded RNG whose membership drifts with partitioning). The "
    "oracle uses global ntile/row_number windows; the Spark side "
    "computes the SAME ordering scale-safely (r5 VERDICT: the "
    "previous unpartitioned windows executed as Exchange "
    "SinglePartition over every document — the prose claimed a range "
    "sort the plan did not have). Both global ranks now ride BOUNDED "
    "value domains, the q124 shape: the decile rank = prefix sum "
    "over the token-LENGTH histogram (lengths are bounded by max doc "
    "size) + a per-length row_number; the position rank = prefix sum "
    "over the (decile, hash%997) group counts (<=9970 groups) + a "
    "per-group row_number. Every per-row window is key-partitioned; "
    "the only unpartitioned windows scan the bounded histogram/group "
    "tables, which also broadcast back",
    tags=("llm", "curation"),
)
def llm_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from amadou_spark.scale import materialize_shared, ntile_from_rank

    t = register_tables(spark, sf_dir)
    lens = materialize_shared(
        t["documents"].select(
            "doc_id",
            F.size(F.split(F.col("text"), " "))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )
    # decile rank = (#docs with shorter length) + rank among same-length
    # docs by doc_id — identical to row_number() over (n_tokens, doc_id)
    hist = lens.groupBy("n_tokens").agg(F.count("*").alias("hc"))
    w_hist = W.orderBy("n_tokens").rowsBetween(W.unboundedPreceding, -1)
    hist_cum = hist.select(
        "n_tokens",
        F.coalesce(F.sum("hc").over(w_hist), F.lit(0)).alias("len_before"),
    )
    total = lens.agg(F.count("*").cast("bigint").alias("n_total"))
    w_len = W.partitionBy("n_tokens").orderBy("doc_id")
    h = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % 997
    )
    bucketed = materialize_shared(
        lens.join(F.broadcast(hist_cum), "n_tokens")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "rk",
            (F.col("len_before") + F.row_number().over(w_len)).cast(
                "bigint"
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            ntile_from_rank("rk", "n_total", 10).alias("difficulty"),
            h.alias("h"),
        )
    )
    grp = bucketed.groupBy("difficulty", "h").agg(F.count("*").alias("gc"))
    w_grp = W.orderBy("difficulty", "h").rowsBetween(
        W.unboundedPreceding, -1
    )
    grp_cum = grp.select(
        "difficulty",
        "h",
        F.coalesce(F.sum("gc").over(w_grp), F.lit(0)).alias("grp_before"),
    )
    w_in_grp = W.partitionBy("difficulty", "h").orderBy("doc_id")
    return (
        bucketed.join(F.broadcast(grp_cum), ["difficulty", "h"])
        .select(
            (F.col("grp_before") + F.row_number().over(w_in_grp))
            .cast("bigint")
            .alias("position"),
            "doc_id",
            "difficulty",
            "n_tokens",
        )
        .orderBy("position")
    )


@query(
    "llm_kmeans",
    oracle="""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), c0 AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                       AS cid, v AS c
            FROM e ORDER BY vec_id LIMIT 8
        ), d1 AS (
            SELECT e.vec_id, e.v, c0.cid,
                   ROUND(list_distance(e.v, c0.c), 6) AS rd
            FROM e CROSS JOIN c0
        ), a1 AS (
            SELECT vec_id, v, cid FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY rd, cid) AS rn
                FROM d1) WHERE rn = 1
        ), c1 AS (
            SELECT cid, list(ax ORDER BY i) AS c FROM (
                SELECT cid, i, ROUND(AVG(x), 6) AS ax FROM (
                    SELECT cid, generate_subscripts(v, 1) AS i,
                           unnest(v) AS x FROM a1)
                GROUP BY cid, i) GROUP BY cid
        ), d2 AS (
            SELECT e.vec_id, e.v, c1.cid,
                   ROUND(list_distance(e.v, c1.c), 6) AS rd
            FROM e CROSS JOIN c1
        ), a2 AS (
            SELECT vec_id, v, cid FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY rd, cid) AS rn
                FROM d2) WHERE rn = 1
        ), c2 AS (
            SELECT cid, list(ax ORDER BY i) AS c FROM (
                SELECT cid, i, ROUND(AVG(x), 6) AS ax FROM (
                    SELECT cid, generate_subscripts(v, 1) AS i,
                           unnest(v) AS x FROM a2)
                GROUP BY cid, i) GROUP BY cid
        ), d3 AS (
            SELECT e.vec_id, c2.cid,
                   ROUND(list_distance(e.v, c2.c), 6) AS rd
            FROM e CROSS JOIN c2
        )
        SELECT vec_id, cid AS cluster, rd AS dist FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY rd, cid) AS rn
            FROM d3) WHERE rn = 1
        ORDER BY vec_id
    """,
    description="distributed Lloyd's k-means (k=8, 2 fixed centroid "
    "updates) over the embeddings table — the clustering step SemDeDup/"
    "IVF-style pipelines run before per-cluster dedup or index build. "
    "Spark-MLlib execution shape: centroids live on the driver and ride "
    "into each assignment pass as literals, so assignment is a pure "
    "per-row codegen expression (array_min over k rounded-distance "
    "structs — no join, no shuffle, no UDF); the only shuffle per round "
    "carries (cluster, dim, partial-mean) scalar triples, independent "
    "of corpus size. Determinism: init = k lowest vec_ids, centroids "
    "and distances rounded to 6 decimals, ties break to the lowest "
    "cluster id — the DuckDB oracle unrolls the identical rounds and "
    "hash-matches bitwise",
    tags=("llm", "embeddings", "clustering"),
)
def llm_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amadou_spark.operators.clustering import kmeans

    t = register_tables(spark, sf_dir)
    e = t["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return kmeans(e, "vec_id", "v", k=8, rounds=2).orderBy("vec_id")


@query(
    "llm_random_projection",
    oracle="""
        WITH g AS (
            SELECT CAST(i.range AS INT) AS i, CAST(j.range AS INT) AS j,
                   CASE WHEN ascii(substr(
                            md5(i.range || ':' || j.range), 1, 1)) % 2 = 0
                        THEN 1.0 ELSE -1.0 END AS s
            FROM range(16) i, range(64) j
        ), pos AS (
            SELECT vec_id,
                   generate_subscripts(CAST(embedding AS DOUBLE[]), 1) - 1
                       AS j,
                   unnest(CAST(embedding AS DOUBLE[])) AS x
            FROM embeddings
        )
        SELECT pos.vec_id, g.i AS dim,
               ROUND(SUM(g.s * pos.x) / 8.0, 6) AS p
        FROM pos JOIN g USING (j)
        GROUP BY pos.vec_id, g.i
        ORDER BY vec_id, dim
    """,
    description="Johnson-Lindenstrauss random projection 64 -> 16 dims "
    "(Achlioptas 2003 +-1 sign matrix) — the cheap dimensionality cut a "
    "pipeline applies before LSH/ANN when raw embeddings are wide. The "
    "matrix is DERIVED, not stored: entry (i,j) = parity of the first "
    "hex char of md5('i:j'), so the DuckDB oracle reconstructs it "
    "bit-identically in SQL while Spark embeds it as literals. The "
    "projection is one per-row array expression (16 zip_with folds) — "
    "zero shuffle, zero Python, whole-stage codegen; output exploded to "
    "(vec_id, dim, p) scalars for the hash gate",
    tags=("llm", "embeddings", "similarity"),
)
def llm_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amadou_spark.operators.clustering import random_projection

    t = register_tables(spark, sf_dir)
    e = t["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return (
        e.select(
            "vec_id",
            F.posexplode(
                random_projection("v", out_dim=16, in_dim=64)
            ).alias("dim", "p"),
        )
        .orderBy("vec_id", "dim")
    )


@query(
    "llm_tokenizer_fertility",
    oracle=_bpe_oracle(_BPE_MERGES, final="fertility"),
    description="tokenizer fertility audit: tokens-per-word and "
    "chars-per-token per language under the learned BPE merge table — "
    "the diagnostic that decides whether a tokenizer under-serves a "
    "language (high fertility = more sequence length spent per word, "
    "worse effective context). Corpus words join the O(distinct words) "
    "encode table (unhinted — open-web vocab outgrows any broadcast) "
    "and roll up per language; the BPE rounds themselves never touch "
    "the corpus. Oracle unrolls the same merge rounds and aggregation",
    tags=("llm", "tokenizer", "text"),
)
def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amadou_spark.llm.text import bpe_encode

    t = register_tables(spark, sf_dir)
    enc = bpe_encode(t["documents"], num_merges=_BPE_MERGES).select(
        "word",
        "n_tokens",
        F.length("word").cast("bigint").alias("n_chars"),
    )
    corpus = (
        t["documents"]
        .select(
            "lang", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .filter(F.col("word") != "")
    )
    return (
        corpus.join(enc, "word")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum("n_tokens") / F.count("*").cast("double"), 4
            ).alias("fertility"),
            F.round(
                F.sum("n_chars") / F.sum("n_tokens").cast("double"), 4
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )
