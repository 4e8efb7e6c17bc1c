"""Empirical scale probe beyond sf0.1 (VERDICT r4 #3).

The 100 TB arguments for the iterative/quadratic-shaped operators are
design-verified (plan audits, complexity notes); this tool adds one
measured decade: it synthesizes an sf1-equivalent slice (10x sf0.1) for
the tables those operators read, times each operator at sf0.1 and sf1
(min-of-N), and records per-op wall-time ratios + scaling exponents in
``BENCH_SCALE.json``.

Construction of the sf1 slice (deterministic, replication-based — the
driver's generator is not available, and for a SCALING measurement what
matters is that per-replica data properties match sf0.1 exactly):

- ``lineitem``: 10 key-shifted replicas. The order-key offset is a
  multiple of 5 so the graph queries' ``l_orderkey % 5 = 0`` sample
  selects the same orders in every replica — the co-order graph becomes
  10 exact disjoint copies of the sf0.1 graph (same degree
  distribution, 10x nodes/edges/wedges).
- ``documents``: 10 id-shifted replicas; replicas > 0 get every token
  prefixed with a replica tag, so no shingle/window/line collides
  across replicas — posting-list and duplicate-cluster size
  distributions match sf0.1 while corpus volume is 10x. (Verbatim
  replication would instead create 10-way duplicate clusters
  everywhere — a 100x-harder, distribution-breaking workload.)
- ``events``: 10 user- and event-id-shifted replicas with timestamps
  UNCHANGED — 10x users over the same observation window, so daily
  rollups get 10x rows per day, per-user histories keep their sf0.1
  shape, and duration/day value domains stay bounded (exactly how a
  bigger install scales). Added in r6: the r5 probe symlinked events,
  so the six events-only ops measured exponent ~0 vacuously.
- ``customer`` / ``orders``: key-shifted replicas (custkey offsets
  aligned across the two tables) — same value domains, 10x rows.
- every other table: symlink to the sf0.1 file (register_tables loads
  all of them; the probed ops don't read them).

Expected scaling at 10x disjoint data (see EXPECTED below): ~linear
for everything except BFS, whose frontier explores one replica but
whose per-round edge join still scans the full 10x edge list — also
<= linear. An op is flagged when its measured exponent exceeds its
documented bound + noise margin.

Usage: python tools/scale_probe.py [--runs N] [--replicas K]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
PROBE_DIR = os.path.join(REPO, "scale_probe_data", "sf1")

#: op -> (documented complexity in data size n, exponent gate).
#: Gates are the documented growth bound plus headroom for fixed
#: overhead amortization and VM noise (MEMORY: timings drift 2-3x —
#: hence min-of-N and a generous margin; sub-linear measurements are
#: common because sf0.1 runs are overhead-dominated).
EXPECTED = {
    "q96_triangle_count": ("O(m^1.5) worst, linear on disjoint replicas", 1.3),
    "q97_bfs_levels": ("O(rounds * |E|) edge scans, frontier in 1 replica", 1.3),
    "q98_kcore": ("O(rounds * |E|), rounds fixed by peel depth", 1.3),
    "q99_link_prediction": ("O(sum d^2) wedges, 10x disjoint -> linear", 1.3),
    "llm_dedup_exact": ("one hash shuffle, linear", 1.3),
    "llm_dedup_minhash": ("banded LSH, linear in docs at fixed dup rate", 1.3),
    "llm_dedup_ngram_jaccard": ("inverted index, linear at fixed posting sizes", 1.3),
    "llm_dedup_clusters": ("pairs + CC, linear at fixed cluster sizes", 1.3),
    "llm_dedup_substrings": ("O(tokens) windows + hash agg, linear", 1.3),
    "llm_bpe_learn_merges": ("rounds fixed, per-round O(distinct words)", 1.3),
    "llm_bpe_encode": ("rounds over distinct words + final projection, linear bound", 1.3),
    "llm_dsir_weights": ("fixed 256-bucket features, two corpus passes, linear", 1.3),
    "llm_vocab_oov": ("token count + bounded broadcast join, linear", 1.3),
    "llm_ngram_novelty": ("gram explode -> distinct -> min-agg, linear at fixed dup structure", 1.3),
    "llm_semantic_dedup": ("centroid agg + bounded broadcast, linear in vectors", 1.3),
    "llm_kmeans": ("rounds fixed; per-round map assign + scalar-triple agg, linear", 1.3),
    "llm_random_projection": ("per-row expression, zero shuffle, linear", 1.3),
    "q70_pagerank": ("O(rounds * |E|) contribution joins, rounds fixed", 1.3),
    "llm_dedup_keep_best": ("cluster pipeline + window over clustered subset", 1.3),
    "llm_split_leakage_safe": ("cluster pipeline + one left join", 1.3),
    "llm_text_bm25": ("one explode feeds tf/dl/df, bounded stats broadcast", 1.3),
    "llm_token_pmi": ("pair explode + exact counts, linear at fixed vocab", 1.3),
    "llm_token_entropy": ("(doc,tok) partial agg + per-doc fold, linear", 1.3),
    "q102_sssp": ("O(rounds * frontier edges), rounds fixed", 1.3),
    "q110_bloom_pruned_join": ("bloom build linear in dim, probe linear in fact", 1.3),
    "q113_zipf_fit": ("token count linear; top-500 + regression constant", 1.3),
    "q114_lexical_diversity": ("two stacked hash aggs, linear", 1.3),
    "q115_heavy_hitters": ("MG pass + candidate recount, two linear passes", 1.3),
    "q120_association_rules": ("pair fan-out O(orders * basket^2), linear at fixed basket size", 1.3),
    "q124_ks_test": ("collapse to distinct-value counts, window rides value domain", 1.3),
    "q127_attribution": ("one user-partitioned window + rollup, linear", 1.3),
    "llm_quality_bigram_logprob": ("explode + exact count aggs + shuffle-join scoring, linear at fixed vocab", 1.3),
    "q128_twap": ("one lead window + one agg on (type,day) partitions, linear", 1.3),
    "q131_kaplan_meier": ("per-user agg then duration-domain grid, linear", 1.3),
    "q134_path_trigrams": ("one user window + counted trigrams, linear", 1.3),
    "llm_quality_ppl_buckets": ("bigram pipeline + per-lang ntile, linear at fixed vocab", 1.3),
    "llm_chunk_cdc": ("doc-local windows + two hash aggs, linear", 1.3),
    "llm_dedup_normalized": ("one scan + 32-byte hash shuffle, linear", 1.3),
    "q144_stickiness": ("bounded 28x fan-out on collapsed (user,day) grain, linear", 1.3),
    "llm_quality_ensemble": ("one explode + per-doc agg + rollup, linear", 1.3),
    # r6: the rank-window rewrites — measured evidence that the
    # SinglePartition fixes scale the way their plans claim
    "q105_gini": ("value-domain collapse + per-priority prefix sums, linear", 1.3),
    "q118_rfm_segments": ("value-domain ntile lookups, boundary-run windows only (r7)", 1.3),
    "q122_exact_quantiles": ("value-domain collapse + rank selection, linear", 1.3),
    "llm_curriculum_order": ("length histogram + bounded group offsets, linear", 1.3),
    # r6 new operators with quadratic/iterative shapes worth measuring
    "q145_mann_whitney": ("value-domain collapse, rank closed forms, linear", 1.3),
    "q146_theil_sen": ("pair join on bounded calendar rollup, linear in raw rows", 1.3),
    "q149_mann_kendall": ("pair join on bounded calendar rollup, linear in raw rows", 1.3),
    "q150_label_propagation": ("fixed rounds x O(E) joins, linear", 1.3),
    "q151_hazard_rate": ("per-user agg then duration-grid, linear", 1.3),
    "llm_quality_linear_classifier": ("explode + codegen lookup + per-doc agg, linear", 1.3),
    # r6 second batch: the quadratic/wedge-shaped newcomers
    "q152_kruskal_wallis": ("value-domain collapse, midrank closed forms, linear", 1.3),
    "q153_kendall_tau": ("pair join on bounded calendar rollup, linear in raw rows", 1.3),
    "q156_local_clustering": ("O(m^1.5) wedges worst, linear on disjoint replicas", 1.3),
    "llm_dedup_overlap": ("inverted index, linear at fixed posting sizes", 1.3),
    "llm_dedup_cross_source": ("32-byte hash equi-join, linear at fixed dup-group sizes", 1.3),
    "q159_hits": ("O(rounds * |E|) score joins, rounds fixed", 1.3),
    # r7: the q118 de-sort rewrite + the two new registrations
    "q160_price_decile_bands": ("bounded $1000 grid lookup + boundary-run windows, linear", 1.3),
    "llm_corpus_length_gini": ("value-domain collapse + per-lang prefix sums, linear", 1.3),
    # r7 second batch: stats/feature ops on bounded post-agg domains
    "q161_mutual_information": ("one contingency agg, |nations|x|segments| downstream", 1.3),
    "q162_logrank_test": ("per-user agg then (arm x duration)-grid windows, linear", 1.3),
    "q163_quantile_normalize": ("per-row fixed-point then calendar-grain ranks, linear", 1.3),
    "q164_markov_stationary": ("one lag shuffle + |types|^2 matrix iterations, linear", 1.3),
    "q165_survival_rmst": ("per-user agg then duration-grid area terms, linear", 1.3),
    "llm_quality_calibration": ("one explode + per-doc agg then 10-bin collapse, linear", 1.3),
    "llm_hard_negatives": ("20 anchors broadcast vs one corpus scan, linear in corpus", 1.3),
    # r8 additions
    "q166_theil_sen": ("one fact agg to the month grain; pairs/median on the bounded grid", 1.3),
    "q167_dow_effect": ("one fact agg to the day grain; ANOVA on <=7 group rows", 1.3),
    "llm_dedup_cluster_stats": ("jaccard pairs + CC + bounded histogram, linear like llm_dedup_clusters", 1.3),
    "b07_tws_running_totals": ("one stateful shuffle by user key, state linear in users", 1.3),
    # r9 additions
    "q168_range_join_bucketed": (
        # 10x denser events => ~10x pairs per event => ~100x pair rows,
        # but pair GENERATION is equi-join work linear in (events x
        # per-bucket density); density is 10x at the slice, so the gate
        # allows the superlinear pair-count growth explicitly
        "bucketized theta join: pair volume grows with rate^2 at fixed window (10x slice => ~100x pairs)",
        2.2,
    ),
    "q169_bitmap_distinct_rollup": (
        "one fact agg to the (type, day, bucket) bitmap grain; weekly OR-merge on the bounded table",
        1.3,
    ),
    "b09_stream_stream_left_outer": (
        "same O(horizon) join state as the inner variant; outer emit-on-evict adds no state",
        1.3,
    ),
    "b09_stream_stream_full_outer": (
        "same O(horizon) join state; two-sided outer emission is evict-time behavior",
        1.3,
    ),
    "b09_chained_join_window": (
        "join state O(horizon) + window state O(open windows); both watermark-bounded",
        1.3,
    ),
    # r10 (VERDICT r9 #2): the ANN/similarity family's first >1x
    # measured evidence — the v3 slice replicated embeddings 10x
    # (10x vectors AND 10x clusters), these entries put the family
    # under the exponent gate alongside its bench/oracle restamps
    "llm_similarity_topk": (
        "bounded anchor set broadcast vs one corpus scan, pandas-batched dots, linear in vectors",
        1.3,
    ),
    "llm_similarity_lsh_recall": (
        "banded hyperplane LSH bucket self-join; candidates bounded by bucket load at fixed cluster structure",
        1.3,
    ),
    "llm_similarity_ivf_recall": (
        "IVF: nprobe nearest centroids per query bound the probed fraction, linear in vectors",
        1.3,
    ),
    "llm_similarity_pq_recall": (
        "PQ ADC scan against broadcast codebooks, linear in code rows",
        1.3,
    ),
    "llm_embedding_quantize": (
        "per-row quantization expressions + bounded codebook agg, zero fact-grain shuffle",
        1.3,
    ),
    # r10: part is replicated from layout v4 on — the part-heavy TPC-H
    # shapes get real 10x dimension evidence
    "q49_tpch_q2": (
        "min-cost-supplier argmax per part: dim joins broadcast/equi, linear in part x lineitem",
        1.3,
    ),
    "q53_tpch_q17": (
        "per-part avg-qty agg joined back at part grain, linear",
        1.3,
    ),
    "q170_histogram_quantile_rollup": (
        "one fact agg to the (type, day, value-bucket) grain; quantile recovery + weekly merge on the bounded table",
        1.3,
    ),
    "q12_theta_join": (
        # same treatment as q168: the declared work is superlinear —
        # within-brand pair volume grows with (parts per brand)^2, so
        # 10x part => ~100x pairs through the residual + partial agg
        "brand-bounded theta self-join: pair volume quadratic in parts per brand (10x part => ~100x pairs)",
        2.2,
    ),
}


def build_sf1(spark, replicas: int) -> dict:
    """Synthesize the sf1 slice under PROBE_DIR; idempotent per layout
    version (a marker file records the replica count). v4 (r10,
    VERDICT r9 #2): ``part`` joins the replicated set — its
    ``p_partkey`` shift uses the SAME offset as lineitem's
    ``l_partkey`` shift, so part<->lineitem FK joins stay
    within-replica across all 10 replicas and the part-heavy TPC-H
    shapes (q49/q53/q54) finally see 10x dimension data. Incremental:
    tables already built by a prior layout are kept (the replica
    construction is deterministic), only missing tables are written."""
    marker = os.path.join(PROBE_DIR, f".built_v4_r{replicas}")
    if os.path.exists(marker):
        return json.load(open(marker))
    os.makedirs(PROBE_DIR, exist_ok=True)

    from amadou_spark.contracts import TABLE_NAMES

    replicated = (
        "lineitem",
        "documents",
        "embeddings",
        "events",
        "customer",
        "orders",
        "part",
    )
    for t in TABLE_NAMES:
        dst = os.path.join(PROBE_DIR, f"{t}.parquet")
        if t in replicated:
            # earlier layouts symlinked some of these — replace
            if os.path.islink(dst):
                os.unlink(dst)
            continue
        if not os.path.lexists(dst):
            os.symlink(os.path.join(SF01, f"{t}.parquet"), dst)

    # Reuse of previously built tables is valid ONLY when a prior
    # layout marker for the SAME replica count exists — a run with a
    # different --replicas must rebuild everything, not silently stamp
    # a new-count marker over old-count data (which would corrupt every
    # exponent downstream). A table also only counts as built when its
    # Spark _SUCCESS commit marker exists: an interrupted prior write
    # leaves a partial directory that must be overwritten, not trusted.
    import glob as _glob
    import re as _re

    reuse_ok = any(
        (m := _re.search(r"\.built_v\d+_r(\d+)$", p)) and int(m.group(1)) == replicas
        for p in _glob.glob(os.path.join(PROBE_DIR, ".built_v*_r*"))
    )

    def _built(table: str) -> bool:
        d = os.path.join(PROBE_DIR, f"{table}.parquet")
        return (
            reuse_ok
            and os.path.isdir(d)
            and os.path.exists(os.path.join(d, "_SUCCESS"))
        )

    def _rep(df, shifts: dict):
        """Key-shifted disjoint replicas: shifted cols get
        +r*offset, everything else is copied verbatim."""
        return df.crossJoin(
            spark.range(replicas).select(
                F.col("id").cast("bigint").alias("_r")
            )
        ).select(
            *[
                (F.col(c) + F.col("_r") * shifts[c]).alias(c)
                if c in shifts
                else F.col(c)
                for c in df.columns
            ]
        )

    if not _built("events"):
        ev = spark.read.parquet(os.path.join(SF01, "events.parquet"))
        mx_ev = ev.agg(F.max("event_id"), F.max("user_id")).collect()[0]
        rep_ev = _rep(
            ev, {"event_id": int(mx_ev[0]) + 1, "user_id": int(mx_ev[1]) + 1}
        )
        rep_ev.write.mode("overwrite").parquet(
            os.path.join(PROBE_DIR, "events.parquet")
        )

    if not _built("customer") or not _built("orders"):
        cu = spark.read.parquet(os.path.join(SF01, "customer.parquet"))
        off_c = int(cu.agg(F.max("c_custkey")).collect()[0][0]) + 1
    if not _built("customer"):
        _rep(cu, {"c_custkey": off_c}).write.mode("overwrite").parquet(
            os.path.join(PROBE_DIR, "customer.parquet")
        )

    if not _built("orders"):
        od = spark.read.parquet(os.path.join(SF01, "orders.parquet"))
        off_ok = int(od.agg(F.max("o_orderkey")).collect()[0][0]) + 1
        # o_custkey shift matches customer's so FK joins stay within-replica
        _rep(
            od, {"o_orderkey": off_ok, "o_custkey": off_c}
        ).write.mode("overwrite").parquet(
            os.path.join(PROBE_DIR, "orders.parquet")
        )

    if not _built("lineitem") or not _built("part"):
        li = spark.read.parquet(os.path.join(SF01, "lineitem.parquet"))
        mx = li.agg(
            F.max("l_orderkey"), F.max("l_partkey"), F.max("l_suppkey")
        ).collect()[0]
        # multiple of 5: keeps the %5 sample aligned
        off_o = (int(mx[0]) // 5 + 1) * 5
        off_p, off_s = int(mx[1]) + 1, int(mx[2]) + 1
    if not _built("lineitem"):
        shifted = {"l_orderkey": off_o, "l_partkey": off_p, "l_suppkey": off_s}
        rep = li.crossJoin(
            spark.range(replicas).select(F.col("id").cast("bigint").alias("_r"))
        ).select(
            *[
                (F.col(c) + F.col("_r") * shifted[c]).alias(c)
                if c in shifted
                else F.col(c)
                for c in li.columns
            ]
        )
        rep.write.mode("overwrite").parquet(
            os.path.join(PROBE_DIR, "lineitem.parquet")
        )

    # part (v4): p_partkey rides the SAME offset as l_partkey so every
    # replica's lineitem rows join their own replica's part rows — and
    # the offset must also clear part's own key domain or replica key
    # ranges would overlap into duplicate p_partkey values.
    if not _built("part"):
        pt = spark.read.parquet(os.path.join(SF01, "part.parquet"))
        mx_p = int(pt.agg(F.max("p_partkey")).collect()[0][0])
        if mx_p >= off_p:
            raise SystemExit(
                f"p_partkey domain (max {mx_p}) exceeds lineitem's "
                f"l_partkey shift {off_p}; aligned disjoint replicas "
                "impossible without rebuilding lineitem with a larger "
                "shared offset"
            )
        _rep(pt, {"p_partkey": off_p}).write.mode("overwrite").parquet(
            os.path.join(PROBE_DIR, "part.parquet")
        )

    if not _built("documents"):
        docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
        off_d = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1
        rep_docs = docs.crossJoin(
            spark.range(replicas).select(
                F.col("id").cast("bigint").alias("_r")
            )
        ).select(
            (F.col("doc_id") + F.col("_r") * off_d).alias("doc_id"),
            F.when(F.col("_r") == 0, F.col("text"))
            .otherwise(
                F.array_join(
                    F.expr(
                        "transform(split(text, ' '), "
                        "x -> concat('r', CAST(_r AS STRING), 'x', x))"
                    ),
                    " ",
                )
            )
            .alias("text"),
            "lang",
            "source",
            F.length(
                F.when(F.col("_r") == 0, F.col("text")).otherwise(
                    F.array_join(
                        F.expr(
                            "transform(split(text, ' '), "
                            "x -> concat('r', CAST(_r AS STRING), 'x', x))"
                        ),
                        " ",
                    )
                )
            ).cast("bigint").alias("n_chars"),
        )
        rep_docs.write.mode("overwrite").parquet(
            os.path.join(PROBE_DIR, "documents.parquet")
        )

    # embeddings: id- and label-shifted disjoint replicas — per-replica
    # cluster structure (sizes, centroids, within-cluster geometry) is
    # identical to sf0.1; 10x vectors AND 10x clusters, so centroid
    # tables and tau-balls scale the way a 10x corpus would.
    emb_dst = os.path.join(PROBE_DIR, "embeddings.parquet")
    if os.path.islink(emb_dst):
        os.unlink(emb_dst)  # layout v1 symlinked it
    if not _built("embeddings"):
        emb = spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))
        mx_e = emb.agg(F.max("vec_id"), F.max("label")).collect()[0]
        off_v, off_l = int(mx_e[0]) + 1, int(mx_e[1]) + 1
        rep_emb = emb.crossJoin(
            spark.range(replicas).select(F.col("id").alias("_r"))
        ).select(
            (F.col("vec_id") + F.col("_r") * off_v).alias("vec_id"),
            "embedding",
            (F.col("label") + F.col("_r").cast("int") * off_l).alias("label"),
        )
        rep_emb.write.mode("overwrite").parquet(emb_dst)

    def _rows(table: str) -> int:
        return spark.read.parquet(
            os.path.join(PROBE_DIR, f"{table}.parquet")
        ).count()

    info = {
        "replicas": replicas,
        "lineitem_rows": _rows("lineitem"),
        "documents_rows": _rows("documents"),
        "embeddings_rows": _rows("embeddings"),
        "events_rows": _rows("events"),
        "part_rows": _rows("part"),
    }
    # retire markers from other layouts/replica counts: the slice dir
    # now holds THIS layout's data, and a stale marker would let a
    # later run short-circuit onto mismatched tables
    for p in _glob.glob(os.path.join(PROBE_DIR, ".built_v*_r*")):
        if p != marker:
            os.unlink(p)
    with open(marker, "w") as fh:
        json.dump(info, fh)
    return info


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--ops", nargs="*", default=None)
    args = ap.parse_args()

    from amadou_spark.queries import REGISTRY, _load
    from amadou_spark.session import get_spark

    spark = get_spark("amadou-scale-probe")
    _load()
    info = build_sf1(spark, args.replicas)
    print("sf1 slice:", info, flush=True)

    ops = args.ops or list(EXPECTED)
    unknown = [o for o in ops if o not in EXPECTED]
    if unknown:  # fail before timing anything, not mid-merge
        raise SystemExit(
            f"ops without an EXPECTED complexity/gate entry: {unknown}"
        )
    # warmup (footer caches, JIT, python workers)
    REGISTRY["q01_scan_projection"].fn(spark, SF01).count()

    results: dict[str, dict] = {}
    samples: dict[tuple, list] = {}
    for r in range(args.runs):  # full rounds A,B,C,A,B,C (bench.py style)
        for name in ops:
            for label, d in (("sf0.1", SF01), ("sf1", PROBE_DIR)):
                t0 = time.perf_counter()
                REGISTRY[name].fn(spark, d).count()
                samples.setdefault((name, label), []).append(
                    round(time.perf_counter() - t0, 3)
                )
            spark.catalog.clearCache()
        print(f"round {r + 1}/{args.runs} done", flush=True)

    scale = float(args.replicas)
    flagged = []
    for name in ops:
        t_small = min(samples[(name, "sf0.1")])
        t_big = min(samples[(name, "sf1")])
        ratio = t_big / t_small
        exponent = math.log(ratio) / math.log(scale)
        note, gate = EXPECTED[name]
        ok = exponent <= gate
        if not ok:
            flagged.append(name)
        results[name] = {
            "sf0.1_sec": t_small,
            "sf1_sec": t_big,
            "ratio": round(ratio, 2),
            "exponent": round(exponent, 3),
            "gate": gate,
            "ok": ok,
            "complexity": note,
            "samples": {
                "sf0.1": samples[(name, "sf0.1")],
                "sf1": samples[(name, "sf1")],
            },
        }
        print(
            f"{name}: {t_small:.2f}s -> {t_big:.2f}s "
            f"ratio {ratio:.2f} exp {exponent:.2f} "
            f"({'ok' if ok else 'SUPER-LINEAR'})",
            flush=True,
        )

    # merge with any prior partial run (--ops chunking): per-op results
    # replace by name, flags recomputed over the union
    path = os.path.join(REPO, "BENCH_SCALE.json")
    if os.path.exists(path):
        prior = json.load(open(path))
        merged = dict(prior.get("ops", {}))
        merged.update(results)
        results = merged
    flagged = [n for n, r in results.items() if not r["ok"]]
    out = {
        "probe": "sf0.1->sf1 wall-time scaling",
        "scale_factor": scale,
        "runs_per_point": args.runs,
        "aggregation": "min",
        "slice": info,
        "ops": results,
        "flagged_super_linear": flagged,
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"flagged": flagged, "n_ops": len(results)}))
    return 0 if not flagged else 1


if __name__ == "__main__":
    raise SystemExit(main())
