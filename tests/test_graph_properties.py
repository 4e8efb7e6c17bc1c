"""Property-based tests for the graph operators: on random small
graphs, the distributed implementations must agree exactly with
brute-force driver-side references (itertools / dict BFS / iterative
peel). Spark sessions are expensive per example, so each property runs
a small number of RANDOM graphs via hypothesis with a reduced
max_examples — the planted-graph unit tests in test_llm_ops.py cover
the hand-checkable shapes; these cover the shapes nobody thought of.
"""

from __future__ import annotations

import itertools
import math
from collections import deque

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

EDGE = st.tuples(
    st.integers(min_value=0, max_value=11),
    st.integers(min_value=0, max_value=11),
)
EDGES = st.lists(EDGE, min_size=0, max_size=25)

_SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _canon(edges):
    return {
        (min(u, v), max(u, v)) for u, v in edges if u != v
    }


def _adj(es):
    adj: dict = {}
    for u, v in es:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


@given(EDGES)
@_SLOW
def test_triangle_stats_matches_bruteforce(spark, edges):
    from amadou_spark.operators.graph import triangle_stats

    es = _canon(edges)
    if not es:
        return
    adj = _adj(es)
    nodes = sorted(adj)
    tris = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    wedges = sum(len(adj[n]) * (len(adj[n]) - 1) // 2 for n in nodes)
    df = spark.createDataFrame(sorted(es), "u int, v int")
    row = triangle_stats(df).collect()[0]
    assert row.n_nodes == len(nodes)
    assert row.n_edges == len(es)
    assert row.n_triangles == tris
    if wedges == 0:
        assert row.clustering is None
    else:
        assert row.clustering == round(3.0 * tris / wedges, 6)


@given(EDGES)
@_SLOW
def test_local_clustering_matches_bruteforce(spark, edges):
    from amadou_spark.operators.graph import local_clustering

    es = _canon(edges)
    if not es:
        return
    adj = _adj(es)
    expect = {}
    for n, nbrs in adj.items():
        if len(nbrs) < 2:
            continue
        t = sum(
            1
            for a, b in itertools.combinations(sorted(nbrs), 2)
            if b in adj[a]
        )
        expect[n] = (len(nbrs), t, 2.0 * t / (len(nbrs) * (len(nbrs) - 1)))
    df = spark.createDataFrame(sorted(es), "u int, v int")
    got = {
        r.node: (r.d, r.n_tri, r.lcc)
        for r in local_clustering(df).collect()
    }
    assert got == expect


@given(EDGES, st.integers(min_value=1, max_value=4))
@_SLOW
def test_kcore_matches_iterative_peel(spark, edges, k):
    from amadou_spark.operators.graph import kcore

    es = _canon(edges)
    if not es:
        return
    # reference: peel to fixpoint
    cur = set(es)
    while True:
        deg: dict = {}
        for u, v in cur:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(u, v) for u, v in cur if u in keep and v in keep}
        if nxt == cur:
            break
        cur = nxt
    expect: dict = {}
    for u, v in cur:
        expect[u] = expect.get(u, 0) + 1
        expect[v] = expect.get(v, 0) + 1
    df = spark.createDataFrame(sorted(es), "u int, v int")
    # max_rounds=20 >> any 12-node peel depth, so both sides converge
    got = {r.node: r.degree for r in kcore(df, k=k, max_rounds=20).collect()}
    assert got == expect


@given(EDGES, st.integers(min_value=1, max_value=4))
@_SLOW
def test_bfs_levels_match_reference(spark, edges, depth):
    from amadou_spark.operators.graph import bfs_levels

    es = _canon(edges)
    if not es:
        return
    adj = _adj(es)
    src = min(adj)
    expect = {src: 0}
    q = deque([src])
    while q:
        n = q.popleft()
        if expect[n] >= depth:
            continue
        for m in adj[n]:
            if m not in expect:
                expect[m] = expect[n] + 1
                q.append(m)
    df = spark.createDataFrame(sorted(es), "u int, v int")
    got = {
        r.node: r.level for r in bfs_levels(df, max_depth=depth).collect()
    }
    assert got == expect


@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=5),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=4),
)
@_SLOW
def test_bpe_learn_merges_matches_python_reference(spark, words, n):
    """bpe_learn_merges vs a pure-Python replica using str.replace —
    the SAME one-pass left-to-right merge semantics — on random tiny
    two-letter corpora where self-adjacent runs (the divergence-prone
    shape) are common."""
    from amadou_spark.llm.text import bpe_learn_merges

    # python reference over the word-frequency table
    freq: dict = {}
    for w in words:
        freq[w] = freq.get(w, 0) + 1
    reprs = {w: "·" + "·".join(w) + "·" for w in freq}
    expect = []
    for rank in range(1, n + 1):
        counts: dict = {}
        for w, r in reprs.items():
            syms = [s for s in r.split("·") if s]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq[w]
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expect.append((rank, a, b, a + b, c))
        reprs = {
            w: r.replace(f"·{a}·{b}·", f"·{a}{b}·")
            for w, r in reprs.items()
        }
    docs = spark.createDataFrame(
        [(f"d{i}", w) for i, w in enumerate(words)],
        "doc_id string, text string",
    )
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in bpe_learn_merges(docs, num_merges=n).collect()
    ]
    assert got == expect


@given(EDGES, st.sampled_from([1, 2, 4, 64]))
@_SLOW
def test_adamic_adar_matches_bruteforce(spark, edges, chunk):
    """adamic_adar (hub-salted blocked wedge join) vs an itertools
    reference: for every non-adjacent pair, sum 1/ln(deg(center)) over
    common neighbors. chunk=1/2/4 force multi-block adjacency on these
    12-node graphs, exercising the cross-block exactly-once coverage;
    chunk=64 is the single-block (unsalted-equivalent) path."""
    from amadou_spark.operators.graph import adamic_adar

    es = _canon(edges)
    if not es:
        return
    adj = _adj(es)
    expect: dict = {}
    for center, neigh in adj.items():
        d = len(neigh)
        if d < 2:
            continue
        w = 1.0 / math.log(d)
        for a, b in itertools.combinations(sorted(neigh), 2):
            if b in adj[a]:
                continue  # existing edge: excluded by the anti-join
            s, cn = expect.get((a, b), (0.0, 0))
            expect[(a, b)] = (s + w, cn + 1)
    expect = {
        k: (round(v[0], 6), v[1]) for k, v in expect.items()
    }
    df = spark.createDataFrame(sorted(es), "u int, v int")
    got = {
        (r.node_a, r.node_b): (r.adamic_adar, r.common_neighbors)
        for r in adamic_adar(df, chunk=chunk).collect()
    }
    assert got == expect


WEDGE = st.tuples(
    st.integers(min_value=0, max_value=9),
    st.integers(min_value=0, max_value=9),
    st.integers(min_value=1, max_value=20),
)
WEIGHTED_EDGES = st.lists(WEDGE, min_size=1, max_size=22)


@given(edges=WEIGHTED_EDGES, rounds=st.integers(min_value=1, max_value=4))
@_SLOW
def test_sssp_matches_full_relaxation_bellman_ford(spark, edges, rounds):
    """The frontier-optimized distributed SSSP must agree exactly with
    the textbook full-edge-relaxation Bellman-Ford at the same round
    bound — pinning both correctness and the frontier-restriction
    equivalence claim in the operator docstring."""
    from amadou_spark.operators.graph import sssp

    es = [(u, v, w) for u, v, w in edges if u != v]
    if not es:
        return
    # directed multigraph: keep the min weight per (src, dst)
    best: dict = {}
    for u, v, w in es:
        if (u, v) not in best or w < best[(u, v)]:
            best[(u, v)] = w
    src = min(u for u, _ in best)
    dist = {src: 0}
    for _ in range(rounds):
        nxt = dict(dist)
        for (u, v), w in best.items():
            if u in dist and dist[u] + w < nxt.get(v, float("inf")):
                nxt[v] = dist[u] + w
        dist = nxt
    df = spark.createDataFrame(
        sorted((u, v, w) for (u, v), w in best.items()),
        "src int, dst int, w int",
    )
    got = {r.node: r.dist for r in sssp(df, rounds=rounds).collect()}
    assert got == dist


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=10, max_value=15),
        ),
        min_size=1,
        max_size=15,
    ),
    st.integers(min_value=1, max_value=3),
)
@_SLOW
def test_hits_matches_power_iteration(spark, edges, n_iter):
    from amadou_spark.operators.graph import hits

    es = sorted(set(edges))
    # driver-side reference: raw alternating sums, L1 normalize once
    # at the end (the operator's scheme — scalars cancel through the
    # linear updates, so this equals the per-round-normalized loop)
    hub = {s: 1.0 for s, _ in es}
    auth = {}
    for _ in range(n_iter):
        auth = {}
        for s, d in es:
            auth[d] = auth.get(d, 0.0) + hub.get(s, 0.0)
        hub = {}
        for s, d in es:
            hub[s] = hub.get(s, 0.0) + auth[d]
    tot = sum(auth.values())
    auth = {k: v / tot for k, v in auth.items()}
    tot = sum(hub.values())
    hub = {k: v / tot for k, v in hub.items()}
    df = spark.createDataFrame(es, "src long, dst long")
    got_h, got_a = {}, {}
    for r in hits(df, n_iter=n_iter).collect():
        (got_h if r.role == "hub" else got_a)[r.node] = r.score
    assert set(got_h) == set(hub) and set(got_a) == set(auth)
    for k, v in hub.items():
        assert math.isclose(got_h[k], v, rel_tol=1e-9)
    for k, v in auth.items():
        assert math.isclose(got_a[k], v, rel_tol=1e-9)
