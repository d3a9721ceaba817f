"""Connected-components correctness: min-label propagation vs a driver-side
union-find model, on fixed and randomized (seeded) edge sets."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from findb_spark.ops.graph import connected_components, dedup_cluster_assignment


def _model(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find ground truth: node -> min node id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


def _check(spark, edges: list[tuple[int, int]]) -> None:
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        (r.node, r.cluster_id)
        for r in connected_components(df).collect()
    }
    assert got == set(_model(edges).items())


def test_two_components_and_chain(spark):
    # one 4-chain (diameter > 1 forces multiple propagation rounds) + a pair
    _check(spark, [(7, 3), (3, 9), (9, 11), (20, 21)])


def test_self_loop_and_duplicate_edges(spark):
    _check(spark, [(5, 5), (1, 2), (2, 1), (1, 2)])


@pytest.mark.parametrize("seed", [0, 1])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(60))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(45)
    ]
    _check(spark, edges)


def test_long_path_converges(spark):
    # path graph 0-1-2-...-12: worst-case diameter for label propagation
    _check(spark, [(i, i + 1) for i in range(12)])


def test_cluster_assignment_covers_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id bigint")
    pairs = spark.createDataFrame([(4, 1), (2, 4)], "doc1 bigint, doc2 bigint")
    got = {
        (r.doc_id, r.cluster_id)
        for r in dedup_cluster_assignment(docs, pairs).collect()
    }
    assert got == {(0, 0), (1, 1), (2, 1), (3, 3), (4, 1), (5, 5)}


def _check_star(spark, edges: list[tuple[int, int]]) -> None:
    from findb_spark.ops.graph import connected_components_star

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {(r.node, r.cluster_id) for r in connected_components_star(df).collect()}
    assert got == set(_model(edges).items())


def test_star_long_chain(spark):
    # 40-node path: diameter 39 — the shape min-label propagation needs ~39
    # rounds for; large/small-star must converge in O(log^2 n)
    _check_star(spark, [(i, i + 1) for i in range(40)])


def test_star_self_loops_isolates_and_dups(spark):
    _check_star(spark, [(5, 5), (1, 2), (2, 1), (1, 2), (9, 9)])


@pytest.mark.parametrize("seed", [0, 3])
def test_star_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(80))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(55)]
    _check_star(spark, edges)


def test_star_matches_propagation(spark):
    from findb_spark.ops.graph import connected_components_star

    rng = random.Random(11)
    edges = [(rng.randrange(50), rng.randrange(50)) for _ in range(40)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    a = {(r.node, r.cluster_id) for r in connected_components(df).collect()}
    b = {(r.node, r.cluster_id) for r in connected_components_star(df).collect()}
    assert a == b


def test_pagerank_int_matches_model(spark):
    from findb_spark.ops.graph import pagerank_int

    edge_list = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    got = {r.node: r.rank_fx for r in pagerank_int(edges, iters=10).collect()}

    base, tele = 10**9, (15 * 10**9) // 100
    deg = {"a": 2, "b": 1, "c": 1}
    r = {n: base for n in deg}
    for _ in range(10):
        contrib = {}
        for u, v in edge_list:
            contrib[v] = contrib.get(v, 0) + r[u] // deg[u]
        r = {n: tele + (85 * contrib.get(n, 0)) // 100 for n in r}
    assert got == r
    # c has two in-edges (a->c, b->c): highest authority
    assert max(got, key=got.get) == "c"


def _triangle_model(edges: list[tuple[int, int]]) -> set[frozenset]:
    es = {frozenset(e) for e in edges if e[0] != e[1]}
    nodes = {n for e in es for n in e}
    return {
        frozenset({a, b, c})
        for a in nodes
        for b in nodes
        if a < b and frozenset({a, b}) in es
        for c in nodes
        if b < c
        and frozenset({a, c}) in es
        and frozenset({b, c}) in es
    }


@pytest.mark.parametrize("seed", [1, 7])
def test_triangles_oriented_match_model(spark, seed):
    from findb_spark.ops.graph import triangles_oriented

    rng = random.Random(seed)
    es = {tuple(sorted(rng.sample(range(25), 2))) for _ in range(70)}
    edges = spark.createDataFrame(sorted(es), "a bigint, b bigint")
    rows = triangles_oriented(edges).collect()
    got = [frozenset({r.a, r.b, r.c}) for r in rows]
    # every triangle exactly once (list == set), matching brute force
    assert len(got) == len(set(got))
    assert set(got) == _triangle_model(list(es))


def test_triangles_orientation_defuses_hub(spark):
    """The scale contract: edges orient AWAY from high-degree nodes, so a
    hub contributes no wedge key — its degree never lands on one join
    task.  (An id-ordered 3-way self-join would put all hub edges on the
    hub's key: the 'curse of the last reducer'.)"""
    from pyspark.sql import functions as F

    from findb_spark.ops.graph import triangles_oriented

    # hub 0 joined to 1..20, plus a triangle fringe (1,2),(2,3),(3,4)...
    edges = [(0, i) for i in range(1, 21)] + [(i, i + 1) for i in range(1, 5)]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    tri = {frozenset({r.a, r.b, r.c}) for r in triangles_oriented(df).collect()}
    assert tri == _triangle_model(edges)
    # pin the orientation property itself: rebuild the oriented edge set
    # exactly as the operator does and assert the hub's out-degree is 0
    e = df.select(F.col("a").alias("x"), F.col("b").alias("y"))
    deg = (
        e.select(F.col("x").alias("node"))
        .unionAll(e.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    ed = e.join(
        deg.select(F.col("node").alias("x"), F.col("deg").alias("dx")), "x"
    ).join(deg.select(F.col("node").alias("y"), F.col("deg").alias("dy")), "y")
    x_first = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    out_deg = {
        r.src: r.n
        for r in ed.select(
            F.when(x_first, F.col("x")).otherwise(F.col("y")).alias("src")
        )
        .groupBy("src")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert 0 not in out_deg  # all 20 hub edges oriented leaf -> hub
    assert max(out_deg.values()) <= 2


# ---- label propagation -------------------------------------------------


def _lpa_model(edges: list[tuple[int, int]], rounds: int) -> dict[int, int]:
    """Driver-side synchronous LPA with the same pinned tie rule."""
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    nbrs: dict[int, list[int]] = {}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)
    lbl = {n: n for n in nbrs}
    for _ in range(rounds):
        nxt = {}
        for n, ns in nbrs.items():
            cnt: dict[int, int] = {}
            for m in ns:
                cnt[lbl[m]] = cnt.get(lbl[m], 0) + 1
            nxt[n] = min(cnt, key=lambda c: (-cnt[c], c))
        lbl = nxt
    return lbl


@pytest.mark.parametrize("seed", [0, 1])
def test_label_propagation_matches_model(spark, seed):
    from findb_spark.ops.graph import label_propagation

    rng = random.Random(seed)
    edges = [
        (rng.randrange(30), rng.randrange(30)) for _ in range(45)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "doc1 bigint, doc2 bigint")
    got = {(r.node, r.lbl) for r in label_propagation(df, rounds=3).collect()}
    assert got == set(_lpa_model(edges, 3).items())


def test_label_propagation_splits_bridged_cliques(spark):
    from findb_spark.ops.graph import label_propagation

    # two 4-cliques joined by a single bridge edge: connected components
    # would merge them; LPA should keep two communities
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = c1 + c2 + [(3, 10)]
    df = spark.createDataFrame(edges, "doc1 bigint, doc2 bigint")
    lbl = {r.node: r.lbl for r in label_propagation(df, rounds=4).collect()}
    assert len({lbl[n] for n in range(4)}) == 1
    assert len({lbl[n] for n in range(10, 14)}) == 1
    assert lbl[0] != lbl[12]


# ---- multi-source BFS ----------------------------------------------------


def _bfs_model(
    edges: list[tuple[int, int]], seeds: list[int], rounds: int
) -> dict[int, int]:
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in range(1, rounds + 1):
        frontier = {
            m for n in frontier for m in nbrs.get(n, ()) if m not in dist
        }
        for m in frontier:
            dist[m] = d
    return dist


@pytest.mark.parametrize("seed", [0, 1])
def test_bfs_distances_match_model(spark, seed):
    from findb_spark.ops.graph import bfs_distances

    rng = random.Random(seed)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    seeds = [0, 7, 13]
    ed = spark.createDataFrame(edges, "doc1 bigint, doc2 bigint")
    sd = spark.createDataFrame([(s,) for s in seeds], "node bigint")
    got = {(r.node, r.dist) for r in bfs_distances(ed, sd, rounds=4).collect()}
    assert got == set(_bfs_model(edges, seeds, 4).items())


def test_bfs_isolated_seed_stays_at_zero(spark):
    from findb_spark.ops.graph import bfs_distances

    ed = spark.createDataFrame([(1, 2), (2, 3)], "doc1 bigint, doc2 bigint")
    sd = spark.createDataFrame([(99,), (1,)], "node bigint")
    got = {(r.node, r.dist) for r in bfs_distances(ed, sd, rounds=3).collect()}
    assert got == {(99, 0), (1, 0), (2, 1), (3, 2)}


def test_recursive_cte_bfs_matches_dataframe_bfs(spark, sf_dir):
    """The WITH RECURSIVE grammar cert and the driver-loop DataFrame BFS
    are two independent implementations of the same hop-bounded BFS over
    the same pair graph — their outputs must agree exactly at the shared
    hop bound (cross-mechanism agreement, beyond each one's own oracle)."""
    from findb_spark.ops.dedup import minhash_lsh_pairs
    from findb_spark.ops.graph import bfs_distances
    from findb_spark.queries.graph_quality_queries import (
        _BFS_SEED_SOURCE,
        _REC_HOPS,
        sql_recursive_bfs,
    )
    from findb_spark.session import load_table
    from pyspark.sql import functions as F

    got = {
        (r.doc_id, r.hops) for r in sql_recursive_bfs(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.4).select("doc1", "doc2")
    seeds = docs.where(F.col("source") == _BFS_SEED_SOURCE).select(
        F.col("doc_id").alias("node")
    )
    want = {
        (r.node, r.dist)
        for r in bfs_distances(pairs, seeds, rounds=_REC_HOPS).collect()
    }
    assert got == want and len(got) > 0
