"""Property test: connected_components agrees with a reference
union-find on randomized graphs (including pathological shapes the
dedup pipeline produces: chains, stars, cliques, singleton edges).

One Spark job per graph is slow, so the graphs are batched: every
random graph is tagged and unioned into ONE edge list whose vertex ids
are namespaced per graph — a single connected_components run then
verifies all of them at once (components can never bridge namespaces).
"""

from __future__ import annotations

import random

from pipe_s_spark.functions.dedup import connected_components


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # min-id canonical label per vertex
    return {v: find(v) for v in parent}


def _random_graphs(seed: int, n_graphs: int = 24):
    rng = random.Random(seed)
    graphs = []
    for g in range(n_graphs):
        shape = rng.choice(["random", "chain", "star", "clique", "two_cliques"])
        n = rng.randint(2, 24)
        vs = list(range(n))
        if shape == "random":
            edges = [
                tuple(rng.sample(vs, 2)) for _ in range(rng.randint(1, 2 * n))
            ]
        elif shape == "chain":
            edges = [(i, i + 1) for i in range(n - 1)]
        elif shape == "star":
            edges = [(0, i) for i in range(1, n)]
        elif shape == "clique":
            edges = [(i, j) for i in range(n) for j in range(i + 1, n)]
        else:
            h = n // 2
            edges = [(i, j) for i in range(h) for j in range(i + 1, h)]
            edges += [(i, j) for i in range(h, n) for j in range(i + 1, n)]
            if not edges:
                edges = [(0, 1)]
        graphs.append((g, edges))
    return graphs


import pytest


@pytest.mark.parametrize("force_two_phase", [False, True])
def test_cc_matches_union_find_on_random_graphs(spark, monkeypatch, force_two_phase):
    """Both resolution tiers a bounded graph can take — the r12
    edge-level driver fold (default at this scale) and the two-phase
    local-fold/contract path (forced by zeroing the edge bound) — must
    agree with the reference union-find."""
    import pipe_s_spark.functions.dedup as D

    if force_two_phase:
        monkeypatch.setattr(D, "CC_EDGE_FOLD_MAX_EDGES", 0)
    base = 1_000_000  # namespace stride: graph g's vertex v -> g*base + v
    all_edges = []
    expected: dict[int, int] = {}
    for g, edges in _random_graphs(seed=60):
        ns_edges = [(g * base + a, g * base + b) for a, b in edges]
        all_edges.extend(ns_edges)
        for v, lbl in _union_find(ns_edges).items():
            expected[v] = lbl
    df = spark.createDataFrame(all_edges, "d1 long, d2 long")
    got = {
        r["v"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == expected
    want_path = ("driver_fold", "local_only") if force_two_phase else ("edge_fold",)
    assert D.CC_TELEMETRY["path"] in want_path


def test_cc_distributed_fallback_matches_union_find(spark, monkeypatch):
    """Force the contracted graph over CC_DRIVER_FOLD_MAX_EDGES so the
    distributed min-label hop loop runs (it never triggers naturally
    at test scale) — both resolution paths must produce the identical
    min-vertex-id labeling."""
    import pipe_s_spark.functions.dedup as D

    monkeypatch.setattr(D, "CC_EDGE_FOLD_MAX_EDGES", 0)
    monkeypatch.setattr(D, "CC_DRIVER_FOLD_MAX_EDGES", 0)
    # without this, AQE folds the tiny repartition shuffle into one
    # task and the local union-find resolves everything — the hop loop
    # this test exists to pin would never run
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    base = 1_000_000
    all_edges = []
    expected: dict[int, int] = {}
    for g, edges in _random_graphs(seed=61, n_graphs=8):
        ns_edges = [(g * base + a, g * base + b) for a, b in edges]
        all_edges.extend(ns_edges)
        for v, lbl in _union_find(ns_edges).items():
            expected[v] = lbl
    df = spark.createDataFrame(all_edges, "d1 long, d2 long")
    try:
        got = {r["v"]: r["component"] for r in connected_components(df).collect()}
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    assert got == expected


def test_cc_string_vertices_distributed_fallback(spark, monkeypatch):
    """Regression (r11 advisory, dedup.py label_sum): the fallback's
    old convergence check summed cast(label as decimal), which is NULL
    for STRING vertices — NULL == NULL declared convergence after one
    hop and a 60-edge string chain silently came back as ~49 split
    components. The check is now an exact changed-row count, so the
    same forced-fallback chain must resolve to ONE component (and the
    multi-hop loop must actually iterate to get there)."""
    import pipe_s_spark.functions.dedup as D

    monkeypatch.setattr(D, "CC_EDGE_FOLD_MAX_EDGES", 0)
    monkeypatch.setattr(D, "CC_DRIVER_FOLD_MAX_EDGES", 0)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    edges = [(f"v{i:03d}", f"v{i + 1:03d}") for i in range(60)]
    df = spark.createDataFrame(edges, "d1 string, d2 string")
    try:
        got = {r["v"]: r["component"] for r in connected_components(df).collect()}
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    assert got == {f"v{i:03d}": "v000" for i in range(61)}
    assert D.CC_TELEMETRY["path"] == "distributed"


@pytest.mark.parametrize("force_two_phase", [False, True])
def test_cc_string_vertices(spark, monkeypatch, force_two_phase):
    """Every tier derives its schema from the edge dtype and unions by
    min via generic comparison — pin that a STRING vertex graph (e.g.
    URL or content-hash dedup keys) resolves with lexicographic-min
    labels on the edge-fold tier AND the two-phase path."""
    if force_two_phase:
        import pipe_s_spark.functions.dedup as D

        monkeypatch.setattr(D, "CC_EDGE_FOLD_MAX_EDGES", 0)
    edges = [
        ("b", "c"), ("c", "d"),          # chain -> component "b"
        ("x", "y"), ("y", "x"),          # both directions + cycle -> "x"
        ("m", "m"),                      # self-loop singleton -> "m"
        ("a", "d"),                      # joins the chain -> component "a"
    ]
    df = spark.createDataFrame(edges, "d1 string, d2 string")
    got = {r["v"]: r["component"] for r in connected_components(df).collect()}
    assert got == {
        "a": "a", "b": "a", "c": "a", "d": "a",
        "x": "x", "y": "x",
        "m": "m",
    }
