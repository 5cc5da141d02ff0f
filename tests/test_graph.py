"""Distributed connected components (ops/graph.py): correctness vs a local
union-find oracle, multi-round convergence on long chains, empty input."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from chunksilo_ray.ops.graph import connected_components


def _uf_oracle(edges):
    parent = {}

    def find(x):
        r = parent.setdefault(x, x)
        while r != parent[r]:
            parent[r] = parent[parent[r]]
            r = parent[r]
        parent[x] = r
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def _run(edges):
    t = pa.table(
        {
            "a": pa.array([a for a, _ in edges], pa.int64()),
            "b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    rows = connected_components(rd.from_arrow(t)).take_all()
    return {r["node"]: r["component"] for r in rows}


@pytest.mark.usefixtures("ray_session")
def test_chain_triangle_and_pair():
    # a 6-node chain (needs >1 propagation round), a triangle, a lone pair
    edges = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15),
             (20, 21), (21, 22), (22, 20),
             (30, 31)]
    got = _run(edges)
    assert got == _uf_oracle(edges)
    assert got[15] == 10 and got[22] == 20 and got[31] == 30


@pytest.mark.usefixtures("ray_session")
def test_long_chain_converges():
    # 64-node path graph: worst-case diameter for min-label propagation;
    # doubling-free propagation needs many rounds — convergence must still
    # land the single component on the chain's smallest id
    edges = [(i, i + 1) for i in range(100, 140)]
    got = _run(edges)
    assert set(got.values()) == {100}
    assert len(got) == 41


@pytest.mark.usefixtures("ray_session")
def test_random_graph_matches_union_find():
    rng = np.random.default_rng(7)
    nodes = rng.choice(5000, size=400, replace=False)
    edges = [
        (int(nodes[i]), int(nodes[j]))
        for i, j in rng.integers(0, len(nodes), size=(300, 2))
        if i != j
    ]
    assert _run(edges) == _uf_oracle(edges)


@pytest.mark.usefixtures("ray_session")
def test_empty_edges():
    assert _run([]) == {}


def _pagerank_oracle(edges, n_iter=5, damping=0.85):
    """Dense numpy power iteration on the symmetrized graph, ×N scale."""
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    adj = np.zeros((n, n))
    for a, b in edges:
        adj[idx[a], idx[b]] = 1.0
        adj[idx[b], idx[a]] = 1.0
    deg = adj.sum(axis=1)
    pr = np.ones(n)
    for _ in range(n_iter):
        pr = (1 - damping) + damping * adj.T @ (pr / deg)
    return {nd: pr[idx[nd]] for nd in nodes}


@pytest.mark.usefixtures("ray_session")
def test_pagerank_matches_dense_power_iteration():
    from chunksilo_ray.ops.graph import pagerank

    rng = np.random.default_rng(11)
    # canonicalize a<b: the operator treats each input row as one undirected
    # edge (parallel edges add degree), the dense oracle uses 0/1 adjacency
    edges = sorted(
        {(min(int(a), int(b)), max(int(a), int(b)))
         for a, b in rng.integers(0, 60, size=(150, 2)) if a != b}
    )
    t = pa.table(
        {
            "a": pa.array([a for a, _ in edges], pa.int64()),
            "b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    rows = pagerank(rd.from_arrow(t)).take_all()
    got = {r["node"]: r["pr"] for r in rows}
    exp = _pagerank_oracle(edges)
    assert set(got) == set(exp)
    for nd in exp:
        assert abs(got[nd] - exp[nd]) < 1e-9, nd
    # a hub (max-degree node) outranks the mean
    hub = max(exp, key=lambda nd: sum(1 for e in edges if nd in e))
    assert got[hub] > 1.0


@pytest.mark.usefixtures("ray_session")
def test_pagerank_empty_edges():
    from chunksilo_ray.ops.graph import pagerank

    t = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    assert pagerank(rd.from_arrow(t)).take_all() == []


@pytest.mark.usefixtures("ray_session")
def test_pagerank_broadcast_and_exchange_paths_agree():
    """broadcast_limit=0 forces the tagged-union exchange path; the default
    takes the broadcast-rank fast path — identical results required."""
    from chunksilo_ray.ops.graph import pagerank

    rng = np.random.default_rng(5)
    edges = sorted(
        {(min(int(a), int(b)), max(int(a), int(b)))
         for a, b in rng.integers(0, 40, size=(90, 2)) if a != b}
    )
    t = pa.table(
        {
            "a": pa.array([a for a, _ in edges], pa.int64()),
            "b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    fast = {r["node"]: r["pr"] for r in pagerank(rd.from_arrow(t)).take_all()}
    slow = {r["node"]: r["pr"]
            for r in pagerank(rd.from_arrow(t), broadcast_limit=0).take_all()}
    assert set(fast) == set(slow)
    for nd in fast:
        assert abs(fast[nd] - slow[nd]) < 1e-9, nd
