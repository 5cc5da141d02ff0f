"""Round-4 batch-4 gates: constructed-positive tests for the KG analytics
additions (PMI edge weighting, 1-hop neighbor aggregation, bounded BFS
reach) and the transcripts conversation profile."""

from __future__ import annotations

import math

import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _edges(pairs_w):
    return pa.table(
        {
            "subj": pa.array([p[0] for p in pairs_w], pa.string()),
            "pred": pa.array(["rel"] * len(pairs_w), pa.string()),
            "obj": pa.array([p[1] for p in pairs_w], pa.string()),
            "weight": pa.array([p[2] for p in pairs_w], pa.int64()),
        }
    )


def test_kg_edge_pmi_constructed():
    """Hand-computed PMI: reversed duplicate edges merge into one undirected
    pair; self-loops are dropped; a rare exclusive pair (d-e) gets the top
    PMI while a hub-to-hub pair is penalized."""
    import ray.data as rd

    from chunksilo_ray.ops.graph import kg_edge_pmi

    t = _edges(
        [
            ("a", "b", 3),
            ("c", "a", 5),  # reversed direction -> same undirected pair a-c
            ("a", "c", 1),
            ("b", "c", 2),
            ("d", "e", 2),
            ("d", "d", 9),  # self-loop: dropped entirely
        ]
    )
    out = {
        (r["node_a"], r["node_b"]): (r["w_pair"], r["pmi"])
        for r in kg_edge_pmi(rd.from_arrow(t)).take_all()
    }
    # pair weights: ab=3, ac=6, bc=2, de=2; T=13
    # node weights: a=9, b=5, c=8, d=2, e=2
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c"), ("d", "e")}
    assert out[("a", "b")] == (3, round(math.log(3 * 13 / (9 * 5)), 6))
    assert out[("a", "c")] == (6, round(math.log(6 * 13 / (9 * 8)), 6))
    assert out[("d", "e")] == (2, round(math.log(2 * 13 / (2 * 2)), 6))
    # exclusive rare pair outranks everything
    assert out[("d", "e")][1] == max(v[1] for v in out.values())


def test_kg_neighbor_agg_constructed():
    """Star a-(b,c,d) plus edge b-c: degrees a=3, b=2, c=2, d=1; per-node
    neighbor-degree sum/max/mean are hand-checked."""
    import ray.data as rd

    from chunksilo_ray.ops.graph import kg_neighbor_agg

    t = _edges([("a", "b", 1), ("a", "c", 1), ("a", "d", 1), ("b", "c", 1)])
    out = {
        r["node"]: (r["degree"], r["nd_sum"], r["nd_max"], r["nd_mean"])
        for r in kg_neighbor_agg(rd.from_arrow(t)).take_all()
    }
    assert out["a"] == (3, 5, 2, round(5 / 3, 6))  # nbrs b,c,d -> 2+2+1
    assert out["b"] == (2, 5, 3, 2.5)  # nbrs a,c -> 3+2
    assert out["c"] == (2, 5, 3, 2.5)
    assert out["d"] == (1, 3, 3, 3.0)  # nbr a


def test_kg_bfs_reach_constructed():
    """Chain hub-x-y-z plus hub-w: the single seed is the highest-degree
    node ('hub', degree 2 ties with x -> 'hub' < 'x' asc tie-break); depth
    caps at max_depth and disconnected nodes never appear."""
    import ray.data as rd

    from chunksilo_ray.ops.graph import kg_bfs_reach

    t = _edges(
        [("hub", "x", 1), ("x", "y", 1), ("y", "z", 1), ("hub", "w", 1), ("p", "q", 1)]
    )
    out = kg_bfs_reach(rd.from_arrow(t), n_seeds=1, max_depth=2)
    got = dict(zip(out["node"].to_pylist(), out["dist"].to_pylist()))
    # z is 3 hops out (past max_depth); p/q are a disconnected component
    assert got == {"hub": 0, "x": 1, "w": 1, "y": 2}


def test_conv_stats_constructed(tmp_path):
    """Two conversations with known turn counts, tool turns, char totals
    and time spans; turns arrive shuffled across the file (the op never
    relies on row order)."""
    import ray.data as rd  # noqa: F401  (ray session)

    from chunksilo_ray.ops.window import conv_stats

    rows = [
        # (conv_id, turn_idx, role, text, tool, ts_us)
        ("c2", 0, "user", "hi", "", 5_000_000),
        ("c1", 1, "assistant", "four", "", 2_000_000),
        ("c1", 0, "user", "ab", "", 1_000_000),
        ("c1", 2, "tool", "toolout", "search", 4_000_000),
        ("c2", 1, "assistant", "yo!", "", 9_000_000),
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
            "ts": pa.array([r[5] for r in rows], pa.timestamp("us")),
        }
    )
    path = str(tmp_path / "transcripts.parquet")
    pa.parquet.write_table(t, path)

    out = {
        r["conv_id"]: (
            r["n_turns"],
            r["n_tool_turns"],
            r["total_chars"],
            r["max_turn_chars"],
            r["duration_us"],
        )
        for r in conv_stats(path).take_all()
    }
    assert out["c1"] == (3, 1, 13, 7, 3_000_000)
    assert out["c2"] == (2, 0, 5, 3, 4_000_000)


def test_sft_pairs_constructed(tmp_path):
    """Only exact user->assistant adjacencies (turn_idx + 1) become pairs:
    a tool interlude breaks the pair, assistant->assistant does not count,
    and rows arrive shuffled across the file."""
    import ray.data as rd  # noqa: F401  (ray session)

    from chunksilo_ray.ops.window import sft_pairs

    rows = [
        # c1: user(0) -> assistant(1) pairs; assistant(1) -> user(2) ->
        # tool(3) -> assistant(4): the tool turn breaks the second pair
        ("c1", 3, "tool", "lookup", "search", 4),
        ("c1", 0, "user", "q1", "", 1),
        ("c1", 4, "assistant", "a2", "", 5),
        ("c1", 1, "assistant", "a1", "", 2),
        ("c1", 2, "user", "q2", "", 3),
        # c2: user turn with NO adjacent assistant (gap in turn_idx)
        ("c2", 0, "user", "lost", "", 1),
        ("c2", 2, "assistant", "late", "", 2),
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
            "ts": pa.array([r[5] * 1_000_000 for r in rows], pa.timestamp("us")),
        }
    )
    path = str(tmp_path / "transcripts.parquet")
    pa.parquet.write_table(t, path)

    got = sorted(
        (r["conv_id"], r["prompt_turn"], r["prompt"], r["response"])
        for r in sft_pairs(path).take_all()
    )
    assert got == [("c1", 0, "q1", "a1")]


def test_kg_edge_provenance_constructed():
    """Weight and mention count merge across blocks; the earliest witness
    is the (conv_id, turn_idx) pair minimum — turn 2 beats turn 10 only
    under zero-padding (the '000002' < '000010' check)."""
    import ray.data as rd

    from chunksilo_ray.ops.graph import kg_edge_provenance

    t = pa.table(
        {
            "subj": pa.array(["a", "a", "a", "b"], pa.string()),
            "pred": pa.array(["p", "p", "p", "q"], pa.string()),
            "obj": pa.array(["b", "b", "b", "c"], pa.string()),
            "conv_id": pa.array(["c2", "c1", "c1", "c9"], pa.string()),
            "turn_idx": pa.array([1, 10, 2, 7], pa.int32()),
            "weight": pa.array([2, 1, 3, 4], pa.int64()),
        }
    )
    out = {
        (r["subj"], r["pred"], r["obj"]): (
            r["weight"],
            r["n_mentions"],
            r["first_witness"],
        )
        for r in kg_edge_provenance(rd.from_arrow(t)).take_all()
    }
    assert out[("a", "p", "b")] == (6, 3, "c1:000002")
    assert out[("b", "q", "c")] == (4, 1, "c9:000007")


def test_conv_dedup_constructed(tmp_path):
    """Three conversations: c1 and c3 have byte-identical turn-ordered text
    (different conv ids, timestamps, shuffled row order) -> one group of 2
    with rep = min conv id; c2 differs only in turn ORDER, so it must NOT
    join the group (the digest is order-sensitive)."""
    import ray.data as rd  # noqa: F401

    from chunksilo_ray.ops.window import conv_dedup

    rows = [
        ("c3", 1, "B"), ("c1", 0, "A"), ("c2", 0, "B"),
        ("c1", 1, "B"), ("c2", 1, "A"), ("c3", 0, "A"),
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    path = str(tmp_path / "transcripts.parquet")
    pa.parquet.write_table(t, path)

    out = {
        r["conv_id"]: (r["rep_conv_id"], r["group_size"])
        for r in conv_dedup(path).take_all()
    }
    assert out["c1"] == ("c1", 2)
    assert out["c3"] == ("c1", 2)
    assert out["c2"] == ("c2", 1)


def test_conv_loop_score_constructed(tmp_path):
    """A looping conversation (same text 3 of 4 turns) scores 0.5
    (n_distinct=2, n_turns=4); an all-distinct one scores 0."""
    import ray.data as rd  # noqa: F401

    from chunksilo_ray.ops.window import conv_loop_score

    rows = [
        ("loopy", "retry"), ("loopy", "retry"), ("loopy", "ok"), ("loopy", "retry"),
        ("fine", "x"), ("fine", "y"),
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    path = str(tmp_path / "transcripts.parquet")
    pa.parquet.write_table(t, path)

    out = {
        r["conv_id"]: (r["n_turns"], r["n_distinct"], r["loop_score"])
        for r in conv_loop_score(path).take_all()
    }
    assert out["loopy"] == (4, 2, 0.5)
    assert out["fine"] == (2, 2, 0.0)


def test_turn_length_percentiles_constructed(tmp_path):
    """Discrete percentile rule (smallest value with cum >= ceil(q*n))
    against hand-placed length histograms, including the n=4 p50 boundary
    where ceil(2.0)=2 picks the SECOND smallest, not the third."""
    import ray.data as rd  # noqa: F401

    from chunksilo_ray.ops.window import turn_length_percentiles

    rows = [("u", "a" * k) for k in (1, 2, 3, 4)]  # user: lens 1..4
    rows += [("a", "x" * k) for k in range(1, 11)]  # assistant: lens 1..10
    t = pa.table(
        {
            "role": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    path = str(tmp_path / "transcripts.parquet")
    pa.parquet.write_table(t, path)

    out = {
        r["role"]: (r["n_turns"], r["len_min"], r["p50"], r["p90"], r["p99"], r["len_max"])
        for r in turn_length_percentiles(path).take_all()
    }
    # DuckDB quantile_disc parity: n=4 -> p50 = 2; n=10 -> p50=5, p90=9, p99=10
    assert out["u"] == (4, 1, 2, 4, 4, 4)
    assert out["a"] == (10, 1, 5, 9, 10, 10)


def test_semdedup_constructed(tmp_path):
    """Two well-separated k-means clusters; within a cluster, colinear /
    near-colinear vectors (cosine >= tau) collapse onto the smallest
    vec_id; an orthogonal-ish vector survives. dup_of is the SMALLEST
    earlier duplicate, keep is 0/1 int."""
    import ray.data as rd  # noqa: F401

    from chunksilo_ray.ops.similarity import semdedup

    vecs = [
        (0, [10.0, 0.0]),   # cluster-0 seed (init centroid 0)
        (1, [0.0, 10.0]),   # cluster-1 seed (init centroid 1)
        (2, [20.0, 0.0]),   # colinear with 0 -> dup_of 0
        (3, [10.0, 0.1]),   # cos ~0.99995 vs 0 -> dup_of 0 (not 2: min rule)
        (4, [0.0, 30.0]),   # colinear with 1 -> dup_of 1
        (5, [7.0, 7.0]),    # cos 0.707 vs both axes -> kept
    ]
    t = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array([v[1] for v in vecs], pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pa.parquet.write_table(t, str(tmp_path / "embeddings.parquet"))

    out = {
        r["vec_id"]: (r["keep"], r["dup_of"])
        for r in semdedup(str(tmp_path), k=2, iters=2, tau=0.99).take_all()
    }
    assert out[0] == (1, -1)
    assert out[1] == (1, -1)
    assert out[2] == (0, 0)
    assert out[3] == (0, 0)
    assert out[4] == (0, 1)
    assert out[5] == (1, -1)


def test_kg_negative_samples_constructed():
    """Hand-computed md5 corruption indices over vocab [a,b,c,d]:
    md5('a|c')[:8] % 4 = 3 -> d, so seed (a,c) proposes (a,d); seeds whose
    digest lands on their own endpoints are dropped. Adding the real edge
    a-d then kills that one surviving candidate — the real-edge anti-join."""
    import ray.data as rd

    from chunksilo_ray.ops.graph import kg_negative_samples

    base = [("a", "b", 1), ("a", "c", 1), ("b", "c", 1), ("c", "d", 1)]
    out = [
        (r["seed_a"], r["seed_b"], r["neg_a"], r["neg_b"])
        for r in kg_negative_samples(rd.from_arrow(_edges(base))).take_all()
    ]
    assert out == [("a", "c", "a", "d")]

    with_ad = base + [("a", "d", 1)]
    out2 = kg_negative_samples(rd.from_arrow(_edges(with_ad))).take_all()
    assert out2 == []


def test_kg_ppr_constructed():
    """One-iteration hand check on a star a-(b,c) with seed a (highest
    degree): pr0 = [1,0,0]; pr1(a) = 0.15*1 + 0.85*(pr0(b)/1 + pr0(c)/1)
    = 0.15; pr1(b) = pr1(c) = 0.85 * pr0(a)/deg(a) = 0.85/2 = 0.425.
    Disconnected pair d-e gets zero mass (no teleport off-seed)."""
    import ray.data as rd

    from chunksilo_ray.ops.graph import kg_ppr

    t = _edges([("a", "b", 1), ("a", "c", 1), ("d", "e", 1)])
    out = kg_ppr(rd.from_arrow(t), n_seeds=1, n_iter=1)
    got = dict(zip(out["entity"].to_pylist(), out["ppr"].to_pylist()))
    assert got == {"a": 0.15, "b": 0.425, "c": 0.425, "d": 0.0, "e": 0.0}
