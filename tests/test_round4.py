"""Round-4 gates: constructed-positive tests for the round's fixes —
cume_dist cardinality guard, quantize non-zero-offset list arrays, knn_join
deterministic tie handling, and the distributed-CC minhash clustering."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


def test_cume_dist_cardinality_guard_trips():
    """A continuous value column must hit the guard, not collect an
    unbounded driver histogram."""
    import ray.data as rd

    from chunksilo_ray.ops import sketches

    n = 500
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "event_type": pa.array(["a"] * n, pa.string()),
            # all-distinct floats: distinct (type, value) == n
            "value": pa.array(np.linspace(0.0, 1.0, n), pa.float64()),
        }
    )
    orig = sketches._events
    sketches._events = lambda sf_dir, columns=None: rd.from_arrow(
        t.select(columns) if columns else t
    )
    try:
        with pytest.raises(ValueError, match="max_distinct"):
            sketches.cume_dist_value_by_type("ignored", max_distinct=100)
        # under the budget the same input computes fine
        out = sketches.cume_dist_value_by_type("ignored", max_distinct=n)
        assert out.count() == n
    finally:
        sketches._events = orig


def test_quantize_handles_nonzero_list_offset():
    """ListArray.flatten() already applies the array offset; the batch fn
    must not double-apply absolute offsets on a sliced (offset != 0) column.
    Pre-fix, flat[offs[0]:offs[-1]] over a sliced array reads past the end
    of the already-offset flattened buffer and the reshape crashes."""
    import ray.data as rd

    from chunksilo_ray.ops import similarity

    vals = [[1.0, -2.0], [3.0, 4.0], [-5.0, 0.5], [2.0, 2.0]]
    t = pa.table(
        {
            "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
            "embedding": pa.array(vals, pa.list_(pa.float64())),
        }
    )
    sliced = t.slice(2)  # embedding column now has a non-zero array offset
    assert sliced["embedding"].chunk(0).offset == 2  # the regression input

    orig = similarity._emb
    similarity._emb = lambda sf_dir: rd.from_arrow(sliced)
    try:
        got = {
            r["vec_id"]: (r["scale"], r["q_sum"], r["q_l1"])
            for r in similarity.quantize_embeddings("ignored").take_all()
        }
    finally:
        similarity._emb = orig
    assert set(got) == {2, 3}
    # row 2: scale = 5/127; q = trunc(v/scale) = (-127, 12)
    assert got[2] == (round(5.0 / 127.0, 9), -115, 139)
    # row 3: scale = 2/127; q = (127, 127)
    assert got[3] == (round(2.0 / 127.0, 9), 254, 254)


def test_knn_join_deterministic_under_duplicate_embeddings(tmp_path):
    """Duplicate vectors tie at the k-th boundary; the per-batch prune must
    keep the smaller vec_id (global order: cosine DESC, vec_id ASC)."""
    import pyarrow.parquet as pq

    from chunksilo_ray.ops import similarity

    rng = np.random.default_rng(7)
    base = rng.normal(size=8)
    # vec 0 = query; vecs 1..12 all IDENTICAL (cosine 1.0 ties), k=10
    vecs = [base] + [base * 2.0] * 12
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float64())),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet", row_group_size=4)
    out = similarity.knn_join(str(tmp_path), n_queries=1, k=10).to_pylist()
    got = [r["vec_id"] for r in out if r["query_id"] == 0]
    # ties broken by vec_id ascending -> exactly ids 1..10
    assert got == list(range(1, 11))


def test_kmeans_assign_duckdb_parity():
    """Distributed Lloyd's k-means vs the unrolled-iteration DuckDB oracle
    (the tail-query parity pattern): exact value match on (vec_id, cluster,
    dist2) at sf0.001."""
    import duckdb
    import pandas.testing as pdt

    import __ray_entry__ as E
    from chunksilo_ray.ops.similarity import kmeans_assign

    df = kmeans_assign(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    odf = (
        con.execute(E.oracle_sql()["kmeans_assign"])
        .fetchdf()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pdt.assert_frame_equal(df[sorted(df.columns)], odf[sorted(odf.columns)], rtol=1e-9)
    # every cluster id must be within range and at least one non-trivial
    assert df["cluster"].between(0, 7).all()


def test_kmeans_empty_cluster_keeps_previous_centroid():
    """Constructed input where one init centroid captures nothing after the
    first update: the empty cluster must keep its previous centroid (not
    NaN), mirroring the oracle's COALESCE."""
    import ray.data as rd

    from chunksilo_ray.ops import similarity

    # k=3 with DUPLICATE seeds: vec 0 and vec 1 are both [0,0], so the
    # lowest-cluster tie-break starves cluster 1 from iteration one — it is
    # empty at every update and must keep its init centroid (the oracle's
    # COALESCE path) instead of going NaN.
    pts = (
        [[0.0, 0.0], [0.0, 0.0], [10.0, 10.0]]
        + [[0.1, 0.1]] * 3
        + [[10.0, 10.0]] * 3
    )
    t = pa.table(
        {
            "vec_id": pa.array(range(len(pts)), pa.int64()),
            "embedding": pa.array([list(map(float, p)) for p in pts], pa.list_(pa.float32())),
        }
    )
    import pathlib
    import tempfile

    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, pathlib.Path(d) / "embeddings.parquet")
        out = similarity.kmeans_assign(d, k=3, iters=3).to_pandas()
    assert not out["dist2"].isna().any()
    # iteration 1 starves cluster 1 (tie-break → 0); it KEEPS centroid
    # [0,0] (no NaN), and precisely because it kept it, iteration 2
    # recaptures the exact-zero points (distance 0 beats the updated
    # cluster-0 centroid) — the kept-centroid semantics made observable
    out = out.set_index("vec_id")
    assert set(out.loc[[0, 1], "cluster"]) == {1}  # recaptured by kept centroid
    assert set(out.loc[[3, 4, 5], "cluster"]) == {0}
    assert set(out.loc[[2, 6, 7, 8], "cluster"]) == {2}
    assert out.loc[[0, 1], "dist2"].eq(0.0).all()


def test_minhash_dup_groups_is_distributed(ray_session):
    """The clustering result must come back as a Dataset (no driver
    union-find) and match the ngram CC op's contract shape."""
    from ray.data import Dataset

    from chunksilo_ray.ops.dedup import minhash_dup_groups

    out = minhash_dup_groups(SF)
    assert isinstance(out, Dataset)
    rows = out.take_all()
    by_group: dict[int, list[int]] = {}
    for r in rows:
        by_group.setdefault(r["dup_group"], []).append(r["doc_id"])
    for grp, members in by_group.items():
        assert grp == min(members)  # numeric-min representative
        assert len(members) >= 2  # every clustered doc has a neighbor


def _write_para_docs(tmp_path):
    """Crafted documents: P is duplicated across docs 1/2/3, Q twice within
    doc 2, U* are unique; doc 4 is ALL duplicates (clean_text must be NULL),
    doc 5 has no blank-line split (single paragraph, unique)."""
    import pyarrow.parquet as pq

    texts = {
        1: "P\n\nU1",
        2: "Q\n\nP\n\nQ\n\nU2",
        3: "U3\n\nP",
        4: "P\n\nQ",
        5: "solo paragraph no split",
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


_PARA_EXPECT = {
    1: (2, 1, "U1"),
    2: (4, 1, "U2"),
    3: (2, 1, "U3"),
    4: (2, 0, None),
    5: (1, 1, "solo paragraph no split"),
}


@pytest.mark.parametrize("broadcast_limit", [2_000_000, 0], ids=["broadcast", "shuffle"])
def test_paragraph_dedup_constructed(tmp_path, broadcast_limit):
    """Both paths (broadcast membership and the two-exchange shuffle
    fallback) must produce identical dedup semantics: corpus-global exact
    dup drop, document-order rebuild, NULL when nothing survives."""
    from chunksilo_ray.ops.curation import paragraph_dedup

    sf = _write_para_docs(tmp_path)
    out = paragraph_dedup(sf, broadcast_limit=broadcast_limit).to_pandas()
    got = {
        int(r.doc_id): (int(r.n_paras), int(r.n_kept), r.clean_text)
        for r in out.itertuples()
    }
    # pandas renders NULL as NaN; normalize
    got = {k: (a, b, None if not isinstance(c, str) else c) for k, (a, b, c) in got.items()}
    assert got == _PARA_EXPECT


def test_kg_node_degrees_constructed():
    """Degree profile over a crafted aggregated-edge table: self-loops count
    on both sides, weights sum per side independently."""
    import ray.data as rd

    from chunksilo_ray.ops.graph import kg_node_degrees

    edges = pa.table(
        {
            "subj": pa.array(["a", "a", "b", "c"], pa.string()),
            "pred": pa.array(["p", "q", "p", "p"], pa.string()),
            "obj": pa.array(["b", "c", "c", "c"], pa.string()),
            "weight": pa.array([3, 1, 2, 5], pa.int64()),
        }
    )
    out = kg_node_degrees(rd.from_arrow(edges)).to_pandas().set_index("node")
    assert out.loc["a"].tolist() == [2, 0, 4, 0]  # out_deg, in_deg, w_out, w_in
    assert out.loc["b"].tolist() == [1, 1, 2, 3]
    # c: self-loop row (c,p,c) — subj and obj sides both count it
    assert out.loc["c"].tolist() == [1, 3, 5, 8]


def _edges_agg_table(pairs):
    import pyarrow as pa

    return pa.table(
        {
            "subj": pa.array([p[0] for p in pairs], pa.string()),
            "pred": pa.array(["rel"] * len(pairs), pa.string()),
            "obj": pa.array([p[1] for p in pairs], pa.string()),
            "weight": pa.array([1] * len(pairs), pa.int64()),
        }
    )


def test_kg_triangle_count_constructed():
    """a-b-c triangle plus a c-d tail = exactly 1 triangle; duplicate and
    reversed edges must not double-count (distinct undirected pairs)."""
    import ray.data as rd

    from chunksilo_ray.ops.graph import kg_triangle_count

    t = _edges_agg_table(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("b", "a"), ("a", "b")]
    )
    out = kg_triangle_count(rd.from_arrow(t))
    assert out["n_triangles"].to_pylist() == [1]


def test_kg_common_neighbors_constructed_and_guard():
    """(a,d) and (b,d) share middle node c: jaccard = 1/(2+1-1) = 0.5 each;
    adjacent pairs are excluded. A hub past max_degree must raise."""
    import pytest as _pytest
    import ray.data as rd

    from chunksilo_ray.ops.graph import kg_common_neighbors

    t = _edges_agg_table([("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    out = kg_common_neighbors(rd.from_arrow(t), k=10)
    rows = list(
        zip(out["node_a"].to_pylist(), out["node_b"].to_pylist(),
            out["common_n"].to_pylist(), out["jaccard"].to_pylist())
    )
    assert rows == [("a", "d", 1, 0.5), ("b", "d", 1, 0.5)]

    with _pytest.raises(ValueError, match="max_degree"):
        kg_common_neighbors(rd.from_arrow(t), k=10, max_degree=2)


def test_cc_driver_vs_distributed_parity():
    """The budgeted driver union-find and the distributed min-label
    iteration must produce identical (node, component) tables — including
    numeric-min representatives — on a graph with a chain, a cycle, and
    isolated pairs."""
    import ray.data as rd

    from chunksilo_ray.ops.graph import connected_components

    edges = pa.table(
        {
            "a": pa.array([10, 11, 12, 50, 51, 90, 7, 3], pa.int64()),
            "b": pa.array([11, 12, 13, 51, 50, 91, 3, 5], pa.int64()),
        }
    )
    fast = connected_components(rd.from_arrow(edges)).to_pandas()
    dist = connected_components(rd.from_arrow(edges), driver_budget=0).to_pandas()
    fast = fast.sort_values("node").reset_index(drop=True)
    dist = dist.sort_values("node").reset_index(drop=True)
    assert fast.equals(dist)
    got = dict(zip(fast["node"], fast["component"]))
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 50: 50, 51: 50,
                   90: 90, 91: 90, 3: 3, 5: 3, 7: 3}


def test_substring_dup_fraction_constructed(tmp_path):
    """Window 'a b c' repeats across docs 1 and 2 (k=3): per-doc window
    counts, dup counts, fraction rounding, and the NULL short-doc case."""
    import pyarrow.parquet as pq

    from chunksilo_ray.ops.curation import substring_dup_fraction

    texts = {
        1: "a b c d",
        2: "x a b c y",
        3: "no dup here at all",
        4: "tiny doc",
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = substring_dup_fraction(str(tmp_path), k=3).to_pandas().set_index("doc_id")
    assert out.loc[1].tolist()[:2] == [2, 1] and out.loc[1, "dup_fraction"] == 0.5
    assert out.loc[2].tolist()[:2] == [3, 1] and out.loc[2, "dup_fraction"] == 0.333333
    assert out.loc[3].tolist()[:2] == [3, 0] and out.loc[3, "dup_fraction"] == 0.0
    assert out.loc[4, "n_windows"] == 0 and pd_isna(out.loc[4, "dup_fraction"])


def pd_isna(x):
    import pandas as pd

    return pd.isna(x)


def test_dedup_keep_best_constructed(tmp_path):
    """Exact near-dups with different lengths: the longest (max n_alnum)
    member of each group is kept, doc_id breaks ties, singletons absent."""
    import pyarrow.parquet as pq

    from chunksilo_ray.ops.curation import dedup_keep_best

    dup = ("the quick brown fox jumps over the lazy dog and then naps "
           "quietly under a warm tree near the river bank every afternoon")
    texts = {
        1: dup,
        2: dup + " extended with more unique alphanumeric content here",
        3: dup,  # ties with 1 on text; doc 2 wins on n_alnum
        4: "a completely different document with no duplicate at all",
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = dedup_keep_best(str(tmp_path)).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3]          # singleton 4 absent
    assert set(out["dup_group"]) == {1}
    kept = out.loc[out["kept"], "doc_id"].tolist()
    assert kept == [2]                                  # max n_alnum wins
    assert out.sort_values("doc_id")["kept"].tolist() == [False, True, False]


def test_dsir_importance_constructed(tmp_path):
    """Docs matching the target slice's bigrams must outscore docs that
    share none; n_feat counts vocab-bigram OCCURRENCES (repeats included)."""
    import pyarrow.parquet as pq

    from chunksilo_ray.ops.curation import dsir_importance

    target = "alpha beta gamma alpha beta"     # doc 7: the target slice
    texts = {
        7: target,                              # 7 % 100 == 7 -> target
        1: "alpha beta gamma",                  # shares target bigrams
        2: "delta epsilon zeta",                # disjoint -> n_feat 0
        3: "alpha beta alpha beta",             # repeated target bigram
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = dsir_importance(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[2, "n_feat"] == 0 and out.loc[2, "importance"] == 0.0
    # target bigrams: "alpha beta" x2, "beta gamma", "gamma alpha"
    assert out.loc[1, "n_feat"] == 2          # alpha beta, beta gamma
    assert out.loc[3, "n_feat"] == 2          # "alpha beta" x2 ("beta alpha" not a target bigram)

    # pure-Python reference of the published formula over the same fixture
    import math
    from collections import Counter

    def bigrams(x):
        w = __import__("re").findall(r"[a-z0-9]+", x.lower())
        return [f"{a} {b}" for a, b in zip(w, w[1:])]

    tgt = Counter(bigrams(texts[7]))
    vocab = sorted(tgt, key=lambda b: (-tgt[b], b))[:1000]
    corp = Counter(b for x in texts.values() for b in bigrams(x) if b in set(vocab))
    tt = sum(tgt[b] for b in vocab) + len(vocab)
    tc = sum(corp[b] for b in vocab) + len(vocab)
    lr = {b: math.log(((tgt[b] + 1) / tt) / ((corp[b] + 1) / tc)) for b in vocab}
    for did, text in texts.items():
        exp = round(sum(lr[b] for b in bigrams(text) if b in lr), 4)
        assert out.loc[did, "importance"] == exp, (did, exp)


def test_role_transitions_constructed(tmp_path):
    """Two conversations with a known turn order: transitions count within
    conversations only, ordered by turn_idx regardless of row order."""
    import pyarrow.parquet as pq

    from chunksilo_ray.ops.window import role_transitions

    t = pa.table(
        {
            "conv_id": pa.array(["c1", "c1", "c2", "c1", "c2"], pa.string()),
            # rows deliberately out of order: c1 turns 0,2,1 / c2 turns 1,0
            "turn_idx": pa.array([0, 2, 1, 1, 0], pa.int32()),
            "role": pa.array(["user", "user", "assistant", "assistant", "user"], pa.string()),
        }
    )
    p = tmp_path / "tr.parquet"
    pq.write_table(t, p)
    out = role_transitions(str(p)).to_pandas()
    got = {(r.role_from, r.role_to): r.n for r in out.itertuples()}
    # c1 ordered roles: user -> assistant -> user; c2: user -> assistant
    assert got == {("user", "assistant"): 2, ("assistant", "user"): 1}


def test_embedding_pca_matches_numpy_reference(tmp_path):
    """The distributed moment fold + projection must equal a straight
    numpy PCA (same covariance normalization, same deterministic signs)."""
    import pathlib

    import pyarrow.parquet as pq

    from chunksilo_ray.ops.similarity import embedding_pca

    rng = np.random.RandomState(7)
    X = rng.randn(64, 6) * np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1]) + rng.randn(6)
    t = pa.table(
        {
            "vec_id": pa.array(range(64), pa.int64()),
            "embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float32())),
        }
    )
    pq.write_table(t, pathlib.Path(tmp_path) / "embeddings.parquet")
    out = embedding_pca(str(tmp_path), n_components=3).to_pandas().set_index("vec_id")

    Xd = X.astype(np.float32).astype(np.float64)  # the parquet round-trip
    mean = Xd.mean(axis=0)
    cov = np.cov(Xd, rowvar=False)
    vals, vecs = np.linalg.eigh(cov)
    comps = vecs[:, np.argsort(vals)[::-1][:3]]
    for j in range(3):
        i = int(np.argmax(np.abs(comps[:, j])))
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    exp = np.round((Xd - mean) @ comps, 6)
    got = np.array([out.loc[i, "proj"] for i in range(64)])
    assert np.allclose(got, exp, atol=2e-6)


def test_kg_kcore_constructed():
    """Triangle a-b-c (2-core) with pendant d and chain e-f: the peel must
    drop d, e, f and report in-core degrees of exactly 2."""
    import ray.data as rd

    from chunksilo_ray.ops.graph import kg_kcore

    t = _edges_agg_table(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("e", "f")]
    )
    out = kg_kcore(rd.from_arrow(t), k=2)
    got = dict(zip(out["node"].to_pylist(), out["core_degree"].to_pylist()))
    assert got == {"a": 2, "b": 2, "c": 2}


def test_proximity_search_constructed(tmp_path):
    """min-gap across multiple occurrences, window boundary inclusive,
    single-term docs excluded."""
    import pyarrow.parquet as pq

    from chunksilo_ray.ops.text_search import proximity_search

    texts = {
        1: "hash x x x x join",        # dist 5 — exactly at the window
        2: "hash x x x x x join",      # dist 6 — excluded
        3: "join y hash y y y y join", # best pair dist 2 (join@0, hash@2)
        4: "hash only here",           # no join — excluded
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = proximity_search(str(tmp_path), "hash", "join", window=5).to_pandas()
    got = dict(zip(out["doc_id"], out["min_dist"]))
    assert got == {1: 5, 3: 2}


def test_lm_perplexity_scores_constructed(tmp_path):
    """Repetitive in-distribution text must score LOWER mean_nll than a
    digit-noise outlier; <2-char docs get NULL."""
    import pyarrow.parquet as pq

    from chunksilo_ray.ops.curation import lm_perplexity_scores

    texts = {
        1: "the cat sat on the mat " * 20,
        2: "q7z9 x3v1 j8k2 w5m4 r6t0",   # bigrams rare in the corpus
        3: "a",                           # 1 char -> 0 bigrams -> NULL
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = lm_perplexity_scores(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[1, "mean_nll"] < out.loc[2, "mean_nll"]
    assert out.loc[3, "n_bigrams"] == 0 and pd_isna(out.loc[3, "mean_nll"])


def test_frequent_part_pairs_constructed(tmp_path):
    """Pairs count DISTINCT orders (duplicate lineitem rows collapse);
    support threshold filters singletons."""
    import pyarrow.parquet as pq

    from chunksilo_ray.ops.relational import frequent_part_pairs

    rows = [  # (order, part)
        (1, 10), (1, 20), (1, 20),   # dup row: pair (10,20) once for order 1
        (2, 10), (2, 20), (2, 30),   # pairs (10,20) (10,30) (20,30)
        (3, 10), (3, 30),            # pair (10,30)
    ]
    t = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = frequent_part_pairs(str(tmp_path), min_support=2).to_pandas()
    got = {(r.part_a, r.part_b): r.n_orders for r in out.itertuples()}
    assert got == {(10, 20): 2, (10, 30): 2}


def test_split_leakage_audit_constructed(tmp_path):
    """A near-dup pair engineered to straddle two splits must be reported;
    same-split dups and singletons must not."""
    import hashlib

    import pyarrow.parquet as pq

    from chunksilo_ray.ops.curation import split_leakage_audit

    def split_of(text):
        h = hashlib.md5(text.encode()).hexdigest()[0]
        return "val" if h == "e" else "test" if h == "f" else "train"

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
            "kilo lima mike november oscar papa quebec romeo sierra tango "
            "uniform victor whiskey xray yankee zulu one two three four")
    # search a trailing word that flips the split bucket of the variant
    variant = None
    for i in range(4000):
        cand = base + f" word{i}"
        if split_of(cand) != split_of(base):
            variant = cand
            break
    assert variant is not None
    texts = {
        1: base,
        2: variant,                        # near-dup of 1, different split
        3: "completely different text about nothing shared with the others at all",
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = split_leakage_audit(str(tmp_path)).to_pandas()
    assert out[["doc_a", "doc_b"]].values.tolist() == [[1, 2]]
    assert out.loc[0, "split_a"] == split_of(base)
    assert out.loc[0, "split_b"] == split_of(variant)
