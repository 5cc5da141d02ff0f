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
