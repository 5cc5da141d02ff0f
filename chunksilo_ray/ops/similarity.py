"""Similarity search over the ``embeddings`` table: brute-force cosine top-k
(baseline; the reference's vector top-k semantics, reference
src/chunksilo/search.py:1093-1099) and an IVF-bucketed variant (scale path).

The query matrix is broadcast once via ``ray.put``; every map_batches task
does one numpy matmul per batch against it — the distributed analog of the
reference's single in-memory vector index scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data import Dataset


def _emb(sf_dir: str) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return np.divide(m, norms, where=norms > 0)


def query_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    """Deterministic query: the embedding of ``vec_id`` (float64). ONE row —
    a driver-side predicate-pushdown read (Parquet row-group pruning on the
    vec_id statistics), not a distributed execution: fetching a single
    query vector through a Dataset pipeline paid ~1-2 s of executor latency
    per similarity query."""
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["embedding"], filter=pads.field("vec_id") == vec_id
    )
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


def cosine_topk(sf_dir: str, vec_id: int = 0, k: int = 10) -> "pa.Table":
    """Brute-force cosine top-k: per-batch partial top-k (np.argpartition)
    against the broadcast query, then a tiny global merge — the all-data
    sort never happens (SURVEY.md §2.6 vector top-k mapping)."""
    q = query_vector(sf_dir, vec_id)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    def partial_topk(t: pa.Table) -> pa.Table:
        # stateless task + worker-global broadcast cache (no actor-pool
        # startup on the critical path of a short query)
        from ..util import cached_get

        qv = cached_get(q_ref)
        emb = _normalize(np.asarray(t["embedding"].to_pylist(), dtype=np.float64))
        sims = emb @ qv
        if len(sims) > k:
            keep = np.argpartition(-sims, k)[:k]
        else:
            keep = np.arange(len(sims))
        ids = np.asarray(t["vec_id"].to_pylist())[keep]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cosine": pa.array(np.round(sims[keep], 6), pa.float64()),
            }
        )

    partials = _emb(sf_dir).map_batches(
        partial_topk, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    merged = partials.sort("cosine", descending=True).limit(k)
    t = pa.Table.from_pylist(merged.take_all())
    return t.select(["vec_id", "cosine"])


def ivf_topk(sf_dir: str, vec_id: int = 0, k: int = 10, n_cells: int = 16, n_probe: int = 4) -> "pa.Table":
    """IVF-style ANN: k-means-lite centroids from a deterministic sample,
    search only the n_probe nearest cells. The scale path for 100 TB:
    centroid assignment is a per-batch matmul; only ~n_probe/n_cells of the
    data is scanned at query time."""
    # deterministic "training" sample WITHOUT a global sort over the data:
    # consistent (bottom-k-by-hash) sampling — each batch emits its 256
    # smallest multiplicative-hash values, a tiny merge keeps the global
    # bottom 256. Content-addressed, so the sample is identical whatever
    # order blocks arrive in (a bare limit() on an unordered stream is
    # execution-order-dependent) and the merge input is <=256 rows/block.
    n_sample = 256

    def bottomk(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        if len(h) > n_sample:
            keep = np.argpartition(h, n_sample)[:n_sample]
        else:
            keep = np.arange(len(h))
        out = t.take(pa.array(keep))
        return out.append_column("h", pa.array(h[keep].astype(np.int64)))

    sample = (
        _emb(sf_dir)
        .map_batches(bottomk, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .sort("h")
        .limit(n_sample)
        .take_all()
    )
    X = _normalize(np.asarray([r["embedding"] for r in sample], dtype=np.float64))
    rng = np.random.default_rng(5)
    centroids = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(5):  # few Lloyd iterations, deterministic
        assign = np.argmax(X @ centroids.T, axis=1)
        for c in range(len(centroids)):
            m = X[assign == c]
            if len(m):
                v = m.mean(axis=0)
                centroids[c] = v / (np.linalg.norm(v) or 1.0)

    q = query_vector(sf_dir, vec_id)
    qn = q / np.linalg.norm(q)
    probe_cells = np.argsort(-(centroids @ qn))[:n_probe]
    state_ref = ray.put((centroids, qn, probe_cells))

    def probe_topk(t: pa.Table) -> pa.Table:
        from ..util import cached_get

        cents, qv, cells = cached_get(state_ref)
        emb = _normalize(np.asarray(t["embedding"].to_pylist(), dtype=np.float64))
        cell = np.argmax(emb @ cents.T, axis=1)
        mask = np.isin(cell, cells)
        if not mask.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        emb = emb[mask]
        ids = np.asarray(t["vec_id"].to_pylist())[mask]
        sims = emb @ qv
        if len(sims) > k:
            keep = np.argpartition(-sims, k)[:k]
        else:
            keep = np.arange(len(sims))
        return pa.table(
            {
                "vec_id": pa.array(ids[keep], pa.int64()),
                "cosine": pa.array(np.round(sims[keep], 6), pa.float64()),
            }
        )

    partials = _emb(sf_dir).map_batches(
        probe_topk, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    merged = partials.sort("cosine", descending=True).limit(k)
    t = pa.Table.from_pylist(merged.take_all())
    return t.select(["vec_id", "cosine"]) if t.num_rows else pa.table(
        {"vec_id": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())}
    )


def label_centroids(sf_dir: str) -> Dataset:
    """Mean embedding per label: per-batch partial sums -> tiny final
    combine (mergeable-sketch pattern). Output is FLAT (label, dim, value,
    n_vectors) rows — one per centroid component — so the oracle compare is
    over scalar columns (list-column hashing is representation-sensitive)."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        labels = np.asarray(t["label"].to_pylist())
        out_l, out_s, out_n = [], [], []
        for lab in np.unique(labels):
            m = labels == lab
            out_l.append(int(lab))
            out_s.append(emb[m].sum(axis=0).tolist())
            out_n.append(int(m.sum()))
        return pa.table(
            {
                "label": pa.array(out_l, pa.int32()),
                "vec_sum": pa.array(out_s, pa.list_(pa.float64())),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    def merge_group(t: pa.Table) -> pa.Table:
        sums = np.asarray(t["vec_sum"].to_pylist(), dtype=np.float64).sum(axis=0)
        n = int(sum(t["n"].to_pylist()))
        vals = np.round(sums / n, 6)
        d = len(vals)
        return pa.table(
            {
                "label": pa.array([t["label"][0].as_py()] * d, pa.int32()),
                "dim": pa.array(np.arange(1, d + 1), pa.int64()),
                "value": pa.array(vals, pa.float64()),
                "n_vectors": pa.array([n] * d, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("label")
        .map_groups(merge_group, batch_format="pyarrow")
    )
