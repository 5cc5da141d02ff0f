"""Distributed connected components over an edge-list Dataset.

The dedup clustering ops (minhash / ngram near-dup groups) need the
connected components of their verified-pair graphs. The default driver-side
union-find is fine while verified edges stay vocabulary-bounded, but at
100 TB a pathological corpus (template spam, boilerplate farms) can produce
an edge list that should never be collected to one process. This module is
the scale path: iterated min-label propagation expressed entirely in Ray
Data — per round, every node sends its current label to its neighbors and
takes the min of what it hears; labels only ever decrease, so the global
label sum is a monotone convergence witness. O(component diameter) rounds,
each round two key exchanges over (edges + labels); no driver state at all.

Classic formulation (public literature: hash-min / label propagation for
MapReduce-style CC). Per-round work is vectorized: the co-grouped partition
function is numpy searchsorted over sorted label rows — no per-node Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Min

# coarse partition count for the co-group exchange (see memory: groupby on
# raw node ids pays ~1 Python call per node; a fixed modulus keeps the
# map_groups call count constant and the per-call work vectorized)
_N_PARTS = 64


def _sym_with_part(edges: Dataset, a: str, b: str) -> Dataset:
    """Symmetrize (each undirected edge becomes two directed rows) and tag
    each row with the coarse partition of its source node."""

    def sym(t: pa.Table) -> pa.Table:
        aa = t[a].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = t[b].to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([aa, bb])
        neigh = np.concatenate([bb, aa])
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "neighbor": pa.array(neigh, pa.int64()),
                "__part": pa.array(node % _N_PARTS, pa.int64()),
            }
        )

    return edges.map_batches(sym, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def connected_components(
    edges: Dataset, a: str = "a", b: str = "b", max_rounds: int = 50
) -> Dataset:
    """Dataset of (node, component) for every node in ``edges``; component =
    the smallest node id reachable from it. Node ids must be non-negative
    int64 (-1 is the internal tagged-union sentinel). The result stays a
    Dataset — nothing is ever collected to the driver.

    Fully distributed: per round, a tagged union of (edge rows, label rows)
    is exchanged on the source node's coarse partition, each partition
    vectorizes "look up my label, address it to my neighbors", and a Min
    aggregate per target node produces the next label table. Converged when
    the (monotone non-increasing) label sum stops moving."""
    sym = _sym_with_part(edges, a, b).materialize()
    if sym.count() == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())})
        )

    # round 0 labels: label(x) = min(x, min neighbor) straight off the edge
    # table — one aggregate instead of a full propagate round
    labels = (
        sym.groupby("node")
        .aggregate(Min("neighbor", alias_name="label"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "label": pc.min_element_wise(t["node"], t["label"]),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        .materialize()
    )
    prev_sum = labels.sum("label")

    def tag_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "node": t["node"],
                "neighbor": t["neighbor"],
                "label": pa.array(np.full(n, -1), pa.int64()),
                "__part": t["__part"],
            }
        )

    def tag_labels(t: pa.Table) -> pa.Table:
        n = t.num_rows
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "neighbor": pa.array(np.full(n, -1), pa.int64()),
                "label": t["label"].cast(pa.int64()),
                "__part": pa.array(node % _N_PARTS, pa.int64()),
            }
        )

    def propagate(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        neigh = t["neighbor"].to_numpy(zero_copy_only=False)
        label = t["label"].to_numpy(zero_copy_only=False)
        is_lab = label >= 0
        ln, lv = node[is_lab], label[is_lab]
        order = np.argsort(ln, kind="stable")
        ln_s, lv_s = ln[order], lv[order]
        en, ev = node[~is_lab], neigh[~is_lab]
        pos = np.searchsorted(ln_s, en)
        # every edge-source node has exactly one label row in its own
        # partition (labels cover all nodes; both sides hash node % parts)
        msg_lbl = lv_s[pos]
        return pa.table(
            {
                "node": pa.array(np.concatenate([ev, ln_s]), pa.int64()),
                "label": pa.array(np.concatenate([msg_lbl, lv_s]), pa.int64()),
            }
        )

    for _ in range(max_rounds):
        u = sym.map_batches(
            tag_edges, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).union(
            labels.map_batches(
                tag_labels, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
            )
        )
        labels = (
            u.groupby("__part")
            .map_groups(propagate, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        s = labels.sum("label")
        if s == prev_sum:  # labels are non-increasing: stationary sum = done
            break
        prev_sum = s

    return labels.map_batches(
        lambda t: t.rename_columns(["node", "component"]),
        batch_format="pyarrow",
        batch_size=None,
    )


def ngram_dup_components(sf_dir: str) -> Dataset:
    """Near-dup clusters of the documents table WITHOUT any driver-side
    union-find: the verified bigram-jaccard pair list (ops/dedup.py) feeds
    the distributed min-label propagation above. Same clustering semantics
    as minhash_dup_groups' driver path, fully in the Ray Data plane — the
    shape a 100 TB corpus with a pathological dup graph needs. Value-oracled
    (recursive-CTE reachability in DuckDB)."""
    from .dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(sf_dir)
    comp = connected_components(pairs, a="doc_a", b="doc_b")
    return comp.map_batches(
        lambda t: t.rename_columns(["doc_id", "component"]),
        batch_format="pyarrow",
        batch_size=None,
    )
