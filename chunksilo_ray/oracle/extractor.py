"""Single-process pure-Python reference extractor (the P/R oracle).

The in-repo stand-in for "the reference extractor" named by the north rule:
a non-Ray, loop-based implementation of the extraction spec
(chunksilo_ray.rules) that the distributed pipeline is gated against at
triple P/R >= 0.95 (BASELINE.md targets; pattern copied from the reference's
mock-model determinism strategy, reference test/conftest.py:28-69).

Differences from the Ray pipeline are exactly the distribution-sensitive
parts: grouping/ordering is a plain sort here; canonicalization is EXACT
(every candidate pair sharing >= 2 shingles is verified — no MinHash-LSH
approximation); counting is a Counter, not a shuffle aggregate.
"""

from __future__ import annotations

import collections

import pyarrow as pa

from .. import rules
from ..extraction_core import AliasIndex, scan_mentions, triples_for_turn
from ..stages.canon import canonical_map_from_edges, verify_pair


def exact_canonical_map(norms: set[str]) -> dict[str, str]:
    """Exact clustering: candidate pairs = any two norms sharing >= 2 char
    shingles (a superset of every pair with jaccard >= threshold for realistic
    surface lengths); verify with the shared thresholds; union-find."""
    by_shingle: dict[str, list[str]] = collections.defaultdict(list)
    # ID-like norms are already canonical (rules.is_id_norm) — excluded from
    # fuzzy clustering in BOTH the oracle and the pipeline (same spec)
    sorted_norms = sorted(n for n in norms if not rules.is_id_norm(n))
    shingle_sets = {n: rules.char_shingles(n) for n in sorted_norms}
    for n in sorted_norms:
        for sh in shingle_sets[n]:
            by_shingle[sh].append(n)
    pair_counts: collections.Counter[tuple[str, str]] = collections.Counter()
    for sh, members in by_shingle.items():
        if len(members) < 2:
            continue
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pair_counts[(members[i], members[j])] += 1
    edges = [
        pair for pair, cnt in pair_counts.items() if cnt >= 2 and verify_pair(pair[0], pair[1])
    ]
    return canonical_map_from_edges(edges)


def extract(transcripts: pa.Table, alias_table: pa.Table) -> dict[str, object]:
    """Run the full single-process reference flow.

    Returns dict with:
      triples: set of (conv_id, turn_idx, subj, pred, obj) — canonicalized
      edge_weights: Counter over the same 5-tuples
      node_freqs: Counter over (entity_id, surface, type)
      canonical_map: the exact surface-merge map
    """
    alias = AliasIndex.from_arrow(alias_table)

    rows = list(
        zip(
            transcripts.column("conv_id").to_pylist(),
            transcripts.column("turn_idx").to_pylist(),
            transcripts.column("role").to_pylist(),
            transcripts.column("tool").to_pylist(),
            transcripts.column("text").to_pylist(),
        )
    )
    rows.sort(key=lambda r: (r[0], r[1]))  # plain single-process ordering

    raw_triples: list[tuple[str, int, str, str, str]] = []
    raw_mentions: list[tuple[str, int, str, str, str, str, bool]] = []
    unknown_norms: set[str] = set()
    for conv_id, turn_idx, role, tool, text in rows:
        ms = scan_mentions(text, alias)
        for m in ms:
            raw_mentions.append((conv_id, turn_idx, m.entity_id, m.surface, m.entity_type, m.norm, m.known))
            if not m.known:
                unknown_norms.add(m.norm)
        for s, p, o in triples_for_turn(role, tool, text, ms, alias):
            raw_triples.append((conv_id, turn_idx, s, p, o))

    cmap = exact_canonical_map(unknown_norms)

    def canon(eid: str) -> str:
        if eid.startswith(rules.UNKNOWN_PREFIX):
            norm = eid[len(rules.UNKNOWN_PREFIX) :]
            return rules.CANONICAL_PREFIX + cmap.get(norm, norm)
        return eid

    edge_weights: collections.Counter = collections.Counter()
    for conv_id, turn_idx, s, p, o in raw_triples:
        edge_weights[(conv_id, turn_idx, canon(s), p, canon(o))] += 1

    node_freqs: collections.Counter = collections.Counter()
    for conv_id, turn_idx, eid, surface, etype, norm, known in raw_mentions:
        node_freqs[(canon(eid), surface, etype)] += 1

    return {
        "triples": set(edge_weights.keys()),
        "edge_weights": edge_weights,
        "node_freqs": node_freqs,
        "canonical_map": cmap,
    }


def precision_recall(
    predicted: set[tuple], expected: set[tuple]
) -> tuple[float, float]:
    if not predicted or not expected:
        return (0.0, 0.0)
    tp = len(predicted & expected)
    return tp / len(predicted), tp / len(expected)
