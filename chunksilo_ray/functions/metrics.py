"""Retrieval-quality metrics: P@k, R@k, MRR, NDCG@k.

Behavioral re-implementation of the reference's metric math (reference
test/test_rag_metrics.py:473-573), used by the retrieval-quality gate over
the synthetic transcript corpus (the reference gates CI at P@5>=0.40,
R@5>=0.60, MRR>=0.40, NDCG@5>=0.60 — .github/workflows/test-rag-metrics.yml:61-66)."""

from __future__ import annotations

import math
from collections.abc import Sequence


def precision_at_k(retrieved: Sequence, relevant: set, k: int) -> float:
    if k <= 0:
        return 0.0
    top = list(retrieved)[:k]
    if not top:
        return 0.0
    return sum(1 for r in top if r in relevant) / k


def recall_at_k(retrieved: Sequence, relevant: set, k: int) -> float:
    if not relevant:
        return 0.0
    top = list(retrieved)[:k]
    return sum(1 for r in top if r in relevant) / len(relevant)


def mrr(retrieved: Sequence, relevant: set) -> float:
    for i, r in enumerate(retrieved, start=1):
        if r in relevant:
            return 1.0 / i
    return 0.0


def ndcg_at_k(retrieved: Sequence, relevant: set, k: int) -> float:
    """Binary-relevance NDCG@k: DCG with log2 discount over the first k
    results, normalized by the ideal DCG for min(k, |relevant|) hits."""
    top = list(retrieved)[:k]
    dcg = sum(1.0 / math.log2(i + 1) for i, r in enumerate(top, start=1) if r in relevant)
    ideal_hits = min(k, len(relevant))
    if ideal_hits == 0:
        return 0.0
    idcg = sum(1.0 / math.log2(i + 1) for i in range(1, ideal_hits + 1))
    return dcg / idcg


def evaluate_queries(
    results: dict[str, Sequence], ground_truth: dict[str, set], k: int = 5
) -> dict[str, float]:
    """Mean P@k / R@k / MRR / NDCG@k over a query set (the reference's
    aggregate step, test_rag_metrics.py:777-824)."""
    if not results:
        return {"p_at_k": 0.0, "r_at_k": 0.0, "mrr": 0.0, "ndcg_at_k": 0.0, "n_queries": 0}
    p = r = m = n = 0.0
    for q, retrieved in results.items():
        rel = ground_truth.get(q, set())
        p += precision_at_k(retrieved, rel, k)
        r += recall_at_k(retrieved, rel, k)
        m += mrr(retrieved, rel)
        n += ndcg_at_k(retrieved, rel, k)
    cnt = len(results)
    return {
        "p_at_k": round(p / cnt, 4),
        "r_at_k": round(r / cnt, 4),
        "mrr": round(m / cnt, 4),
        "ndcg_at_k": round(n / cnt, 4),
        "n_queries": cnt,
    }
