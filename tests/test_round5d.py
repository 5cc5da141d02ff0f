"""Round-5 batch D: char-ngram hashed embedding backend (the stronger
deterministic stand-in for a real sentence model) + a second retrieval-
quality gate running the FULL search path — embed, fan-out scoring, recency
boost, rerank merge — over charngram vectors, whose score spreads are
realistic (subword cosine in (0,1)) unlike the near-binary BoW twin.
Thresholds mirror the reference CI gate shape
(.github/workflows/test-rag-metrics.yml:61-66)."""

import numpy as np
import pyarrow as pa
import pytest


class TestCharngramKernel:
    def test_deterministic_and_normalized(self):
        from chunksilo_ray.stages.embed import charngram_embed

        v1 = charngram_embed(["Alice configured the database", "run tests"])
        v2 = charngram_embed(["Alice configured the database", "run tests"])
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_allclose(np.linalg.norm(v1, axis=1), 1.0, rtol=1e-6)
        assert v1.dtype == np.float32 and v1.shape == (2, 384)

    def test_empty_and_null(self):
        from chunksilo_ray.stages.embed import charngram_embed_arrow

        v = charngram_embed_arrow(pa.array(["", None, "x"], pa.string()))
        assert np.all(v[0] == 0) and np.all(v[1] == 0)

    def test_subword_similarity_orders_alias_variants(self):
        """The property BoW lacks: surface variants of one entity share char
        n-grams, so their cosine beats unrelated words'."""
        from chunksilo_ray.stages.embed import charngram_embed

        v = charngram_embed(["database", "data-base", "databases", "scheduler"])
        sim = v @ v.T
        assert sim[0, 1] > sim[0, 3] + 0.2
        assert sim[0, 2] > sim[0, 3] + 0.2

    def test_memo_equivalence(self):
        """Warm-memo and cold runs are identical (memoization is pure)."""
        from chunksilo_ray.stages.embed import charngram_embed_arrow

        memo = {}
        texts = pa.array(["alpha beta", "beta gamma", "alpha gamma delta"])
        warm1 = charngram_embed_arrow(texts, 128, memo)
        warm2 = charngram_embed_arrow(texts, 128, memo)  # all words memoized
        cold = charngram_embed_arrow(texts, 128, {})
        np.testing.assert_array_equal(warm1, cold)
        np.testing.assert_array_equal(warm2, cold)

    def test_bow_vs_charngram_distinct(self):
        from chunksilo_ray.stages.embed import bow_hash_embed, charngram_embed

        b = bow_hash_embed(["the quick brown fox"])
        c = charngram_embed(["the quick brown fox"])
        assert not np.allclose(b, c)


@pytest.mark.usefixtures("ray_session")
def test_retrieval_quality_gate_charngram(smoke_corpus, tmp_path_factory):
    """Reference-shaped CI gate on the charngram stack: P@5>=0.40,
    MRR>=0.40, NDCG@5>=0.60 over golden queries whose relevant set is every
    conversation containing the quoted fragment."""
    import pyarrow.parquet as pq

    from chunksilo_ray.config import Config
    from chunksilo_ray.functions.metrics import evaluate_queries
    from chunksilo_ray.pipelines.kg import build_kg
    from chunksilo_ray.pipelines.search import search_chunks

    cfg = Config({"embedding": {"backend": "charngram"},
                  "search": {"embed_backend": "charngram"}})
    out = str(tmp_path_factory.mktemp("kgq_cg"))
    res = build_kg(
        f"{smoke_corpus}/transcripts.parquet",
        f"{smoke_corpus}/alias_index.parquet",
        out,
        cfg=cfg,
    )
    chunks = res["chunks"]
    emb = chunks.take(1)[0]["embedding"]
    assert len(emb) == 384 and abs(float(np.linalg.norm(emb)) - 1.0) < 1e-5

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
        hits = search_chunks(chunks, q, cfg=cfg).take_all()
        results[name] = [h["conv_id"] for h in hits]
        ground_truth[name] = rel

    assert len(results) >= 3, "golden queries must have non-empty ground truth"
    m = evaluate_queries(results, ground_truth, k=5)
    assert m["p_at_k"] >= 0.40, m
    assert m["mrr"] >= 0.40, m
    assert m["ndcg_at_k"] >= 0.60, m
