"""Round-2 gates: exact MinHash math, brute-force parity for the non-SQL
operators (VERDICT.md next-round items 1-4, 8-10), constructed-positive
tests for the empty-on-fixture queries, broadcast-join fallback, per-row
time budget, and the real-model embed seam."""

from __future__ import annotations

import hashlib
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# exact Mersenne-61 MinHash (ADVICE.md: int64 overflow broke the hash family)


def test_minhash_sig_exact_matches_bigint_reference():
    from chunksilo_ray.stages.canon import _MERSENNE, _hash_params, _minhash_sig_exact

    a, b = _hash_params(16)
    rng = np.random.default_rng(99)
    base = rng.integers(0, 1 << 32, size=37, dtype=np.uint64)
    got = _minhash_sig_exact(base, a, b)
    # pure-Python big-int reference: no overflow possible
    want = [
        min((int(a[p]) * int(x) + int(b[p])) % _MERSENNE for x in base.tolist())
        for p in range(len(a))
    ]
    assert got.tolist() == want


# ---------------------------------------------------------------------------
# dedup parity gates vs brute force (pytest side of the oracle story)


def _doc_texts(sf_dir: str) -> dict[int, str]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def test_minhash_groups_match_bruteforce_all_pairs():
    from chunksilo_ray.ops.dedup import _token_shingles, minhash_dup_groups

    texts = _doc_texts(SF)
    sh = {d: set(_token_shingles(x, 3)) for d, x in texts.items() if _token_shingles(x, 3)}
    ids = sorted(sh)
    # brute-force exact-jaccard edges + connected components, numeric-min rep
    parent = {d: d for d in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n_edges = 0
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sh[ids[i]], sh[ids[j]]
            inter = len(a & b)
            if inter and inter / (len(a) + len(b) - inter) >= 0.7:
                ra, rb = find(ids[i]), find(ids[j])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
                n_edges += 1
    groups = {}
    for d in ids:
        groups.setdefault(find(d), []).append(d)
    want = sorted(
        (d, root) for root, mem in groups.items() if len(mem) > 1 for d in mem
    )
    got = sorted(
        (r["doc_id"], r["dup_group"]) for r in minhash_dup_groups(SF).take_all()
    )
    assert n_edges > 0, "fixture must contain near-dups for this gate to mean anything"
    assert got == want


def test_simhash_pairs_match_bruteforce():
    from chunksilo_ray.ops.dedup import simhash_docs, simhash_dup_pairs

    sig = {r["doc_id"]: int(r["simhash"], 16) for r in simhash_docs(SF).take_all()}
    ids = sorted(sig)
    want = sorted(
        (ids[i], ids[j], bin(sig[ids[i]] ^ sig[ids[j]]).count("1"))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if bin(sig[ids[i]] ^ sig[ids[j]]).count("1") <= 3
    )
    rows = simhash_dup_pairs(SF).take_all()
    got = sorted((r["doc_a"], r["doc_b"], r["hamming"]) for r in rows)
    assert want, "fixture must contain simhash near-dups"
    assert got == want


def test_embedding_near_dups_constructed_positives(tmp_path):
    """The driver fixture has NO cosine>=0.95 pairs (green-on-empty proves
    nothing) — construct positives spanning batch boundaries and require
    exact agreement with brute force."""
    from chunksilo_ray.ops.dedup import embedding_near_dups

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 32))
    vecs = [v for v in base]
    # 6 near-dup copies of vectors 0..5 with tiny perturbations -> cos > 0.95
    for i in range(6):
        vecs.append(base[i] + 0.05 * rng.standard_normal(32))
    mat = np.asarray(vecs, dtype=np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
        }
    )
    # two row groups so Ray reads >= 2 blocks (pairs must cross batches)
    pq.write_table(t, str(tmp_path / "embeddings.parquet"), row_group_size=23)

    out = embedding_near_dups(str(tmp_path), threshold=0.95)
    got = sorted(zip(out["vec_a"].to_pylist(), out["vec_b"].to_pylist()))

    m64 = mat.astype(np.float64)
    m64 /= np.linalg.norm(m64, axis=1, keepdims=True)
    sims = m64 @ m64.T
    ii, jj = np.where(np.triu(sims >= 0.95, k=1))
    want = sorted(zip(ii.tolist(), jj.tolist()))
    assert len(want) >= 6
    assert got == want

    # the band explode must be vec_id-only — no vector payload through the
    # widest shuffle (the vectors attach once, later, for candidates only)
    from chunksilo_ray.ops.dedup import _hyperplane_bands_fn

    band_rows = _hyperplane_bands_fn(32)(t)
    assert band_rows.column_names == ["__part", "band_key", "doc_id"]


def test_ngram_jaccard_pairs_match_bruteforce():
    from chunksilo_ray.ops.dedup import _token_shingles, ngram_jaccard_pairs

    texts = _doc_texts(SF)
    sh = {d: set(_token_shingles(x, 2)) for d, x in texts.items() if _token_shingles(x, 2)}
    ids = sorted(sh)
    want = sorted(
        (ids[i], ids[j])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if (lambda a, b: len(a & b) and len(a & b) / (len(a) + len(b) - len(a & b)) >= 0.5)(
            sh[ids[i]], sh[ids[j]]
        )
    )
    rows = ngram_jaccard_pairs(SF).take_all()
    got = sorted((r["doc_a"], r["doc_b"]) for r in rows)
    assert want
    assert got == want


# ---------------------------------------------------------------------------
# doc_headings: constructed markdown positives (fixture has no '#' lines)


def test_doc_headings_markdown_positive(tmp_path):
    from chunksilo_ray.ops.text_search import doc_headings

    docs = [
        "# Title\nbody text\n## Sub Section\nmore\n",
        "intro\n```\n# not a heading\n```\n### Deep\ntail",
        "no headings here at all",
        "#### Trailing spaces   \nx\n####### seven hashes not a heading\n",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    rows = doc_headings(str(tmp_path)).to_pylist()
    assert len(rows) == 4
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["heading"], r["level"], r["position"]))
    assert by_doc[0] == [("Title", 1, 0), ("Sub Section", 2, 18)]
    assert docs[0][18:].startswith("## Sub Section")
    assert by_doc[1] == [("Deep", 3, 30)]
    assert docs[1][30:].startswith("### Deep")
    assert 2 not in by_doc
    assert by_doc[3] == [("Trailing spaces", 4, 0)]

    # and the DuckDB oracle SQL computes the identical table on the same data
    import duckdb
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    oracle = con.sql(entrymod.oracle_sql()["doc_headings"]).df()
    want = sorted(
        (int(r.doc_id), r.heading, int(r.position), int(r.level))
        for r in oracle.itertuples()
    )
    got = sorted((r["doc_id"], r["heading"], r["position"], r["level"]) for r in rows)
    assert got == want


# ---------------------------------------------------------------------------
# sketches / ANN accuracy gates


def test_hll_within_3pct_of_exact():
    import duckdb

    from chunksilo_ray.ops.sketches import approx_distinct_users

    est = approx_distinct_users(SF)["approx_distinct"][0].as_py()
    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) / exact <= 0.03


def test_ivf_recall_gate_at_shipped_defaults():
    """Recall gate at the EXACT configuration queries()['ivf_topk'] ships —
    no explicit n_probe/n_cells overrides (the round-2 gate ran n_probe=8
    while the default was 4: the shipped config had no measured recall)."""
    from chunksilo_ray.ops.similarity import cosine_topk, ivf_topk

    hits = 0
    total = 0
    for qid in (0, 7, 42):
        exact = {r["vec_id"] for r in cosine_topk(SF, vec_id=qid, k=10).to_pylist()}
        approx = {r["vec_id"] for r in ivf_topk(SF, vec_id=qid, k=10).to_pylist()}
        hits += len(exact & approx)
        total += len(exact)
    assert hits / total >= 0.9, f"IVF recall {hits}/{total}"


def test_ivf_index_persists_and_skips_training(tmp_path, monkeypatch):
    """Second query on the same table reuses the persisted index: with the
    in-process cache cleared, ivf_index must load centroids + partitions
    from disk WITHOUT retraining (reference load-once index pattern)."""
    import numpy as np
    import pyarrow.parquet as pq

    from chunksilo_ray.ops import similarity

    rng = np.random.default_rng(3)
    emb = rng.standard_normal((300, 16)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(300), pa.int64()),
            "embedding": pa.array([v.tolist() for v in emb], pa.list_(pa.float32())),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    c1, root1 = similarity.ivf_index(str(tmp_path), n_cells=4)
    similarity._IVF_MEM_CACHE.clear()

    def boom(*a, **kw):  # training must NOT run again
        raise AssertionError("retrained despite a valid persisted index")

    monkeypatch.setattr(similarity, "_train_centroids", boom)
    c2, root2 = similarity.ivf_index(str(tmp_path), n_cells=4)
    assert root1 == root2
    np.testing.assert_allclose(c1, c2)
    # and the shipped query path answers from the persisted partitions
    out = similarity.ivf_topk(str(tmp_path), vec_id=5, k=5, n_cells=4)
    assert 5 in set(out["vec_id"].to_pylist())


# ---------------------------------------------------------------------------
# canon distributed path (driver_threshold=0 forces the scale path)


def test_canon_distributed_path_equals_driver_path():
    import ray.data as rd

    from chunksilo_ray.stages import canon

    surfaces = [
        "flumetrics", "flu-metrics", "flumetric",
        "zorpdash", "zorp-dash",
        "unrelated-thing", "another-norm", "quxbase", "qux-base",
    ]
    t = pa.table(
        {
            "norm": pa.array(surfaces * 2, pa.string()),
            "known": pa.array([False] * (len(surfaces) * 2), pa.bool_()),
        }
    )
    driver_map = canon.build_canonical_map(rd.from_arrow(t))
    dist_map = canon.build_canonical_map(rd.from_arrow(t), driver_threshold=0)
    assert dist_map == driver_map
    assert driver_map  # non-trivial clusters exist


# ---------------------------------------------------------------------------
# per-row wall-clock budget in the extraction actor


def test_link_actor_time_budget_dead_letters_slow_row(monkeypatch):
    import ray

    from chunksilo_ray import datagen
    from chunksilo_ray.stages import link as link_mod
    from chunksilo_ray import extraction_core

    real_scan = extraction_core.scan_mentions

    def slow_scan(text, alias, cache=None):
        if "SLOWMARKER" in text:
            time.sleep(0.25)
        return real_scan(text, alias, cache)

    # patch the name the actor module resolves at call time (local __call__,
    # no remote actor involved — the guard logic itself is under test)
    monkeypatch.setattr(link_mod, "scan_mentions", slow_scan)

    alias_ref = ray.put(datagen.alias_table())
    actor = link_mod.LinkExtractActor(alias_ref, per_row_seconds=0.1)
    t = pa.table(
        {
            "conv_id": pa.array(["c1", "c1"], pa.string()),
            "turn_idx": pa.array([0, 1], pa.int32()),
            "role": pa.array(["user", "assistant"], pa.string()),
            "tool": pa.array(["", ""], pa.string()),
            "ts": pa.array([0, 1], pa.timestamp("us")),
            "text": pa.array(
                ["deployed Flumetrics with the database", "SLOWMARKER deployed Flumetrics"],
            ),
        }
    )
    out = actor(t)
    errs = out["error"].to_pylist()
    assert errs[0] is None
    assert errs[1] is not None and "TimeBudgetExceeded" in errs[1]
    # the slow row's outputs are dropped; the fast row's survive
    assert len(out["mentions"][0].as_py()) > 0
    assert out["mentions"][1].as_py() == []
    assert out["triples"][1].as_py() == []


# ---------------------------------------------------------------------------
# embed backend seam


def test_embed_backend_seam():
    from chunksilo_ray.stages.embed import EmbedActor

    with pytest.raises(RuntimeError, match="fastembed"):
        EmbedActor(backend="onnx")
    with pytest.raises(NotImplementedError, match="known backends"):
        EmbedActor(backend="bogus")
    # bow contract: deterministic across calls
    a = EmbedActor(backend="bow", dim=16)
    t = pa.table({"text": pa.array(["hello world", "hello there"])})
    out1 = a(t)
    out2 = a(t)
    assert out1["embedding"].to_pylist() == out2["embedding"].to_pylist()


def test_bow_arrow_kernel_parity():
    """The vectorized Arrow BoW kernel must be byte-for-byte the scalar
    contract (vec[sum(ord(c) for c in word) % dim] += 1 on text.lower()),
    including empty/whitespace/unicode/null rows and large_string input."""
    import numpy as np

    from chunksilo_ray.stages.embed import bow_hash_embed, bow_hash_embed_arrow

    texts = [
        "Hello world, this is a Test 123!",
        "",
        "   \n\t ",
        "aaa bbb aaa",
        "Ünïcode wörds stay split the same",
        "punctuation...everywhere!!!(and)[brackets]",
        "x" * 5000,
    ]
    ref = bow_hash_embed(texts, dim=32)
    for typ in (pa.string(), pa.large_string()):
        got = bow_hash_embed_arrow(pa.array(texts, typ), dim=32)
        assert np.allclose(ref, got, atol=1e-6)
    # null rows embed as zero vectors (scalar path never sees nulls)
    withnull = bow_hash_embed_arrow(pa.array(["abc", None], pa.string()), dim=32)
    assert np.allclose(withnull[0], bow_hash_embed(["abc"], dim=32)[0], atol=1e-6)
    assert not withnull[1].any()
    # chunked input
    ch = pa.chunked_array([pa.array(texts[:3]), pa.array(texts[3:])])
    assert np.allclose(ref, bow_hash_embed_arrow(ch, dim=32), atol=1e-6)


# ---------------------------------------------------------------------------
# broadcast join guard -> shuffle fallback parity


@pytest.mark.parametrize("name", ["customers_per_nation", "orders_with_customer_segment",
                                  "customers_without_orders"])
def test_join_fallback_matches_broadcast(name):
    from chunksilo_ray.ops import relational

    fn = getattr(relational, name)

    def norm(ds):
        rows = ds.take_all()
        # summation order differs between the paths -> last-ulp float noise
        return sorted(
            tuple(
                (k, round(v, 2) if isinstance(v, float) else v)
                for k, v in sorted(r.items())
            )
            for r in rows
        )

    assert norm(fn(SF, broadcast_limit=0)) == norm(fn(SF))


def test_join_fallback_schema_matches_broadcast():
    """The shuffle fallback must return the SAME schema as the broadcast
    path — including the fact key column in its original position (the
    round-2 fallback silently dropped it, a data-size-dependent schema)."""
    import pandas as pd
    import ray.data as rd

    from chunksilo_ray.ops.relational import broadcast_inner_join

    fact = rd.from_arrow(
        pa.table({"v": pa.array([10.0, 20.0, 30.0]),
                  "k": pa.array([1, 2, 99], pa.int64())})
    )
    dim = pd.DataFrame({"k": [1, 2, 3], "name": ["a", "b", "c"]})
    b = broadcast_inner_join(fact, "k", dim, "k", ["name"])
    s = broadcast_inner_join(fact, "k", dim, "k", ["name"], broadcast_limit=0)
    assert b.schema().names == s.schema().names == ["v", "k", "name"]
    key = lambda r: (r["k"], r["v"], r["name"])  # noqa: E731
    assert sorted(map(key, b.take_all())) == sorted(map(key, s.take_all()))


def test_broadcast_inner_join_drops_missing_keys():
    import ray.data as rd
    import pandas as pd

    from chunksilo_ray.ops.relational import broadcast_inner_join

    fact = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 99], pa.int64()),
                  "v": pa.array([10.0, 20.0, 30.0, 99.0])})
    )
    dim = pd.DataFrame({"k": [1, 2, 3], "name": ["a", "b", "c"]})
    rows = broadcast_inner_join(fact, "k", dim, "k", ["name"]).take_all()
    assert sorted(r["k"] for r in rows) == [1, 2, 3]  # 99 dropped, not nearest-matched


# ---------------------------------------------------------------------------
# manifest fingerprints see sub-second rewrites


def test_input_fingerprint_subsecond_rewrite(tmp_path):
    from chunksilo_ray.state.manifest import input_fingerprint

    f = tmp_path / "x.bin"
    f.write_bytes(b"a" * 64)
    st = f.stat()
    fp1 = input_fingerprint(str(f))
    # same size, mtime shifted by ONE nanosecond within the same second
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    fp2 = input_fingerprint(str(f))
    assert fp1 != fp2


def test_search_filters_before_rerank_truncation_backfills():
    """Required-phrase / min-score filters run BEFORE the rerank truncation:
    non-qualifying candidates that the lexical reranker would rank on top
    must not consume rerank_top_k slots (the round-2 order could return
    fewer than rerank_top_k results while qualifying candidates existed)."""
    import ray.data as rd

    from chunksilo_ray.config import Config
    from chunksilo_ray.pipelines.search import search_chunks
    from chunksilo_ray.stages.embed import bow_hash_embed

    texts = [
        "alpha beta gamma zzz here",   # phrase hit, partial token coverage
        "zzz alpha",                   # phrase hit, partial token coverage
        "alpha beta",                  # NO phrase — full coverage, reranks 1st
        "alpha beta again",            # NO phrase — full coverage
    ]
    emb = bow_hash_embed(texts)
    t = pa.table(
        {
            "chunk_id": pa.array([f"c{i}" for i in range(len(texts))]),
            "conv_id": pa.array(["conv"] * len(texts)),
            "turn_idx": pa.array(list(range(len(texts))), pa.int32()),
            "text": pa.array(texts),
            "tool": pa.array([""] * len(texts)),
            "ts": pa.array([1_700_000_000_000_000] * len(texts), pa.timestamp("us")),
            "heading_path": pa.array([["user"]] * len(texts), pa.list_(pa.string())),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), pa.float32()), emb.shape[1]
            ),
        }
    )
    cfg = Config({"search": {"rerank_top_k": 2}})
    rows = search_chunks(rd.from_arrow(t), 'alpha beta "zzz"', cfg=cfg).take_all()
    assert len(rows) == 2  # both qualifying candidates survive
    assert all("zzz" in r["text"] for r in rows)


# ---------------------------------------------------------------------------
# rerank merge semantics (reference search.py:1204-1241)


def test_merge_reranked_index_text_and_min_score_paths():
    from chunksilo_ray.pipelines.search import merge_reranked

    texts = ["alpha", "beta", "gamma", "beta"]
    # model output: one index match, one index-less text match (dedups to the
    # FIRST unseen index with that text), one bogus id out of range that text-
    # matches the second "beta"; "gamma" never mentioned -> min-score tail
    results = [
        {"id": 2, "text": "gamma", "score": 0.9},
        {"id": None, "text": "beta", "score": 0.7},
        {"id": 99, "text": "beta", "score": 0.4},
        {"id": 2, "text": "gamma", "score": 0.2},  # dup index: ignored
    ]
    order, scores = merge_reranked(len(texts), results, texts)
    assert order == [2, 1, 3, 0]
    assert scores[2] == 0.9 and scores[1] == 0.7 and scores[3] == 0.4
    # unmatched candidate 0 gets the MINIMUM matched score (never dropped)
    assert scores[0] == 0.4


def test_merge_reranked_empty_results_keeps_all():
    from chunksilo_ray.pipelines.search import merge_reranked

    order, scores = merge_reranked(3, [], ["a", "b", "c"])
    assert order == [0, 1, 2]
    assert all(scores[i] == 0.0 for i in range(3))
