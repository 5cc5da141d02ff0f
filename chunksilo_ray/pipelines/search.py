"""Search pipeline over the chunks table — the reference's retrieval flow
(reference src/chunksilo/search.py:1333-1430) re-expressed Ray-Data-first.

Stage order mirrors the reference:
 1. query preprocess + quoted-phrase extraction      (search.py:1363-1364)
 2. fan-out scoring in ONE vectorized pass per batch:
    vector similarity (cosine vs the broadcast query embedding — analog of
    the vector top-k, search.py:1093-1099), exact-phrase containment scan
    (search.py:319-338), tool/alias token match (the BM25-filename-match
    analog, search.py:1114-1143)
 3. date filter (inclusive, undated rows kept when unbounded —
    search.py:1018-1050)
 4. recency boost score*(1+w*exp(-ln2*age/half_life)) (search.py:1053-1090)
 5. candidate cap (rerank_candidates) -> rerank -> top rerank_top_k
    (search.py:1184-1248; the deterministic pass-through scorer of the
    reference's own test suite replaces the cross-encoder, FIXTURES.md §7)
 6. min-score + required-phrase post-filters (search.py:1394-1408)
 7. location formatting: heading path join + URI (search.py:1251-1330)

Everything is a single streaming pipeline: one map_batches scoring pass
(query vector broadcast via closure — a few hundred floats), a filter, and
one global sort+limit for the ranked tail. No full materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..config import Config
from ..functions.textutils import extract_quoted_phrases, preprocess_query, tokenize_surface
from ..stages.embed import bow_hash_embed, charngram_embed


def search_chunks(
    chunks: Dataset,
    query: str,
    date_from: str | None = None,
    date_to: str | None = None,
    cfg: Config | None = None,
) -> Dataset:
    """Retrieve ranked chunks for ``query``. Returns a small ranked Dataset
    with columns (chunk_id, conv_id, turn_idx, text, score, heading_path,
    uri, ts)."""
    cfg = cfg or Config()
    s = cfg.section("search")
    embed_top_k = s["embed_top_k"]
    rerank_candidates = s["rerank_candidates"]
    rerank_top_k = s["rerank_top_k"]
    half_life = s["recency_half_life_days"]
    weight = s["recency_weight"]
    min_score = s["min_score"]

    phrases, remainder = extract_quoted_phrases(query)
    q = preprocess_query(remainder or query)
    # the query MUST be embedded with the same backend the chunks were
    # (search.embed_backend mirrors embedding.backend at build time)
    embed_backend = s.get("embed_backend", "bow")
    if embed_backend == "charngram":
        qvec = charngram_embed([q])[0]
    else:
        qvec = bow_hash_embed([q])[0]
    q_tokens = set(tokenize_surface(q))
    phrases_lower = [p.lower() for p in phrases]

    lo = np.datetime64(date_from, "us") if date_from else None
    hi = (
        np.datetime64(date_to, "us") + np.timedelta64(86_399_999_999, "us")
        if date_to
        else None
    )

    def score_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return _empty_result()
        emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float32)
        cos = emb @ qvec  # embeddings are L2-normalized at embed time
        texts = t["text"].to_pylist()
        texts_lower = [x.lower() for x in texts]
        phrase_hit = np.zeros(n, dtype=bool)
        if phrases_lower:
            for i, x in enumerate(texts_lower):
                phrase_hit[i] = any(p in x for p in phrases_lower)
        tools = t["tool"].to_pylist()
        tool_hit = np.fromiter(
            (bool(q_tokens & set(tokenize_surface(x))) if x else False for x in tools),
            dtype=bool,
            count=n,
        )
        # fan-out union semantics: vector score, + flat bonuses for exact
        # phrase / tool match (the reference unions candidate SETS; a flat
        # bonus keeps those rows in the candidate pool deterministically)
        score = cos.astype(np.float64)
        score[phrase_hit] += 1.0
        score[tool_hit] += 0.5

        keep = (score > 0) | phrase_hit | tool_hit
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if lo is not None:
            keep &= ts >= lo.astype("int64")
        if hi is not None:
            keep &= ts <= hi.astype("int64")
        idx = np.flatnonzero(keep)
        if idx.size == 0:
            return _empty_result()
        sub = t.take(pa.array(idx))
        return pa.table(
            {
                "chunk_id": sub["chunk_id"],
                "conv_id": sub["conv_id"],
                "turn_idx": sub["turn_idx"],
                "text": sub["text"],
                "base_score": pa.array(score[idx], pa.float64()),
                "phrase_hit": pa.array(phrase_hit[idx], pa.bool_()),
                "heading_path": sub["heading_path"],
                "ts": sub["ts"],
            }
        )

    scored = chunks.map_batches(
        score_batch, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    # recency boost needs the corpus max ts — aggregate over the ts column
    # ONLY (projection pushdown: the second pass over a Parquet-backed chunk
    # table reads one column, not the text+embedding payload)
    from ray.data.aggregate import Max

    max_ts_val = chunks.select_columns(["ts"]).aggregate(Max("ts"))["max(ts)"]
    import pandas as pd

    anchor = int(pd.Timestamp(max_ts_val).value // 1000)  # us

    def boost(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        age_days = np.maximum((anchor - ts) / 86_400_000_000.0, 0.0)
        base = t["base_score"].to_numpy(zero_copy_only=False)
        boosted = base * (1.0 + weight * np.exp(-np.log(2.0) * age_days / half_life))
        t = t.append_column("score", pa.array(boosted, pa.float64()))
        # min-score + required-phrase filters run BEFORE the candidate cap and
        # rerank truncation, so rows they remove are backfilled from
        # lower-ranked candidates (reference order, search.py:1394-1408; the
        # round-2 post-rerank filter could return < rerank_top_k results even
        # when qualifying candidates existed)
        mask = boosted > float(min_score)
        if phrases_lower:
            mask &= t["phrase_hit"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(mask))

    boosted = scored.map_batches(
        boost, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    # candidate cap -> rerank (deterministic lexical cross-scorer standing in
    # for the cross-encoder; full merge semantics of the reference,
    # search.py:1204-1241) -> final top-k
    candidates = boosted.sort("score", descending=True).limit(
        max(rerank_candidates, embed_top_k)
    )

    rerank_backend = s.get("rerank_backend", "lexical")

    def rerank_batch(t: pa.Table) -> pa.Table:
        # the candidate set is capped (<= rerank_candidates rows) and lives
        # in ONE block (repartition(1) below) — the merge needs the whole
        # candidate list, exactly like the reference's in-process rerank
        texts = t["text"].to_pylist()
        if rerank_backend == "passthrough":
            # deterministic pass-through "model": echoes the retrieval score,
            # so the merge preserves boosted-score order (the reference's
            # fallback path when reranking fails, search.py:1243-1245)
            base = t["score"].to_numpy(zero_copy_only=False)
            results = [
                {"id": int(i), "text": texts[int(i)], "score": float(base[int(i)])}
                for i in np.argsort(-base, kind="stable")
            ]
        else:
            results = _lexical_rerank(q_tokens, texts)
        order, scores = merge_reranked(len(texts), results, texts)
        order = order[:rerank_top_k]
        out = t.take(pa.array(order))
        return out.append_column(
            "rerank_score", pa.array([scores[i] for i in order], pa.float64())
        )

    def finalize(t: pa.Table) -> pa.Table:
        # min-score / phrase filters already ran pre-cap (in boost) — this
        # stage only formats. candidate set is capped (<= rerank_candidates
        # rows) — plain
        # python formatting is fine here (search.py:133-151 URI analog)
        uri = pa.array(
            [
                f"conv://{c}#{i}"
                for c, i in zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist())
            ],
            pa.string(),
        )
        # heading path "role > tool" formatting (search.py:1251-1330 analog)
        hp = [" > ".join(x) for x in t["heading_path"].to_pylist()]
        return pa.table(
            {
                "chunk_id": t["chunk_id"],
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "text": t["text"],
                "score": pc.round(t["score"], ndigits=6),
                "rerank_score": pc.round(t["rerank_score"], ndigits=6),
                "heading_path": pa.array(hp, pa.string()),
                "uri": uri,
                "ts": t["ts"],
            }
        )

    # repartition(1): the merge is a whole-candidate-list operation on a
    # capped (<=100 row) set — one tiny block, order preserved through
    # finalize (no further sort: merge order IS the ranking)
    return (
        candidates.repartition(1)
        .map_batches(rerank_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(finalize, batch_format="pyarrow", batch_size=None)
    )


def _lexical_rerank(q_tokens: set[str], texts: list[str]) -> list[dict]:
    """Deterministic stand-in for the cross-encoder (reference FlashRank,
    search.py:1196-1201): score = query-token coverage of the passage.
    Returns results sorted by score desc (stable), shaped like the model
    output: [{"id": idx, "text": ..., "score": ...}]."""
    scores = []
    nq = max(len(q_tokens), 1)
    for i, x in enumerate(texts):
        toks = set(tokenize_surface(x))
        scores.append((len(q_tokens & toks) / nq, i))
    order = sorted(range(len(texts)), key=lambda i: (-scores[i][0], i))
    return [{"id": i, "text": texts[i], "score": scores[i][0]} for i in order]


def merge_reranked(
    n: int, results: list[dict], texts: list[str]
) -> tuple[list[int], dict[int, float]]:
    """The reference's rerank merge (search.py:1204-1241), as a pure
    function: match model results to candidates by index first, fall back to
    exact-text match (dedup via a seen-set), then append every unmatched
    candidate with the MINIMUM matched score so index/text mismatches never
    drop results. Returns (candidate order, {candidate_idx: rerank_score})."""
    text_to_indices: dict[str, list[int]] = {}
    for idx, x in enumerate(texts):
        text_to_indices.setdefault(x, []).append(idx)

    order: list[int] = []
    scores: dict[int, float] = {}
    seen: set[int] = set()
    for r in results:
        score = float(r.get("score", 0.0))
        ridx = r.get("id")
        if ridx is not None and 0 <= ridx < n:
            if ridx not in seen:
                order.append(ridx)
                scores[ridx] = score
                seen.add(ridx)
        else:
            for idx in text_to_indices.get(r.get("text", ""), []):
                if idx not in seen:
                    order.append(idx)
                    scores[idx] = score
                    seen.add(idx)
                    break
    min_score = min(scores.values()) if scores else 0.0
    for idx in range(n):
        if idx not in seen:
            order.append(idx)
            scores[idx] = min_score
    return order, scores


def _empty_result() -> pa.Table:
    return pa.table(
        {
            "chunk_id": pa.array([], pa.string()),
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "text": pa.array([], pa.string()),
            "base_score": pa.array([], pa.float64()),
            "phrase_hit": pa.array([], pa.bool_()),
            "heading_path": pa.array([], pa.list_(pa.string())),
            "ts": pa.array([], pa.timestamp("us")),
        }
    )
