"""Text-search operators over ``documents``: markdown heading extraction,
exact-phrase scan, and a distributed BM25.

Behavioral re-implementations of the reference's text operators:
- heading extraction: ATX `#{1,6}` regex skipping fenced code blocks
  (reference src/chunksilo/index.py:450-490), emitted flat_map-style as
  (doc_id, heading, position, level) rows;
- phrase scan: case-insensitive containment over the docstore
  (search.py:319-338) with the reference's result cap;
- BM25: the filename-BM25 (index.py:1218-1265) generalized to document
  text, distributed as two passes — a tiny df aggregate for the query terms
  only (broadcast), then one vectorized scoring pass + global top-k. The
  full-corpus inverted index never exists; only per-query-term statistics
  move.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

from ..functions.textutils import tokenize_surface

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.+?)\s*$")
_FENCE_RE = re.compile(r"^(```|~~~)")
_WORD_RE = re.compile(r"[A-Za-z0-9]+")


def _docs(sf_dir: str, columns: list[str] | None = None) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def extract_markdown_headings(text: str) -> list[dict]:
    """ATX headings with char positions + levels, skipping fenced code
    (index.py:450-490 behavior)."""
    out: list[dict] = []
    pos = 0
    in_fence = False
    for line in text.splitlines(keepends=True):
        stripped = line.rstrip("\n")
        if _FENCE_RE.match(stripped.lstrip()):
            in_fence = not in_fence
        elif not in_fence:
            m = _HEADING_RE.match(stripped)
            if m:
                out.append(
                    {"text": m.group(2), "position": pos, "level": len(m.group(1))}
                )
        pos += len(line)
    return out


def doc_headings(sf_dir: str) -> Dataset:
    """Flat (doc_id, heading, position, level) rows over documents."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        ids, heads, positions, levels = [], [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for h in extract_markdown_headings(text):
                ids.append(did)
                heads.append(h["text"])
                positions.append(h["position"])
                levels.append(h["level"])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "heading": pa.array(heads, pa.string()),
                "position": pa.array(positions, pa.int64()),
                "level": pa.array(levels, pa.int32()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def phrase_scan(sf_dir: str, phrase: str = "the data") -> Dataset:
    """Documents containing an exact phrase, case-insensitive
    (search.py:319-338 behavior; no cap so the SQL oracle is exact —
    the reference's max_results cap is a ``limit()`` away)."""
    ds = _docs(sf_dir, ["doc_id", "text", "n_chars"])
    needle = phrase.lower()

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.match_substring(pc.utf8_lower(t["text"]), needle)
        return t.filter(mask).select(["doc_id", "n_chars"])

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def bm25_topk(
    sf_dir: str, query: str = "data processing pipeline", k: int = 10,
    k1: float = 1.5, b: float = 0.75,
) -> pa.Table:
    """Distributed BM25 top-k over document text.

    Pass 1 (tiny): per-batch partial (df, doc count, token-length sum) for
    the query terms only -> driver combine -> broadcast idf + avgdl.
    Pass 2: vectorized per-batch tf scan + BM25 score, per-batch top-k, one
    global sort+limit over the (tiny) partial top-ks."""
    terms = [t for t in tokenize_surface(query) if t]
    if not terms:
        return pa.table({"doc_id": pa.array([], pa.int64()), "bm25": pa.array([], pa.float64())})
    term_set = list(dict.fromkeys(terms))
    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial_stats(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        df = np.zeros(len(term_set), dtype=np.int64)
        n_docs = len(texts)
        len_sum = 0
        for x in texts:
            toks = [w.lower() for w in _WORD_RE.findall(x)]
            len_sum += len(toks)
            tokset = set(toks)
            for i, term in enumerate(term_set):
                if term in tokset:
                    df[i] += 1
        return pa.table(
            {
                "term_idx": pa.array(range(len(term_set)), pa.int32()),
                "df": pa.array(df, pa.int64()),
                "n_docs": pa.array([n_docs] * len(term_set), pa.int64()),
                "len_sum": pa.array([len_sum] * len(term_set), pa.int64()),
            }
        )

    stats_rows = ds.map_batches(
        partial_stats, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).take_all()
    df = np.zeros(len(term_set), dtype=np.int64)
    n_docs = 0
    len_sum = 0
    for r in stats_rows:
        df[r["term_idx"]] += r["df"]
        if r["term_idx"] == 0:
            n_docs += r["n_docs"]
            len_sum += r["len_sum"]
    avgdl = max(1.0, len_sum / max(1, n_docs))
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def score(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        scores = np.zeros(len(texts), dtype=np.float64)
        for i, x in enumerate(texts):
            toks = [w.lower() for w in _WORD_RE.findall(x)]
            dl = len(toks)
            if not dl:
                continue
            s = 0.0
            for j, term in enumerate(term_set):
                tf = toks.count(term)
                if tf:
                    s += idf[j] * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
            scores[i] = s
        keep = np.flatnonzero(scores > 0)
        if keep.size > k:
            keep = keep[np.argpartition(-scores[keep], k)[:k]]
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(t["doc_id"].to_pylist())[keep], pa.int64()),
                "bm25": pa.array(np.round(scores[keep], 6), pa.float64()),
            }
        )

    top = (
        ds.map_batches(score, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .sort("bm25", descending=True)
        .limit(k)
    )
    return pa.Table.from_pylist(top.take_all()) if top.count() else pa.table(
        {"doc_id": pa.array([], pa.int64()), "bm25": pa.array([], pa.float64())}
    )
