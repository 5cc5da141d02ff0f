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


HEADINGS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("heading", pa.string()),
        ("position", pa.int64()),
        ("level", pa.int64()),
    ]
)


def doc_headings(sf_dir: str) -> "pa.Table":
    """Flat (doc_id, heading, position, level) rows over documents, collected
    into an Arrow table with an explicit schema (corpora without markdown
    yield 0 rows, and an empty Dataset loses its schema in the oracle
    compare). The streaming form is doc_headings_ds."""
    return pa.Table.from_pylist(doc_headings_ds(sf_dir).take_all(), schema=HEADINGS_SCHEMA)


def doc_headings_ds(sf_dir: str) -> Dataset:
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
                "level": pa.array(levels, pa.int64()),
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
    """Distributed BM25 top-k over document text, SINGLE tokenization pass.

    Pass 1 tokenizes each doc ONCE into a narrow (doc_id, dl, tf-vector)
    table, materialized in the object store (ints only — orders of magnitude
    smaller than the text). The corpus stats (df per term, N, total length)
    are a tiny aggregate over that table, and the scoring pass is pure
    arithmetic over it — the text column is read exactly once end to end
    (the round-1 version re-tokenized the full corpus in a second pass).
    Ties broken by doc_id so the ranking is wholly deterministic (and
    matches the oracle's ORDER BY bm25 DESC, doc_id)."""
    terms = [t for t in tokenize_surface(query) if t]
    if not terms:
        return pa.table({"doc_id": pa.array([], pa.int64()), "bm25": pa.array([], pa.float64())})
    term_set = list(dict.fromkeys(terms))
    nt = len(term_set)
    ds = _docs(sf_dir, ["doc_id", "text"])

    def tf_pass(t: pa.Table) -> pa.Table:
        from collections import Counter

        texts = t["text"].to_pylist()
        n = len(texts)
        dl = np.zeros(n, dtype=np.int64)
        tf = np.zeros((n, nt), dtype=np.int64)
        for i, x in enumerate(texts):
            toks = _WORD_RE.findall(x.lower())
            dl[i] = len(toks)
            # one Counter pass per doc + O(1) lookups per query term — the
            # round-2 toks.count(term) rescanned the token list per term
            # (O(tokens x terms) interpreted Python)
            cnt = Counter(toks)
            for j, term in enumerate(term_set):
                v = cnt.get(term)
                if v:
                    tf[i, j] = v
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "dl": pa.array(dl),
                "tf": pa.array(tf.tolist(), pa.list_(pa.int64())),
            }
        )

    tf_ds = ds.map_batches(
        tf_pass, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()

    def partial_stats(t: pa.Table) -> pa.Table:
        tf = np.asarray(t["tf"].to_pylist(), dtype=np.int64)
        return pa.table(
            {
                "df": pa.array([(tf > 0).sum(axis=0).tolist()], pa.list_(pa.int64())),
                "n_docs": pa.array([t.num_rows], pa.int64()),
                "len_sum": pa.array([int(pc.sum(t["dl"]).as_py() or 0)], pa.int64()),
            }
        )

    df = np.zeros(nt, dtype=np.int64)
    n_docs = 0
    len_sum = 0
    for r in tf_ds.map_batches(
        partial_stats, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).take_all():
        df += np.asarray(r["df"], dtype=np.int64)
        n_docs += r["n_docs"]
        len_sum += r["len_sum"]
    avgdl = max(1.0, len_sum / max(1, n_docs))
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def score(t: pa.Table) -> pa.Table:
        tf = np.asarray(t["tf"].to_pylist(), dtype=np.float64)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        denom = tf + k1 * (1 - b + b * dl[:, None] / avgdl)
        scores = np.where(tf > 0, idf[None, :] * tf * (k1 + 1) / denom, 0.0).sum(axis=1)
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
        tf_ds.map_batches(score, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .sort(["bm25", "doc_id"], descending=[True, False])
        .limit(k)
    )
    rows = top.take_all()
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {"doc_id": pa.array([], pa.int64()), "bm25": pa.array([], pa.float64())}
    )


# ---------------------------------------------------------------------------
# Persisted-index builders: the materialized analog of the reference's index
# sink (reference index.py builds and persists BM25/vector stores; the query
# ops above recompute on the fly — these two emit the index TABLES so a
# repeated-query service can read them instead).


def build_postings(sf_dir: str) -> Dataset:
    """Inverted-index postings rows (term, doc_id, tf) — the BM25 sink's
    storage layout. ZERO exchange: each document lives wholly inside one
    input row, so per-(term, doc) term frequencies are computable entirely
    within the batch (polars explode + group_by); the output streams
    straight to its sink. At 100 TB this stays embarrassingly parallel —
    postings are naturally partitioned by the doc ranges of the input."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        from ..util import polars_safe

        pl = polars_safe()
        df = pl.from_arrow(t.select(["doc_id", "text"]))
        out = (
            df.select(
                "doc_id",
                pl.col("text")
                .str.to_lowercase()
                .str.extract_all("[a-z0-9]+")
                .alias("term"),
            )
            .explode("term")
            .drop_nulls("term")
            .group_by("doc_id", "term")
            .len(name="tf")
        ).to_arrow()
        return pa.table(
            {
                "term": out["term"].cast(pa.string()),
                "doc_id": out["doc_id"].cast(pa.int64()),
                "tf": out["tf"].cast(pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def term_stats(sf_dir: str) -> Dataset:
    """Corpus dictionary (term, df, cf, idf): document frequency, collection
    frequency, and the BM25 idf ln((N - df + 0.5) / (df + 0.5) + 1). One
    vocabulary-bounded exchange: the postings pass above already reduced
    each batch to (term, doc_id, tf) partials, so the groupby ships one row
    per distinct term per block, never O(corpus tokens)."""
    from ray.data.aggregate import Count, Sum

    n_docs = _docs(sf_dir, ["doc_id"]).count()
    agg = (
        build_postings(sf_dir)
        .groupby("term")
        .aggregate(Count(alias_name="df"), Sum("tf", alias_name="cf"))
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        return pa.table(
            {
                "term": t["term"],
                "df": pc.cast(t["df"], pa.int64()),
                "cf": pc.cast(t["cf"], pa.int64()),
                "idf": pa.array(np.round(idf, 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def proximity_search(
    sf_dir: str, term_a: str = "hash", term_b: str = "join", window: int = 5
) -> Dataset:
    """Proximity retrieval: documents where ``term_a`` and ``term_b`` occur
    within ``window`` tokens of each other; emits (doc_id, min_dist) — the
    positional-index query BM25 can't answer. Token positions are the
    [a-z0-9]+ lowercase stream both engines compute identically.

    Scale shape: stateless per-batch kernel — per doc, the two (tiny)
    position lists meet in a classic sorted-merge min-gap scan (vectorized
    searchsorted instead of the positional-index walk); nothing but
    (doc_id, min_dist) survivors leave the scan. A persisted positional
    postings index (build_postings pattern) is the repeated-query path."""
    import re as _re

    ds = _docs(sf_dir, ["doc_id", "text"])
    tok_re = _re.compile(r"[a-z0-9]+")

    def f(t: pa.Table) -> pa.Table:
        out_id, out_d = [], []
        for doc_id, text in zip(
            t["doc_id"].to_numpy(zero_copy_only=False), t["text"].to_pylist()
        ):
            pa_pos, pb_pos = [], []
            for i, m in enumerate(tok_re.finditer(text.lower())):
                w = m.group(0)
                if w == term_a:
                    pa_pos.append(i)
                elif w == term_b:
                    pb_pos.append(i)
            if not pa_pos or not pb_pos:
                continue
            a = np.asarray(pa_pos, np.int64)
            b = np.asarray(pb_pos, np.int64)
            # min |a_i - b_j| via searchsorted of a into b (sorted merge)
            pos = np.searchsorted(b, a)
            lo = np.abs(a - b[np.clip(pos - 1, 0, len(b) - 1)])
            hi = np.abs(a - b[np.clip(pos, 0, len(b) - 1)])
            d = int(min(lo.min(), hi.min()))
            if d <= window:
                out_id.append(int(doc_id))
                out_d.append(d)
        return pa.table(
            {"doc_id": pa.array(out_id, pa.int64()), "min_dist": pa.array(out_d, pa.int64())}
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def hybrid_search_rrf(
    sf_dir: str,
    query: str = "data processing pipeline",
    vec_id: int = 0,
    m: int = 50,
    k: int = 10,
    c: int = 60,
) -> pa.Table:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al. 2009) —
    the reference's vector + BM25 merge step as one operator: take the
    lexical top-m (distributed BM25) and the dense top-m (distributed
    brute-force cosine against the broadcast query vector), convert each to
    ranks, and fuse with rrf = 1/(c + r_lex) + 1/(c + r_dense) (absent
    list -> term 0). Emits the fused top-k (doc_id, rrf).

    Both rank lists are re-ranked here on the ROUNDED score with an id
    tie-break — the same (score DESC, id) order the SQL oracle's
    ROW_NUMBER uses — and the two RRF terms add in a fixed order, so the
    fused doubles are bit-identical across engines. The fusion itself is a
    driver-side merge of two <= m-row tables; the heavy lifting (corpus
    scans, scoring) stays in the two distributed rankings, so the operator
    inherits their scale shape unchanged."""
    from .similarity import cosine_topk

    lex = bm25_topk(sf_dir, query, k=m)
    den = cosine_topk(sf_dir, vec_id=vec_id, k=m)

    def ranks(tbl: pa.Table, id_col: str, score_col: str) -> dict[int, int]:
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sc = tbl[score_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sc))
        return {int(ids[i]): r + 1 for r, i in enumerate(order)}

    lr = ranks(lex, "doc_id", "bm25")
    dr = ranks(den, "vec_id", "cosine")
    fused = []
    for did in sorted(set(lr) | set(dr)):
        rrf = (1.0 / (c + lr[did]) if did in lr else 0.0) + (
            1.0 / (c + dr[did]) if did in dr else 0.0
        )
        fused.append((did, rrf))
    fused.sort(key=lambda x: (-x[1], x[0]))
    fused = fused[:k]
    return pa.table(
        {
            "doc_id": pa.array([f[0] for f in fused], pa.int64()),
            "rrf": pa.array([round(f[1], 6) for f in fused], pa.float64()),
        }
    )
