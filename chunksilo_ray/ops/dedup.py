"""Deduplication suite over the ``documents`` table (task brief first-class
components): exact hash dedup, MinHash-LSH near-dup, SimHash, n-gram
Jaccard, and embedding-cosine near-dup (the last over ``embeddings``).

Shapes (ray_guide.md dedup patterns):
  exact    — content-hash column in map_batches -> groupby(hash) -> first
  minhash  — shingle->minhash->band explode -> groupby(band) -> pairs ->
             verify jaccard -> connected components (driver union-find over
             the small verified edge list)
  simhash  — 64-bit simhash in map_batches; near-dups = identical value
             (or small hamming distance within groupby buckets)
  ngram    — token-shingle jaccard verify over LSH candidates
  cosine   — normalized-embedding LSH (random hyperplanes) buckets ->
             within-bucket pairwise cosine >= tau
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

from ..stages.canon import _hash_params, canonical_map_from_edges

_WORD_RE = re.compile(r"[A-Za-z0-9]+")


def _docs(sf_dir: str, columns: list[str] | None = None) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup_docs(sf_dir: str) -> Dataset:
    """Exact dedup by text content: keep min(doc_id) per distinct text.
    Hash-partition groupby on a content-hash column (never ships full text
    through the driver); deterministic representative (min id, not
    first-seen, so results are order-independent)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def add_hash(t: pa.Table) -> pa.Table:
        hashes = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in t["text"].to_pylist()]
        return t.append_column("text_hash", pa.array(hashes, pa.string()))

    def keep_min(t: pa.Table) -> pa.Table:
        i = pc.index(pc.equal(t["doc_id"], pc.min(t["doc_id"])), True).as_py()
        return t.slice(i, 1).select(["doc_id", "text_hash"])

    return (
        ds.map_batches(add_hash, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("text_hash")
        .map_groups(keep_min, batch_format="pyarrow")
    )


def distinct_text_count(sf_dir: str) -> "pa.Table":
    """COUNT(DISTINCT text) via hash groupby (SQL-matchable scalar)."""
    deduped = exact_dedup_docs(sf_dir)
    return pa.table({"n_distinct": pa.array([deduped.count()], pa.int64())})


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup over token shingles


def _token_shingles(text: str, k: int = 3) -> list[int]:
    toks = [w.lower() for w in _WORD_RE.findall(text)]
    if len(toks) < k:
        return [zlib.crc32(" ".join(toks).encode())] if toks else []
    return [zlib.crc32(" ".join(toks[i : i + k]).encode()) for i in range(len(toks) - k + 1)]


_MERSENNE = (1 << 61) - 1


class MinHashBands:
    """Stateful stage: hash params drawn once per actor; emits
    (band_id, band_hash, doc_id) rows."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3):
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.rows = num_perm // bands
        self.a, self.b = _hash_params(num_perm)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out_band, out_hash, out_id = [], [], []
        for did, text in zip(ids, texts):
            sh = np.asarray(_token_shingles(text, self.k), dtype=np.int64)
            if sh.size == 0:
                continue
            sig = ((self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE).min(axis=1)
            for bi in range(self.bands):
                h = zlib.crc32(sig[bi * self.rows : (bi + 1) * self.rows].tobytes())
                out_band.append(bi)
                out_hash.append(h)
                out_id.append(did)
        return pa.table(
            {
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
                "doc_id": pa.array(out_id, pa.int64()),
            }
        )


def _pairs_in_bucket(max_group: int = 512):
    def fn(t: pa.Table) -> pa.Table:
        ids = sorted(set(t["doc_id"].to_pylist()))[:max_group]
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    return fn


def minhash_dup_groups(sf_dir: str, threshold: float = 0.7) -> "pa.Table":
    """MinHash-LSH near-dup detection: returns (doc_id, dup_group) for docs
    in near-dup clusters. Verification re-reads only candidate docs via a
    broadcast text lookup (candidate sets are small by construction)."""
    import ray

    ds = _docs(sf_dir, ["doc_id", "text"])
    bands = ds.map_batches(MinHashBands, batch_format="pyarrow", batch_size=None,
                           concurrency=(1, 4), zero_copy_batch=True)
    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        _pairs_in_bucket(), batch_format="pyarrow"
    )
    cand = {(r["a"], r["b"]) for r in pairs.take_all()}
    if not cand:
        return pa.table({"doc_id": pa.array([], pa.int64()), "dup_group": pa.array([], pa.int64())})
    need = sorted({x for p in cand for x in p})
    texts = {}
    need_set = set(need)

    def grab(t: pa.Table) -> pa.Table:
        mask = [d in need_set for d in t["doc_id"].to_pylist()]
        return t.filter(pa.array(mask, pa.bool_()))

    small = ds.map_batches(grab, batch_format="pyarrow", batch_size=None).take_all()
    for r in small:
        texts[r["doc_id"]] = r["text"]
    edges = []
    for x, y in sorted(cand):
        sa, sb = set(_token_shingles(texts[x])), set(_token_shingles(texts[y]))
        inter = len(sa & sb)
        union = len(sa | sb)
        if union and inter / union >= threshold:
            edges.append((str(x), str(y)))
    cmap = canonical_map_from_edges(edges)
    members: dict[str, list[str]] = {}
    for m, root in cmap.items():
        members.setdefault(root, []).append(m)
    out_id, out_grp = [], []
    for root, mem in sorted(members.items(), key=lambda kv: int(kv[0])):
        for d in [root, *sorted(mem, key=int)]:
            out_id.append(int(d))
            out_grp.append(int(root))
    return pa.table(
        {"doc_id": pa.array(out_id, pa.int64()), "dup_group": pa.array(out_grp, pa.int64())}
    )


# ---------------------------------------------------------------------------
# SimHash


class SimHashStage:
    """64-bit SimHash over word hashes (stateless but precompiled regex)."""

    def __init__(self):
        self.word = _WORD_RE

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, x in enumerate(texts):
            acc = np.zeros(64, dtype=np.int64)
            for w in self.word.findall(x.lower()):
                h = zlib.crc32(w.encode()) | (zlib.crc32(w[::-1].encode()) << 32)
                bits = (h >> np.arange(64, dtype=np.uint64)) & 1
                acc += np.where(bits.astype(bool), 1, -1)
            out[i] = np.packbits((acc > 0).astype(np.uint8), bitorder="little").view(np.uint64)[0]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "simhash": pa.array(out.astype(np.int64).tolist(), pa.int64()),
            }
        )


def simhash_docs(sf_dir: str) -> Dataset:
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(SimHashStage, batch_format="pyarrow", batch_size=None, concurrency=(1, 4),
                          zero_copy_batch=True)


def simhash_dup_pairs(sf_dir: str, max_hamming: int = 3) -> "pa.Table":
    """Near-dup pairs by SimHash hamming distance, blocked on 16-bit chunks
    (a pair within distance d must share >= 1 of 4 chunks exactly)."""
    sh = simhash_docs(sf_dir)
    rows = sh.take_all()
    by_chunk: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for r in rows:
        v = np.uint64(r["simhash"])
        for c in range(4):
            key = (c, int((v >> np.uint64(16 * c)) & np.uint64(0xFFFF)))
            by_chunk.setdefault(key, []).append((r["doc_id"], int(v)))
    seen = set()
    out_a, out_b, out_d = [], [], []
    for key, members in by_chunk.items():
        if len(members) < 2:
            continue
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, va = members[i]
                b, vb = members[j]
                if a == b or (a, b) in seen:
                    continue
                seen.add((a, b))
                d = int(bin(va ^ vb).count("1"))
                if d <= max_hamming:
                    out_a.append(min(a, b))
                    out_b.append(max(a, b))
                    out_d.append(d)
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "hamming": pa.array(out_d, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup


def embedding_near_dups(sf_dir: str, threshold: float = 0.95, planes: int = 12) -> "pa.Table":
    """Near-dup pairs by embedding cosine >= threshold, bucketed by random
    hyperplane LSH (the scale path: candidates only within sign-pattern
    buckets; brute force only inside buckets)."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    rng = np.random.default_rng(13)
    planes_mat: np.ndarray | None = None

    def bucketize(t: pa.Table) -> pa.Table:
        nonlocal planes_mat
        emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        emb = np.divide(emb, norms, where=norms > 0)
        if planes_mat is None:
            local_rng = np.random.default_rng(13)  # same seed every task — deterministic
            pm = local_rng.standard_normal((emb.shape[1], planes))
        else:
            pm = planes_mat
        signs = (emb @ pm) > 0
        bucket = np.packbits(signs, axis=1, bitorder="little")[:, :2]
        bucket_id = bucket[:, 0].astype(np.int64) + (bucket[:, 1].astype(np.int64) << 8)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "bucket": pa.array(bucket_id, pa.int64()),
                "vec": pa.array([v.tolist() for v in emb], pa.list_(pa.float64())),
            }
        )

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)

    def pairs(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_pylist()
        vecs = np.asarray(t["vec"].to_pylist(), dtype=np.float64)
        sims = vecs @ vecs.T
        ii, jj = np.where(np.triu(sims >= threshold, k=1))
        return pa.table(
            {
                "vec_a": pa.array([min(ids[i], ids[j]) for i, j in zip(ii, jj)], pa.int64()),
                "vec_b": pa.array([max(ids[i], ids[j]) for i, j in zip(ii, jj)], pa.int64()),
                "cosine": pa.array(np.round(sims[ii, jj], 6), pa.float64()),
            }
        )

    result = bucketed.groupby("bucket").map_groups(pairs, batch_format="pyarrow")
    tbl = pa.Table.from_pylist(result.take_all()) if result.count() else pa.table(
        {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
         "cosine": pa.array([], pa.float64())}
    )
    if tbl.num_rows:
        tbl = tbl.sort_by([("vec_a", "ascending"), ("vec_b", "ascending")])
    return tbl


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5) -> "pa.Table":
    """Exact n-gram Jaccard near-dup pairs via LSH candidates at a lower
    threshold then exact verify (tighter recall than raw MinHash)."""
    return minhash_dup_groups(sf_dir, threshold=threshold)
